"""Tracing & profiling subsystem.

The reference had none (SURVEY.md section 5: Kaldi CuTimer prints only);
this provides the TPU-native story: jax.profiler traces viewable in
TensorBoard/Perfetto, named trace annotations around pipeline stages, and
a steady-state step timer reporting the headline metric
(audio-seconds/s/chip).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a device trace for the enclosed block:

        with profile_trace("/tmp/trace"):
            for _ in range(3):
                state, m = step(state, ...)
            jax.block_until_ready(m["loss"])

    View with TensorBoard's profile plugin or Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def trace_annotation(name: str):
    """Named span that shows up in profiler traces (host + device)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Steady-state throughput tracker.

    Skips the first `warmup` steps (compile time), then tracks wall time
    and audio seconds; `summary()` reports audio-s/s (per chip if
    `per_chip`)."""

    def __init__(self, warmup: int = 2, per_chip: bool = True):
        self.warmup = warmup
        self.per_chip = per_chip
        self.steps = 0
        self.audio_s = 0.0
        self._t0 = None

    def step(self, batch_audio_seconds: float) -> None:
        self.steps += 1
        if self.steps == self.warmup:
            self._t0 = time.perf_counter()
        elif self.steps > self.warmup:
            self.audio_s += batch_audio_seconds

    @property
    def elapsed(self) -> float:
        return 0.0 if self._t0 is None else time.perf_counter() - self._t0

    def summary(self) -> dict:
        denom = max(self.elapsed, 1e-9)
        chips = len(jax.devices()) if self.per_chip else 1
        return dict(
            steps=self.steps,
            audio_seconds=self.audio_s,
            wall_s=self.elapsed,
            audio_s_per_s_per_chip=self.audio_s / denom / chips,
        )
