"""Empirical device rooflines: peak matmul TFLOP/s and HBM GB/s.

The step-time headlines only mean something relative to what THIS chip
can actually do (the part behind the axon relay may not match any spec
sheet we assume).  Chained dependent ops, measured with both the window
protocol (bench.py style) and length differencing (diffchain) so the two
must agree before a number is trusted.

  matmul: C = A @ B; A' = C * eps + A  (dependent chain, no DCE)
  bw:     y = x * 1.0000001 + 1        (reads+writes 2*bytes per step)

Usage: timeout 2400 python tools/probe_peak.py > /tmp/peak.log 2>&1
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def measure(fn, x0, iters=20, windows=4):
    """Window protocol: min over windows of (iters chained dispatches)."""
    import jax

    x = fn(x0)
    jax.block_until_ready(x)
    best = float("inf")
    for _ in range(windows):
        x = x0
        t0 = time.perf_counter()
        for _ in range(iters):
            x = fn(x)
        jax.block_until_ready(x)
        best = min(best, (time.perf_counter() - t0) / iters)
    # diffchain cross-check: (t(3*iters) - t(iters)) / (2*iters)
    def run(n):
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = fn(x)
        jax.block_until_ready(x)
        return time.perf_counter() - t0

    t1 = run(iters)
    t2 = run(3 * iters)
    diff = (t2 - t1) / (2 * iters)
    return best, diff


def main():
    import jax
    import jax.numpy as jnp

    from torchain_tpu.utils.compile_cache import enable as _cc

    _cc()

    d = jax.devices()[0]
    print(
        json.dumps(
            dict(
                backend=jax.default_backend(),
                device_kind=getattr(d, "device_kind", "?"),
                platform=d.platform,
                num_devices=len(jax.devices()),
            )
        ),
        flush=True,
    )

    for n, dtype, prec in (
        (4096, jnp.bfloat16, None),
        (8192, jnp.bfloat16, None),
        (4096, jnp.float32, "default"),
        (4096, jnp.float32, "highest"),
    ):
        key = jax.random.PRNGKey(0)
        a = jax.random.normal(key, (n, n), dtype=dtype)
        b = jax.random.normal(jax.random.PRNGKey(1), (n, n), dtype=dtype)

        @jax.jit
        def step(a, b=b, prec=prec):
            c = jnp.dot(a, b, precision=prec)
            return c * jnp.asarray(1e-6, dtype=c.dtype) + a.astype(c.dtype)

        win, diff = measure(lambda x: step(x), a, iters=10, windows=4)
        flops = 2 * n * n * n
        print(
            json.dumps(
                dict(
                    op=f"matmul{n}",
                    dtype=str(jnp.dtype(dtype)),
                    precision=str(prec),
                    window_ms=round(win * 1e3, 3),
                    diff_ms=round(diff * 1e3, 3),
                    window_tflops=round(flops / win / 1e12, 1),
                    diff_tflops=round(flops / diff / 1e12, 1),
                )
            ),
            flush=True,
        )

    for mb in (64, 256):
        x = jnp.ones((mb * 1024 * 1024 // 4,), jnp.float32)

        @jax.jit
        def bw_step(x):
            return x * 1.0000001 + 1.0

        win, diff = measure(bw_step, x, iters=20, windows=4)
        moved = 2 * mb / 1024  # GB read+written per step
        print(
            json.dumps(
                dict(
                    op=f"bw{mb}MB",
                    window_ms=round(win * 1e3, 3),
                    diff_ms=round(diff * 1e3, 3),
                    window_GBps=round(moved / win, 0),
                    diff_GBps=round(moved / diff, 0),
                )
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
