"""Persistent XLA compilation cache helper.

TPU compiles through the axon relay cost minutes per program; the
persistent cache makes repeat runs of the same program near-instant.
Call enable() before building any jit function (bench.py and the tools
do).  Uses a repo-local directory so cache hits survive across processes
and driver runs."""

from __future__ import annotations

import pathlib

CACHE_DIR = str(pathlib.Path(__file__).resolve().parent.parent.parent / ".jax_cache")


def enable(min_compile_seconds: float = 2.0) -> bool:
    import jax

    try:
        pathlib.Path(CACHE_DIR).mkdir(exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_seconds
        )
        return True
    except Exception:
        return False
