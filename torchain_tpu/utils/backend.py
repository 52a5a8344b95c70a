"""Backend health probing.

The axon PJRT client creation blocks UNINTERRUPTIBLY in C (SIGTERM is
ignored) when the TPU relay daemon is down — observed live: a plain
jax.devices() hung past every in-process timeout.  The only reliable
guard is a THROWAWAY subprocess, which SIGKILL (sent by
subprocess.run(timeout=...)) always terminates.  Entry points that must
never hang (bench.py, __graft_entry__.dryrun_multichip) probe here and
fall back to the CPU platform.
"""

from __future__ import annotations

import os
import subprocess
import sys


def backend_reachable(timeout_s: int = 150) -> bool:
    """True if a tiny compile + execute + device->host transfer completes
    in a fresh subprocess within the timeout (or the environment
    explicitly pins the CPU platform).  The probe must run real work:
    a half-dead relay has been observed to finish client creation and
    accept dispatches while hanging every transfer — `jax.devices()`
    alone passes in that state and the caller then hangs anyway."""
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return True  # explicit CPU run: nothing to probe
    try:
        r = subprocess.run(
            [
                sys.executable,
                "-c",
                "import jax, jax.numpy as jnp; "
                "x = jnp.ones((8, 128)); "
                "assert float((x @ x.T).sum()) == 8 * 128 * 8",
            ],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False
