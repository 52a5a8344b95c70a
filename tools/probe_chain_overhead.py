"""Probe: per-dispatch cost of state-threaded chains on the axon relay.

Chains a TRIVIAL jitted update (x += 1) over a pytree of a given size for
two chain lengths and reports the per-step slope.  If the slope tracks
the pytree size at ~transfer speeds, the relay is round-tripping state
between dispatches and chained wall-clocks measure the TUNNEL, not the
device — which decides how to read tools/chained_bench.py numbers
(BENCH_NOTES round 2 large-batch anomaly).

Usage: timeout 900 python tools/probe_chain_overhead.py [--mb 12 48]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, nargs="+", default=[12.0, 48.0])
    ap.add_argument("--n1", type=int, default=6)
    ap.add_argument("--n2", type=int, default=26)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from torchain_tpu.utils.compile_cache import enable as _cc

    _cc()
    print(f"backend={jax.default_backend()}", flush=True)

    for mb in args.mb:
        n_el = int(mb * 1024 * 1024 / 4 / 4)
        state = {
            f"w{i}": jnp.zeros((n_el,), jnp.float32) for i in range(4)
        }

        @jax.jit
        def step(s):
            return {k: v + 1.0 for k, v in s.items()}

        def run(n):
            t0 = time.perf_counter()
            s = state
            for _ in range(n):
                s = step(s)
            jax.block_until_ready(s["w0"])
            return time.perf_counter() - t0

        run(args.n1)
        best = float("inf")
        for _ in range(3):
            t1 = run(args.n1)
            t2 = run(args.n2)
            best = min(best, (t2 - t1) / (args.n2 - args.n1))
        print(
            json.dumps(
                dict(
                    mb=mb,
                    per_step_ms=round(best * 1e3, 3),
                    implied_bw_MBps=round(mb / best / 1e0, 1) if best > 0 else None,
                )
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
