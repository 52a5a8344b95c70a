"""Conformer TRUNK-only device-trace shootout: f32 vs bf16, attention
layout variants.

The round-2 model matrix has conformer bf16 at only 1.12x its f32 at
trigram scale (BENCH_NOTES), against the 1.5x gate.  The trace names
~2.8 ms of layout copies around the attention qkv path as the residue.
This tool times trunk fwd+bwd alone (no chain loss) per dtype, so
attention-layout experiments get attributed cleanly.

Usage: timeout 1800 python tools/conformer_trunk_bench.py [--T 150] [--B 128]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=128)
    ap.add_argument("--T", type=int, default=154)  # T_in for T_out=50 @ sub 3
    ap.add_argument("--feat", type=int, default=40)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--logdir", default="/tmp/tb_conf_trunk")
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--heads", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from torchain_tpu.utils.compile_cache import enable as _cc

    _cc()
    from torchain_tpu.models import Conformer, ConformerConfig

    from tools.trace_utils import print_summary

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(args.B, args.T, args.feat)), jnp.float32)

    results = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        cfg = ConformerConfig(
            num_pdfs=1888,
            dim=args.dim,
            num_heads=args.heads,
            num_layers=8,
            dtype=dtype,
        )
        model = Conformer(cfg)
        variables = model.init(jax.random.PRNGKey(0), feats, train=False)
        params, batch_stats = variables["params"], variables.get("batch_stats", {})

        def loss_fn(p, f):
            (chain, xent), _ = model.apply(
                {"params": p, "batch_stats": batch_stats},
                f,
                train=True,
                mutable=["batch_stats"],
            )
            return (
                jnp.sum(chain.astype(jnp.float32) ** 2)
                + jnp.sum(xent.astype(jnp.float32) ** 2)
            ) / (args.B * args.T)

        step = jax.jit(jax.grad(loss_fn))
        g = step(params, feats)
        jax.block_until_ready(g)

        logdir = f"{args.logdir}_{name}"
        with jax.profiler.trace(logdir):
            for _ in range(args.steps):
                g = step(params, feats)
            jax.block_until_ready(g)
        print(f"==== {name} ====")
        s = print_summary(logdir, args.steps, top=14)
        results[name] = s["busy_ms"] / args.steps

    print(
        f"\ntrunk fwd+bwd per step: f32 {results['f32']:.2f} ms, "
        f"bf16 {results['bf16']:.2f} ms, ratio {results['f32']/results['bf16']:.2f}x"
    )


if __name__ == "__main__":
    main()
