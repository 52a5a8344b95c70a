"""Relay-proof large-batch timing: K DEPENDENT train steps in ONE jit.

The r1 large-batch anomaly (BENCH_NOTES): short pipelined windows at
B>=128 reported physically impossible step times because the axon relay's
queueing semantics with many in-flight steps are not trustworthy.  Here
the optimizer state threads through a lax.scan of the full train step, so
step n+1 cannot begin before step n's update exists — the relay has
nothing to pipeline or reorder — and the whole chain is wall-clocked as
one call.  Per-step time is differenced between two chain lengths to
cancel dispatch/transfer overhead:

    step = (t(n2) - t(n1)) / (n2 - n1)

Usage: timeout 1500 python tools/chained_bench.py --batches 64 128 256
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
    ap.add_argument("--batches", type=int, nargs="+", default=[64, 128])
    ap.add_argument("--t", type=int, default=50)
    ap.add_argument("--n1", type=int, default=6)
    ap.add_argument("--n2", type=int, default=26)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", default="bf16", choices=("bf16", "f32"))
    ap.add_argument(
        "--mode",
        default="dispatch",
        choices=("dispatch", "scan"),
        help="dispatch: N separate step dispatches with the optimizer "
        "state threaded (the real training pattern; device work cannot "
        "overlap across steps), blocked once at the end.  scan: N steps "
        "inside one jit via lax.scan — measures a DIFFERENT program "
        "(nesting de-optimizes the loop-invariant den graph residency; "
        "measured 773 ms/step at B=64 where dispatch mode gives ~1 ms).",
    )
    args = ap.parse_args()

    import jax

    from torchain_tpu.utils.compile_cache import enable as _cc
    _cc()
    import jax.numpy as jnp
    import optax
    from functools import partial

    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.models import TDNNF, TdnnfConfig
    from torchain_tpu.ops import ChainLossOptions, DeviceDenseDenGraph
    from torchain_tpu.ops.device_graphs import DeviceSupervision
    from torchain_tpu.train import create_train_state, make_train_step

    T_OUT, FEAT = args.t, 40
    max_b = max(args.batches)
    corpus = synthetic_dataset(
        num_utts=3 * max_b,
        num_phones=40,
        feat_dim=FEAT,
        utt_frames_out=(T_OUT, T_OUT + 10),
        seed=0,
        lm_order=3,
        lm_extra_states=1000,
    )
    cfg = TdnnfConfig(
        num_pdfs=corpus.tree.num_pdfs,
        hidden_dim=768,
        bottleneck_dim=96,
        prefinal_dim=256,
        num_layers=9,
        dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
    )
    left, right = cfg.context
    dataset = ChainDataset(
        corpus.utts,
        corpus.tree,
        corpus.norm_fst,
        chunk_frames_out=T_OUT,
        left_context=left,
        right_context=right,
        sup_opts=SupervisionOptions(left_tolerance=2, right_tolerance=2),
    )
    den = DeviceDenseDenGraph.from_host(corpus.dense_den)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    step_fn = make_train_step(
        ChainLossOptions(
            l2_regularize=5e-4, leaky_hmm_coefficient=0.1, xent_regularize=0.1
        ),
        donate=False,  # timing harness replays the same state object
    )
    print(f"backend={jax.default_backend()}", flush=True)

    for B in args.batches:
        batch = next(dataset.batches(B, shuffle=False))
        sup = DeviceSupervision.from_host(batch.sup)
        feats = jnp.asarray(batch.feats)
        model = TDNNF(cfg)
        state = create_train_state(model, feats, tx)

        @partial(jax.jit, static_argnums=(3,))
        def chained(state, feats, sup, n):
            def body(st, _):
                st, metrics = step_fn(st, feats, den, sup)
                return st, metrics["loss"]

            st, losses = jax.lax.scan(body, state, None, length=n)
            return st, losses

        if args.mode == "scan":

            def run(n):
                t0 = time.perf_counter()
                st, losses = chained(state, feats, sup, n)
                jax.block_until_ready(losses)
                return time.perf_counter() - t0, float(losses[-1])

        else:

            def run(n):
                t0 = time.perf_counter()
                st = state
                for _ in range(n):
                    st, metrics = step_fn(st, feats, den, sup)
                jax.block_until_ready(metrics["loss"])
                return time.perf_counter() - t0, float(metrics["loss"])

        t_first, _ = run(args.n1)  # compile n1
        t_second, _ = run(args.n2)  # compile n2
        print(json.dumps(dict(B=B, compile_t1_s=round(t_first, 2), compile_t2_s=round(t_second, 2))), flush=True)
        best = float("inf")
        loss = None
        for _ in range(args.reps):
            t1, _ = run(args.n1)
            t2, loss = run(args.n2)
            print(json.dumps(dict(B=B, t1_s=round(t1, 3), t2_s=round(t2, 3))), flush=True)
            best = min(best, (t2 - t1) / (args.n2 - args.n1))
        audio = batch.feats.shape[0] * batch.sup.num_frames * 3 * 0.010
        print(
            json.dumps(
                dict(
                    B=B,
                    step_ms=round(best * 1e3, 3),
                    audio_s_per_s=round(audio / best, 1),
                    final_loss=loss,
                )
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
