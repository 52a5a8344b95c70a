"""Device-truth model/dtype benchmark matrix.

Measures full train steps for {tdnnf, conformer} x {f32, bf16} in ONE
process, each with BOTH a wall-clock window and a jax.profiler device
trace; reports the device span per step (relay-proof ground truth,
BENCH_NOTES round-2 protocol adjudication) next to the wall number so
host/relay overhead is visible.

Usage: timeout 3600 python tools/bench_matrix.py [--models tdnnf conformer]
       [--dtypes f32 bf16] [--b 64] [--den auto|dense] [--steps 6]
"""

import argparse
import json
import pathlib
import shutil
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=["tdnnf", "conformer"])
    ap.add_argument("--dtypes", nargs="+", default=["f32", "bf16"])
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--t-out", type=int, default=50)
    ap.add_argument("--den", default="auto", choices=("auto", "dense"))
    ap.add_argument("--config", default="trigram", choices=("trigram", "production"))
    ap.add_argument("--steps", type=int, default=6, help="traced steps")
    ap.add_argument("--logdir", default="/tmp/tb_matrix")
    ap.add_argument(
        "--detail", action="store_true",
        help="print full by_source/top_ops attribution tables",
    )
    ap.add_argument(
        "--impl", default="dot", choices=("dot", "conv"),
        help="TDNN-F factored-layer lowering",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from torchain_tpu.utils.compile_cache import enable as _cc

    _cc()

    from tools.trace_utils import device_summary, load_latest_trace
    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.models import TDNNF, TdnnfConfig, Conformer, ConformerConfig
    from torchain_tpu.ops import (
        ChainLossOptions,
        DeviceDenseDenGraph,
        auto_den_graph,
    )
    from torchain_tpu.ops.device_graphs import DeviceSupervision
    from torchain_tpu.train import create_train_state, make_train_step

    B, T_OUT, FEAT = args.b, args.t_out, 40
    kw = dict(lm_order=3, lm_extra_states=1000)
    if args.config == "production":
        kw = dict(lm_order=4, lm_extra_states=2000, context_width=2)
    corpus = synthetic_dataset(
        num_utts=2 * B,
        num_phones=40,
        feat_dim=FEAT,
        utt_frames_out=(T_OUT, T_OUT + 10),
        seed=0,
        **kw,
    )

    def make_model(name, dtype):
        if name == "tdnnf":
            cfg = TdnnfConfig(
                num_pdfs=corpus.tree.num_pdfs,
                hidden_dim=768,
                bottleneck_dim=96,
                prefinal_dim=256,
                num_layers=9,
                dtype=dtype,
                impl=args.impl,
            )
            return TDNNF(cfg), cfg.context
        cfg = ConformerConfig(
            num_pdfs=corpus.tree.num_pdfs, dim=256, num_layers=8, num_heads=4,
            dtype=dtype,
        )
        return Conformer(cfg), cfg.context

    print(
        json.dumps(
            dict(backend=jax.default_backend(), devices=len(jax.devices()))
        ),
        flush=True,
    )
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    step_fn = make_train_step(
        ChainLossOptions(
            l2_regularize=5e-4, leaky_hmm_coefficient=0.1, xent_regularize=0.1
        )
    )

    for name in args.models:
        for dt in args.dtypes:
            dtype = jnp.bfloat16 if dt == "bf16" else jnp.float32
            model, (left, right) = make_model(name, dtype)
            dataset = ChainDataset(
                corpus.utts,
                corpus.tree,
                corpus.norm_fst,
                chunk_frames_out=T_OUT,
                left_context=left,
                right_context=right,
                sup_opts=SupervisionOptions(left_tolerance=2, right_tolerance=2),
            )
            batch = next(dataset.batches(B, shuffle=False))
            if args.den == "dense" and args.config == "trigram":
                den = DeviceDenseDenGraph.from_host(corpus.dense_den)
            else:
                den = auto_den_graph(corpus.den_graph, batch_hint=B)
            sup = DeviceSupervision.from_host(batch.sup)
            feats = jnp.asarray(batch.feats)
            state = create_train_state(model, feats, tx)
            t0 = time.perf_counter()
            for _ in range(2):
                state, metrics = step_fn(state, feats, den, sup)
            jax.block_until_ready(metrics["loss"])
            compile_s = time.perf_counter() - t0

            # wall window
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(args.steps):
                    state, metrics = step_fn(state, feats, den, sup)
                jax.block_until_ready(metrics["loss"])
                best = min(best, (time.perf_counter() - t0) / args.steps)

            # device trace
            logdir = f"{args.logdir}_{name}_{dt}"
            shutil.rmtree(logdir, ignore_errors=True)
            jax.profiler.start_trace(logdir)
            for _ in range(args.steps):
                state, metrics = step_fn(state, feats, den, sup)
            jax.block_until_ready(metrics["loss"])
            jax.profiler.stop_trace()
            try:
                s = device_summary(load_latest_trace(logdir))
                # busy = sum of module durations (gap-proof; see bench.py)
                dev_ms = (s["busy_ms"] or s["span_ms"]) / args.steps
            except Exception as e:  # noqa: BLE001
                s, dev_ms = dict(by_source=[]), float("nan")
            audio = B * batch.sup.num_frames * 3 * 0.010
            print(
                json.dumps(
                    dict(
                        model=name,
                        dtype=dt,
                        den=type(den).__name__,
                        wall_step_ms=round(best * 1e3, 3),
                        device_step_ms=round(dev_ms, 3),
                        audio_s_per_s_device=round(audio / (dev_ms / 1e3), 1)
                        if dev_ms == dev_ms
                        else None,
                        compile_s=round(compile_s, 1),
                        loss=float(metrics["loss"]),
                        top=[
                            (src.rsplit("/", 1)[-1], ms)
                            for src, ms in s["by_source"][:6]
                        ],
                    )
                ),
                flush=True,
            )
            if args.detail and s["by_source"]:
                print(
                    json.dumps(
                        dict(
                            by_source=[
                                (src.rsplit("/", 1)[-1], round(ms / args.steps, 3))
                                for src, ms in s["by_source"][:24]
                            ],
                            top_ops=[
                                (n, round(ms / args.steps, 3))
                                for n, ms in s["top_ops"][:24]
                            ],
                        )
                    ),
                    flush=True,
                )


if __name__ == "__main__":
    main()
