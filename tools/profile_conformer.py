"""Profile the conformer train step and print the top device ops.

Usage: timeout 1500 python tools/profile_conformer.py [--dtype bf16|f32]

Captures a jax.profiler trace of a few steps and aggregates device-side
event durations from the xplane protobuf (tensorflow is in the image), so
pathological ops (the 122 ms bf16 conformer step, BENCH_NOTES round 2)
can be named instead of guessed."""

import argparse
import glob
import gzip
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=("bf16", "f32"))
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--model", default="conformer", choices=("conformer", "tdnnf"))
    ap.add_argument("--logdir", default="/tmp/tb_conformer")
    args = ap.parse_args()

    import jax

    from torchain_tpu.utils.compile_cache import enable as _cc
    _cc()
    import jax.numpy as jnp
    import optax

    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.models import TDNNF, Conformer, ConformerConfig, TdnnfConfig
    from torchain_tpu.ops import ChainLossOptions, auto_den_graph
    from torchain_tpu.ops.device_graphs import DeviceSupervision
    from torchain_tpu.train import create_train_state, make_train_step

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    B, T_OUT, FEAT = args.b, 50, 40
    corpus = synthetic_dataset(
        num_utts=2 * B,
        num_phones=40,
        feat_dim=FEAT,
        utt_frames_out=(T_OUT, T_OUT + 10),
        seed=0,
        lm_order=3,
        lm_extra_states=1000,
    )
    if args.model == "tdnnf":
        cfg = TdnnfConfig(
            num_pdfs=corpus.tree.num_pdfs, hidden_dim=768, bottleneck_dim=96,
            prefinal_dim=256, num_layers=9, dtype=dtype,
        )
    else:
        cfg = ConformerConfig(
            num_pdfs=corpus.tree.num_pdfs, dim=256, num_layers=8,
            num_heads=4, dtype=dtype,
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
    batch = next(dataset.batches(B, shuffle=False))
    den = auto_den_graph(corpus.den_graph, batch_hint=B)
    sup = DeviceSupervision.from_host(batch.sup)
    feats = jnp.asarray(batch.feats)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    step_fn = make_train_step(
        ChainLossOptions(l2_regularize=5e-4, leaky_hmm_coefficient=0.1, xent_regularize=0.1)
    )
    model = TDNNF(cfg) if args.model == 'tdnnf' else Conformer(cfg)
    state = create_train_state(model, feats, tx)
    for _ in range(2):
        state, metrics = step_fn(state, feats, den, sup)
    jax.block_until_ready(metrics["loss"])

    jax.profiler.start_trace(args.logdir)
    for _ in range(args.steps):
        state, metrics = step_fn(state, feats, den, sup)
    jax.block_until_ready(metrics["loss"])
    jax.profiler.stop_trace()
    print("trace captured", flush=True)

    # aggregate device events from the Chrome trace (xplane protos aren't
    # importable in this image; the json.gz carries the same timeline)
    from tools.trace_utils import print_summary

    print_summary(args.logdir, args.steps)


if __name__ == "__main__":
    main()
