"""Model-matrix benchmark: full train step per model/dtype, one process.

Usage: timeout 1500 python tools/bench_models.py [--models conformer tdnnf]

Measures the full jitted train step (model fwd+bwd + chain loss + adam)
at the bench.py configuration for each (model, dtype) pair in one
process, by the DEVICE-TRACE protocol (bench.py _measure): wall
min-of-windows through the axon relay reported physically impossible
numbers at B=128 (f32 "2.5 ms" below the device span of one step —
BENCH_NOTES round 3), so wall is printed only as a cross-check."""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=["conformer"])
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--t", type=int, default=50)
    args = ap.parse_args()

    import jax

    from torchain_tpu.utils.compile_cache import enable as _cc
    _cc()
    import jax.numpy as jnp
    import optax

    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.models import (
        TDNNF,
        TDNNLSTM,
        Conformer,
        ConformerConfig,
        TdnnfConfig,
        TdnnLstmConfig,
    )
    from torchain_tpu.ops import ChainLossOptions, auto_den_graph
    from torchain_tpu.ops.device_graphs import DeviceSupervision
    from torchain_tpu.train import create_train_state, make_train_step

    B, T_OUT, FEAT = args.b, args.t, 40
    corpus = synthetic_dataset(
        num_utts=2 * B,
        num_phones=40,
        feat_dim=FEAT,
        utt_frames_out=(T_OUT, T_OUT + 10),
        seed=0,
        lm_order=3,
        lm_extra_states=1000,
    )

    def build(model_name, dtype):
        if model_name == "tdnnf":
            cfg = TdnnfConfig(
                num_pdfs=corpus.tree.num_pdfs,
                hidden_dim=768,
                bottleneck_dim=96,
                prefinal_dim=256,
                num_layers=9,
                dtype=dtype,
            )
            return TDNNF(cfg), cfg.context
        if model_name == "tdnn-lstm":
            cfg = TdnnLstmConfig(
                num_pdfs=corpus.tree.num_pdfs,
                hidden_dim=512,
                cell_dim=512,
                rec_proj_dim=128,
                nonrec_proj_dim=128,
                dtype=dtype,
            )
            return TDNNLSTM(cfg), cfg.context
        cfg = ConformerConfig(
            num_pdfs=corpus.tree.num_pdfs,
            dim=256,
            num_layers=8,
            num_heads=4,
            dtype=dtype,
        )
        return Conformer(cfg), cfg.context

    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    step_fn = make_train_step(
        ChainLossOptions(
            l2_regularize=5e-4, leaky_hmm_coefficient=0.1, xent_regularize=0.1
        )
    )
    den = auto_den_graph(corpus.den_graph, batch_hint=B)
    print(f"backend={jax.default_backend()}", flush=True)

    for model_name in args.models:
        for dtype in (jnp.float32, jnp.bfloat16):
            model, (left, right) = build(model_name, dtype)
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
            sup = DeviceSupervision.from_host(batch.sup)
            feats = jnp.asarray(batch.feats)
            state = create_train_state(model, feats, tx)
            t0 = time.time()
            for _ in range(3):
                state, metrics = step_fn(state, feats, den, sup)
            jax.block_until_ready(metrics["loss"])
            compile_s = time.time() - t0
            import bench

            device_ms, wall_ms, state = bench._measure(
                step_fn, state, feats, den, sup,
                f"/tmp/tb_bench_models_{model_name}_{jnp.dtype(dtype).name}",
            )
            step_ms = device_ms if device_ms == device_ms else wall_ms
            audio = batch.feats.shape[0] * batch.sup.num_frames * 3 * 0.010
            print(
                json.dumps(
                    dict(
                        model=model_name,
                        dtype=str(jnp.dtype(dtype)),
                        step_ms=round(step_ms, 3),
                        wall_step_ms=round(wall_ms, 3),
                        audio_s_per_s=round(audio / (step_ms / 1e3), 1),
                        loss=float(metrics["loss"]),
                        compile_s=round(compile_s, 1),
                    )
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
