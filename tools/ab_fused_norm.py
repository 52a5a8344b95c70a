"""Device A/B: hand-fused BatchNorm/LayerNorm VJPs vs the stock flax
modules, at the bench.py trigram headline configuration.

Round-3 ended with ops/fused_bn.py + ops/fused_ln.py written and
parity-tested but default-off ("until device-measured").  This tool is
that measurement: full jitted train step, device-trace protocol
(bench._measure), one process, flax vs fused per model.

Usage: timeout 1800 python tools/ab_fused_norm.py [--models tdnnf conformer]
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=["tdnnf", "conformer"])
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--t", type=int, default=50)
    args = ap.parse_args()

    import jax

    from torchain_tpu.utils.compile_cache import enable as _cc

    _cc()
    import jax.numpy as jnp
    import optax

    import bench
    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.models import (
        TDNNF,
        Conformer,
        ConformerConfig,
        TdnnfConfig,
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

    def build(model_name, impl):
        if model_name == "tdnnf":
            cfg = TdnnfConfig(
                num_pdfs=corpus.tree.num_pdfs,
                hidden_dim=768,
                bottleneck_dim=96,
                prefinal_dim=256,
                num_layers=9,
                dtype=jnp.bfloat16,
                bn_impl=impl,
            )
            return TDNNF(cfg), cfg.context
        cfg = ConformerConfig(
            num_pdfs=corpus.tree.num_pdfs,
            dim=256,
            num_layers=8,
            num_heads=4,
            dtype=jnp.bfloat16,
            bn_impl=impl,
            ln_impl=impl,
        )
        return Conformer(cfg), cfg.context

    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    step_fn = make_train_step(
        ChainLossOptions(
            l2_regularize=5e-4, leaky_hmm_coefficient=0.1, xent_regularize=0.1
        )
    )
    den = auto_den_graph(corpus.den_graph, batch_hint=B)
    print(f"backend={jax.default_backend()} den={type(den).__name__}", flush=True)

    for model_name in args.models:
        for impl in ("flax", "fused"):
            model, (left, right) = build(model_name, impl)
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
            device_ms, wall_ms, state = bench._measure(
                step_fn,
                state,
                feats,
                den,
                sup,
                f"/tmp/tb_ab_norm_{model_name}_{impl}",
            )
            step_ms = device_ms if device_ms == device_ms else wall_ms
            audio = batch.feats.shape[0] * batch.sup.num_frames * 3 * 0.010
            _, metrics = step_fn(state, feats, den, sup)
            print(
                json.dumps(
                    dict(
                        model=model_name,
                        impl=impl,
                        step_ms=round(step_ms, 3),
                        wall_step_ms=round(wall_ms, 3),
                        audio_s_per_s=round(audio / (step_ms / 1e3), 1),
                        loss=float(metrics["loss"]),
                    )
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
