"""Round-5 conformer step decomposition A/B at the bench headline config.

VERDICT r4 #2 asks for >=25k audio-s/s/chip at trigram B=128 (from 21.1k
= 9.09 ms/step).  This tool measures the FULL train step under targeted
variants so the remaining fat can be attributed by differencing:

  base        current defaults (bf16 trunk, fused ln/bn/attn, shift dw)
  dw_bf16     depthwise conv in bf16 (shift impl; the 122 ms catastrophe
              was the grouped-conv LOWERING, never re-measured for shift)
  attn_einsum XLA einsum attention (has the fused kernel kept its lead?)
  no_xent     xent head removed from loss (xent_regularize=0) -- bounds
              the xent-objective + xent-head-backward cost
  sq_loss     chain_loss replaced by sum(y^2): model+optimizer floor,
              bounds the entire loss region (den+num+glue)

Usage: timeout 3000 python tools/ab_conformer5.py [--variants base ...]
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--variants",
        nargs="+",
        default=["base", "dw_bf16", "attn_einsum", "no_xent", "sq_loss"],
    )
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
    from torchain_tpu.models import Conformer, ConformerConfig
    from torchain_tpu.ops import ChainLossOptions, auto_den_graph, chain_loss
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
    den = auto_den_graph(corpus.den_graph, batch_hint=B)
    print(f"backend={jax.default_backend()} den={type(den).__name__}", flush=True)

    def build_cfg(**kw):
        return ConformerConfig(
            num_pdfs=corpus.tree.num_pdfs,
            dim=256,
            num_layers=8,
            num_heads=4,
            dtype=jnp.bfloat16,
            **kw,
        )

    def make_sq_loss_step(tx):
        from functools import partial

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, feats, den, sup):
            def loss_fn(params):
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                    (chain_out, xent_out), updates = state.apply_fn(
                        variables, feats, train=True, mutable=["batch_stats"]
                    )
                    new_stats = updates["batch_stats"]
                else:
                    chain_out, xent_out = state.apply_fn(
                        variables, feats, train=True
                    )
                    new_stats = state.batch_stats
                loss = (
                    jnp.sum(chain_out.astype(jnp.float32) ** 2)
                    + jnp.sum(xent_out.astype(jnp.float32) ** 2)
                ) * 1e-6
                return loss, new_stats

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            new_state = state.apply_gradients(grads, new_stats)
            return new_state, {"loss": loss}

        return step

    for variant in args.variants:
        cfg_kw = {}
        loss_opts = ChainLossOptions(
            l2_regularize=5e-4, leaky_hmm_coefficient=0.1, xent_regularize=0.1
        )
        use_xent = True
        if variant == "dw_bf16":
            cfg_kw = dict(depthwise_f32=False)
        elif variant == "attn_einsum":
            cfg_kw = dict(attn_impl="einsum")
        elif variant == "ffn_dense":
            cfg_kw = dict(ffn_impl="dense")
        elif variant == "ffn_dense_dw32":
            cfg_kw = dict(ffn_impl="dense", depthwise_f32=True)
        elif variant == "all_on":
            cfg_kw = dict(depthwise_f32=False)
        elif variant == "no_xent":
            loss_opts = ChainLossOptions(
                l2_regularize=5e-4, leaky_hmm_coefficient=0.1, xent_regularize=0.0
            )
            use_xent = False
        cfg = build_cfg(**cfg_kw)
        model = Conformer(cfg)
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
        sup = DeviceSupervision.from_host(batch.sup)
        feats = jnp.asarray(batch.feats)
        tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
        if variant == "sq_loss":
            step_fn = make_sq_loss_step(tx)
        else:
            step_fn = make_train_step(loss_opts, use_xent=use_xent)
        state = create_train_state(model, feats, tx)
        device_ms, wall_ms, state = bench._measure(
            step_fn, state, feats, den, sup, f"/tmp/tb_ab_c5_{variant}"
        )
        step_ms = device_ms if device_ms == device_ms else wall_ms
        audio = batch.feats.shape[0] * batch.sup.num_frames * 3 * 0.010
        print(
            json.dumps(
                dict(
                    variant=variant,
                    step_ms=round(step_ms, 3),
                    wall_step_ms=round(wall_ms, 3),
                    audio_s_per_s=round(audio / (step_ms / 1e3), 1),
                )
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
