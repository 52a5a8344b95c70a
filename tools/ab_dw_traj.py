"""Trajectory A/B for the depthwise-conv dtype at the conformer trigram
headline: bf16 shift taps vs the r1-era f32 island, 40 real train steps
from identical inits.  Decides the depthwise_f32 default flip (the
122 ms catastrophe that motivated f32 was the grouped-conv LOWERING,
not the arithmetic; the shift impl has no such lowering).

Usage: timeout 3000 python tools/ab_dw_traj.py
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    import jax

    from torchain_tpu.utils.compile_cache import enable as _cc

    _cc()
    import jax.numpy as jnp
    import optax

    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.models import Conformer, ConformerConfig
    from torchain_tpu.ops import ChainLossOptions, auto_den_graph
    from torchain_tpu.ops.device_graphs import DeviceSupervision
    from torchain_tpu.train import create_train_state, make_train_step

    B, T_OUT, FEAT = 64, 50, 40
    corpus = synthetic_dataset(
        num_utts=4 * B, num_phones=40, feat_dim=FEAT,
        utt_frames_out=(T_OUT, T_OUT + 10), seed=0,
        lm_order=3, lm_extra_states=1000,
    )
    den = auto_den_graph(corpus.den_graph, batch_hint=B)
    step_fn = make_train_step(
        ChainLossOptions(
            l2_regularize=5e-4, leaky_hmm_coefficient=0.1, xent_regularize=0.1
        )
    )
    for dw_f32 in (True, False):
        cfg = ConformerConfig(
            num_pdfs=corpus.tree.num_pdfs, dim=256, num_layers=8,
            num_heads=4, dtype=jnp.bfloat16, depthwise_f32=dw_f32,
        )
        model = Conformer(cfg)
        left, right = cfg.context
        dataset = ChainDataset(
            corpus.utts, corpus.tree, corpus.norm_fst,
            chunk_frames_out=T_OUT, left_context=left, right_context=right,
            sup_opts=SupervisionOptions(left_tolerance=2, right_tolerance=2),
        )
        batches = []
        for i, b in enumerate(dataset.batches(B, shuffle=True, epoch=1)):
            batches.append(
                (jnp.asarray(b.feats), DeviceSupervision.from_host(b.sup))
            )
            if i >= 9:
                break
        tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
        state = create_train_state(model, batches[0][0], tx)
        objs = []
        for step in range(40):
            feats, sup = batches[step % len(batches)]
            state, metrics = step_fn(state, feats, den, sup)
            objs.append(float(metrics["objf"]))
        print(json.dumps(dict(
            depthwise_f32=dw_f32,
            objf_first=round(objs[0], 5),
            objf_10=round(objs[9], 5),
            objf_20=round(objs[19], 5),
            objf_40=round(objs[39], 5),
            objf_mean_last10=round(sum(objs[-10:]) / 10, 5),
        )), flush=True)


if __name__ == "__main__":
    main()
