"""A/B: adam (f32 moments) vs adam-lowmem (bf16-resident moments) on the
conformer trigram headline — the optimizer-traffic lever (VERDICT r4 #2,
BENCH_NOTES r3 attributed 0.62 ms/step to adam state movement over 13M
f32 params).

Measures the device-trace step time for both and a short objf trajectory
(same data, same init) to bound the numeric effect of bf16 moment
storage.

Usage: timeout 1500 python tools/ab_lowmem_adam.py [--model conformer]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="conformer",
                    choices=("conformer", "tdnnf"))
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--traj-steps", type=int, default=30)
    args = ap.parse_args()

    import bench as _bench

    _bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.models import TDNNF, Conformer, ConformerConfig, TdnnfConfig
    from torchain_tpu.ops import ChainLossOptions, auto_den_graph
    from torchain_tpu.ops.device_graphs import DeviceSupervision
    from torchain_tpu.train import create_train_state, make_train_step
    from torchain_tpu.train.lowmem_adam import adam_lowmem

    B, T_OUT = args.b, 50
    corpus = synthetic_dataset(
        num_utts=2 * B,
        num_phones=40,
        feat_dim=40,
        utt_frames_out=(T_OUT, T_OUT + 10),
        seed=0,
        lm_order=3,
        lm_extra_states=1000,
    )
    if args.model == "conformer":
        cfg = ConformerConfig(
            num_pdfs=corpus.tree.num_pdfs, dim=256, num_layers=8,
            dtype=jnp.bfloat16,
        )
        model = Conformer(cfg)
    else:
        cfg = TdnnfConfig(
            num_pdfs=corpus.tree.num_pdfs, hidden_dim=768, bottleneck_dim=96,
            prefinal_dim=256, num_layers=9, dtype=jnp.bfloat16,
        )
        model = TDNNF(cfg)
    left, right = cfg.context
    dataset = ChainDataset(
        corpus.utts, corpus.tree, corpus.norm_fst, chunk_frames_out=T_OUT,
        left_context=left, right_context=right,
        sup_opts=SupervisionOptions(left_tolerance=2, right_tolerance=2),
    )
    batch = next(dataset.batches(B, shuffle=False))
    den = auto_den_graph(corpus.den_graph, batch_hint=B)
    sup = DeviceSupervision.from_host(batch.sup)
    feats = jnp.asarray(batch.feats)
    loss_opts = ChainLossOptions(
        l2_regularize=5e-4, leaky_hmm_coefficient=0.1, xent_regularize=0.1
    )
    out = {"model": args.model, "b": B, "den_path": type(den).__name__}

    def run(tag, tx):
        step_fn = make_train_step(loss_opts, donate=False)
        state = create_train_state(model, feats, tx)
        n_bytes = sum(
            x.size * x.dtype.itemsize for x in jax.tree.leaves(state.opt_state)
        )
        device_ms, wall_ms, state2 = _bench._measure(
            step_fn, state, feats, den, sup, f"/tmp/tb_ab_opt_{tag}"
        )
        out[f"{tag}_step_ms"] = round(device_ms, 3)
        out[f"{tag}_wall_ms"] = round(wall_ms, 3)
        out[f"{tag}_opt_state_mb"] = round(n_bytes / 1e6, 1)
        # objf trajectory from the SAME init on the same batch
        state = create_train_state(model, feats, tx)
        traj = []
        for _ in range(args.traj_steps):
            state, m = step_fn(state, feats, den, sup)
            traj.append(float(m["objf"]))
        out[f"{tag}_objf_first"] = round(traj[0], 5)
        out[f"{tag}_objf_last"] = round(traj[-1], 5)
        return np.array(traj)

    t_ref = run("adam", optax.chain(
        optax.clip_by_global_norm(5.0), optax.adam(1e-3)))
    t_low = run("lowmem", optax.chain(
        optax.clip_by_global_norm(5.0), adam_lowmem(1e-3)))
    out["traj_max_abs_diff"] = round(float(np.max(np.abs(t_ref - t_low))), 6)
    out["speedup"] = round(out["adam_step_ms"] / out["lowmem_step_ms"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
