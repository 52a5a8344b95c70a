"""Device A/B: resident-numerator Pallas kernels (ops/num_resident) vs
the lax.scan path, at the bench.py trigram headline configuration.

The steady-frame numerator scans cost ~540 us/step at trigram B=128
(BENCH_NOTES round 4 "TDNN-F remaining fat") — almost all XLA while-loop
dispatch around ~1 us of VPU math per frame.  ops/num_resident runs the
whole steady T-loop inside one Pallas kernel.  This tool measures the
full jitted train step both ways (device-trace protocol, bench._measure),
checks numeric parity on device, and is the gate for flipping
TORCHAIN_NUM_RESIDENT's default to "1" (see num_scan._use_resident).

Usage: timeout 1800 python tools/ab_num_resident.py [--b 128 --t 50]
"""

import argparse
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--t", type=int, default=50)
    ap.add_argument("--production", action="store_true",
                    help="also run the 4-gram left-biphone production graph")
    args = ap.parse_args()

    import jax

    from torchain_tpu.utils.compile_cache import enable as _cc

    _cc()
    import jax.numpy as jnp
    import numpy as np
    import optax

    import bench
    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.models import TDNNF, TdnnfConfig
    from torchain_tpu.ops import ChainLossOptions, auto_den_graph
    from torchain_tpu.ops.device_graphs import DeviceSupervision
    from torchain_tpu.train import create_train_state, make_train_step

    B, T_OUT, FEAT = args.b, args.t, 40
    corpus_kw = dict(
        num_utts=2 * B,
        num_phones=40,
        feat_dim=FEAT,
        utt_frames_out=(T_OUT, T_OUT + 10),
        seed=0,
        lm_order=3,
        lm_extra_states=1000,
    )
    if args.production:  # bench.production_config graph scale
        corpus_kw.update(context_width=2, lm_order=4, lm_extra_states=2000)
    corpus = synthetic_dataset(**corpus_kw)
    cfg = TdnnfConfig(
        num_pdfs=corpus.tree.num_pdfs,
        hidden_dim=768,
        bottleneck_dim=96,
        prefinal_dim=256,
        num_layers=9,
        dtype=jnp.bfloat16,
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
    sup = DeviceSupervision.from_host(batch.sup)
    feats = jnp.asarray(batch.feats)
    den = auto_den_graph(corpus.den_graph, batch_hint=B)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    print(f"backend={jax.default_backend()} den={type(den).__name__}", flush=True)

    results = {}
    for mode in ("0", "1"):
        os.environ["TORCHAIN_NUM_RESIDENT"] = mode
        # rebuild the jitted step PER MODE: the env flag is read at trace
        # time, so reusing one jit wrapper would replay the first mode's
        # cached executable; donate=False because the parity probe and
        # bench._measure replay the same state object
        step_fn = make_train_step(
            ChainLossOptions(
                l2_regularize=5e-4,
                leaky_hmm_coefficient=0.1,
                xent_regularize=0.1,
            ),
            donate=False,
        )
        state = create_train_state(TDNNF(cfg), feats, tx)
        # first-step objf from the identical fresh init = the parity probe
        _, m0 = step_fn(state, feats, den, sup)
        device_ms, wall_ms, state = bench._measure(
            step_fn, state, feats, den, sup, f"/tmp/tb_ab_numres_{mode}"
        )
        step_ms = device_ms if device_ms == device_ms else wall_ms
        audio = batch.feats.shape[0] * batch.sup.num_frames * 3 * 0.010
        results[mode] = dict(
            step_ms=round(step_ms, 3),
            wall_step_ms=round(wall_ms, 3),
            audio_s_per_s=round(audio / (step_ms / 1e3), 1),
            loss=float(m0["loss"]),
            objf=float(m0["objf"]),
        )
        print(
            json.dumps(dict(mode=("scan" if mode == "0" else "resident"),
                            **results[mode])),
            flush=True,
        )
    d = abs(results["0"]["objf"] - results["1"]["objf"])
    print(json.dumps(dict(objf_delta=d, parity_ok=bool(d < 1e-4))), flush=True)


if __name__ == "__main__":
    main()
