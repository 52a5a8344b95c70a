"""Physics-checked step timing: dispatch-mode diffchain + XLA FLOP audit.

Protocol lessons (BENCH_NOTES round 2):
  * window and diffchain agree in a clean process at trigram scale (~1 ms)
    but window reported physically impossible numbers at production scale;
  * scan-of-steps measures a DIFFERENT (de-optimized) program;
  * concurrent TPU processes poison every protocol (relay serializes);
  * min over PAIRED diffs goes negative under relay jitter — the estimator
    here is min(t_n2) - min(t_n1) over separate repeats.

This tool prints, per config, XLA's own FLOP count for the jitted step
(compiled.cost_analysis()), the diffchain step time, and the implied
TFLOP/s.  A measurement whose implied TFLOP/s exceeds the chip's measured
peak (tools/probe_peak.py: ~179 bf16 on this v5e) is an artifact and must
not be published.

Usage: timeout 3000 python tools/truth_bench.py --configs trigram production --batches 64 128
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def build(config, B, T_OUT=50, dtype="bf16"):
    import jax.numpy as jnp
    import optax

    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.models import TDNNF, TdnnfConfig
    from torchain_tpu.ops import ChainLossOptions, DeviceDenseDenGraph, auto_den_graph
    from torchain_tpu.ops.device_graphs import DeviceSupervision
    from torchain_tpu.train import create_train_state, make_train_step

    kw = dict(lm_order=3, lm_extra_states=1000)
    if config == "production":
        kw = dict(lm_order=4, lm_extra_states=2000, context_width=2)
    corpus = synthetic_dataset(
        num_utts=2 * B,
        num_phones=40,
        feat_dim=40,
        utt_frames_out=(T_OUT, T_OUT + 10),
        seed=0,
        **kw,
    )
    cfg = TdnnfConfig(
        num_pdfs=corpus.tree.num_pdfs,
        hidden_dim=768,
        bottleneck_dim=96,
        prefinal_dim=256,
        num_layers=9,
        dtype=jnp.bfloat16 if dtype == "bf16" else jnp.float32,
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
    if config == "production":
        den = auto_den_graph(corpus.den_graph, batch_hint=B)
    else:
        den = DeviceDenseDenGraph.from_host(corpus.dense_den)
    sup = DeviceSupervision.from_host(batch.sup)
    feats = jnp.asarray(batch.feats)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    step_fn = make_train_step(
        ChainLossOptions(
            l2_regularize=5e-4, leaky_hmm_coefficient=0.1, xent_regularize=0.1
        ),
        donate=False,  # these protocols replay the same state object
    )
    model = TDNNF(cfg)
    state = create_train_state(model, feats, tx)
    audio = batch.feats.shape[0] * batch.sup.num_frames * 3 * 0.010
    return step_fn, state, feats, den, sup, audio, type(den).__name__


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="+", default=["trigram", "production"])
    ap.add_argument("--batches", type=int, nargs="+", default=[64, 128])
    ap.add_argument("--dtype", default="bf16", choices=("bf16", "f32"))
    ap.add_argument("--n1", type=int, default=6)
    ap.add_argument("--n2", type=int, default=26)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax

    from torchain_tpu.utils.compile_cache import enable as _cc

    _cc()

    print(
        json.dumps(
            dict(
                backend=jax.default_backend(),
                device_kind=getattr(jax.devices()[0], "device_kind", "?"),
            )
        ),
        flush=True,
    )

    for config in args.configs:
        for B in args.batches:
            step_fn, state, feats, den, sup, audio, den_name = build(
                config, B, dtype=args.dtype
            )
            # XLA's own FLOP count for the whole jitted step
            flops = None
            try:
                lowered = jax.jit(step_fn).lower(state, feats, den, sup)
                ca = lowered.compile().cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                flops = float(ca.get("flops", float("nan")))
            except Exception as e:  # noqa: BLE001
                print(json.dumps(dict(config=config, B=B, cost_analysis_error=str(e)[:120])), flush=True)

            # warm-up: compile + first-execution one-time costs
            st, metrics = step_fn(state, feats, den, sup)
            jax.block_until_ready(metrics["loss"])

            def run(n):
                t0 = time.perf_counter()
                s = state
                for _ in range(n):
                    s, m = step_fn(s, feats, den, sup)
                jax.block_until_ready(m["loss"])
                return time.perf_counter() - t0, float(m["loss"])

            run(args.n1)  # shake out any residual one-time work
            t1s, t2s, loss = [], [], None
            for _ in range(args.reps):
                t1, _ = run(args.n1)
                t2, loss = run(args.n2)
                t1s.append(t1)
                t2s.append(t2)
            step = (min(t2s) - min(t1s)) / (args.n2 - args.n1)
            implied = flops / step / 1e12 if flops else None
            print(
                json.dumps(
                    dict(
                        config=config,
                        B=B,
                        den=den_name,
                        dtype=args.dtype,
                        xla_gflops_per_step=round(flops / 1e9, 1) if flops else None,
                        t1s=[round(t, 3) for t in t1s],
                        t2s=[round(t, 3) for t in t2s],
                        step_ms=round(step * 1e3, 3),
                        implied_tflops=round(implied, 1) if implied else None,
                        audio_s_per_s=round(audio / step, 1),
                        final_loss=loss,
                    )
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
