"""Same-process protocol shootout for one train step program.

Measures the IDENTICAL jitted TDNN-F train step three ways in one
process:
  window   — min over 5 windows of 20 state-threaded dispatches
             (bench.py's protocol)
  diffchain— (t(26) - t(6)) / 20 over state-threaded dispatches
             (tools/chained_bench.py's protocol)
  scan     — (t(scan 12) - t(scan 4)) / 8 with the step inside lax.scan
             (single-dispatch device truth)

If these disagree in-process, the relay's execution semantics differ per
protocol; if they agree, earlier cross-tool discrepancies were config
bugs.  BENCH_NOTES round 2 context: window said ~1 ms, diffchain said
~214 ms for (what should be) the same f32 program.

Usage: timeout 2400 python tools/probe_protocols.py [--dtype f32]
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
    ap.add_argument("--dtype", default="f32", choices=("bf16", "f32"))
    ap.add_argument("--b", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from functools import partial

    from torchain_tpu.utils.compile_cache import enable as _cc

    _cc()

    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.models import TDNNF, TdnnfConfig
    from torchain_tpu.ops import ChainLossOptions, DeviceDenseDenGraph
    from torchain_tpu.ops.device_graphs import DeviceSupervision
    from torchain_tpu.train import create_train_state, make_train_step

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
    batch = next(dataset.batches(B, shuffle=False))
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
    print(f"backend={jax.default_backend()} dtype={args.dtype}", flush=True)

    # warm up / compile the step once
    st, metrics = step_fn(state, feats, den, sup)
    jax.block_until_ready(metrics["loss"])

    # -- window protocol (bench.py) --
    best = float("inf")
    st = state
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(20):
            st, metrics = step_fn(st, feats, den, sup)
        jax.block_until_ready(metrics["loss"])
        best = min(best, (time.perf_counter() - t0) / 20)
    print(json.dumps(dict(protocol="window", per_step_ms=round(best * 1e3, 3))), flush=True)

    # -- diffchain protocol (chained_bench dispatch mode) --
    def run(n):
        t0 = time.perf_counter()
        s = state
        for _ in range(n):
            s, m = step_fn(s, feats, den, sup)
        jax.block_until_ready(m["loss"])
        return time.perf_counter() - t0

    run(6)
    best = float("inf")
    for _ in range(3):
        t1 = run(6)
        t2 = run(26)
        print(json.dumps(dict(protocol="diffchain_raw", t6_s=round(t1, 3), t26_s=round(t2, 3))), flush=True)
        best = min(best, (t2 - t1) / 20)
    print(json.dumps(dict(protocol="diffchain", per_step_ms=round(best * 1e3, 3))), flush=True)

    # -- scan protocol (single dispatch) --
    @partial(jax.jit, static_argnums=(3,))
    def scan_steps(state, feats, sup, n):
        def body(st, _):
            st, m = step_fn(st, feats, den, sup)
            return st, m["loss"]
        st, losses = jax.lax.scan(body, state, None, length=n)
        return losses[-1]

    jax.block_until_ready(scan_steps(state, feats, sup, 4))
    jax.block_until_ready(scan_steps(state, feats, sup, 12))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(scan_steps(state, feats, sup, 4))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(scan_steps(state, feats, sup, 12))
        t2 = time.perf_counter() - t0
        best = min(best, (t2 - t1) / 8)
    print(json.dumps(dict(protocol="scan", per_step_ms=round(best * 1e3, 3))), flush=True)


if __name__ == "__main__":
    main()
