"""Benchmark: chain-training throughput in audio-seconds/s/chip.

Runs the full jitted train step (TDNN-F + dense-MXU chain loss) at a
realistic configuration on whatever accelerator is available (the driver
runs this on one real TPU chip) and prints ONE JSON line.

Baseline note: the reference (torchain) publishes no numbers
(BASELINE.md); `vs_baseline` is measured against 1000 audio-s/s — the
order-of-magnitude throughput of the Kaldi-era single-GPU chain setups the
reference targeted (BASELINE.md ecosystem anchors).
"""

import json
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compilation cache: TPU compiles through the axon
    relay cost minutes; caching makes repeat runs (and the driver's bench
    run after a warm-up) near-instant."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def production_config():
    """Production-scale measurement (VERDICT r1 item 1): 4-gram pruned LM +
    left-biphone tree (S~3.9k, P=1680), VMEM-resident Pallas denominator,
    TDNN-F bf16 trunk, B=128.  Returns dict of extra headline fields."""
    import time as _t

    import jax
    import jax.numpy as jnp
    import optax

    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.models import TDNNF, TdnnfConfig
    from torchain_tpu.ops import ChainLossOptions, auto_den_graph
    from torchain_tpu.ops.device_graphs import DeviceSupervision
    from torchain_tpu.train import create_train_state, make_train_step

    B, T_OUT = 128, 50
    corpus = synthetic_dataset(
        num_utts=2 * B,
        num_phones=40,
        feat_dim=40,
        utt_frames_out=(T_OUT, T_OUT + 10),
        seed=0,
        context_width=2,
        lm_order=4,
        lm_extra_states=2000,
    )
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
    den = auto_den_graph(corpus.den_graph, batch_hint=B)
    sup = DeviceSupervision.from_host(batch.sup)
    feats = jnp.asarray(batch.feats)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    step_fn = make_train_step(
        ChainLossOptions(
            l2_regularize=5e-4, leaky_hmm_coefficient=0.1, xent_regularize=0.1
        )
    )
    model = TDNNF(cfg)
    state = create_train_state(model, feats, tx)
    for _ in range(3):
        state, metrics = step_fn(state, feats, den, sup)
    jax.block_until_ready(metrics["loss"])
    best = float("inf")
    for _ in range(4):
        t0 = _t.perf_counter()
        for _ in range(10):
            state, metrics = step_fn(state, feats, den, sup)
        jax.block_until_ready(metrics["loss"])
        best = min(best, (_t.perf_counter() - t0) / 10)
    audio = batch.feats.shape[0] * batch.sup.num_frames * 3 * 0.010
    return {
        "production_den_path": type(den).__name__,
        "production_step_ms": round(best * 1e3, 2),
        "production_audio_s_per_s_per_chip": round(
            audio / best / max(1, len(jax.devices())), 1
        ),
    }


def main():
    import jax
    import jax.numpy as jnp
    import optax

    _enable_compile_cache()

    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.models import TDNNF, TdnnfConfig
    from torchain_tpu.ops import ChainLossOptions, DeviceDenseDenGraph
    from torchain_tpu.ops.device_graphs import DeviceSupervision
    from torchain_tpu.train import create_train_state, make_train_step

    # realistic scale: ~40 phones, pruned TRIGRAM phone LM (den graph
    # ~2k states / ~4k expanded, Kaldi-recipe scale), T_out=50 (1.5 s audio
    # per chunk at 10 ms input frames, frame-subsampling 3), batch 64
    B, T_OUT, FEAT = 64, 50, 40
    corpus = synthetic_dataset(
        num_utts=2 * B,
        num_phones=40,
        feat_dim=FEAT,
        utt_frames_out=(T_OUT, T_OUT + 10),
        seed=0,
        lm_order=3,
        lm_extra_states=1000,
    )
    def make_cfg(dtype):
        return TdnnfConfig(
            num_pdfs=corpus.tree.num_pdfs,
            hidden_dim=768,
            bottleneck_dim=96,
            prefinal_dim=256,
            num_layers=9,
            dtype=dtype,
        )

    cfg = make_cfg(jnp.float32)
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
        )
    )

    # measure f32 and bf16 trunks IN ONE process (cross-run machine noise
    # here exceeds the dtype delta; same-process min-of-windows is reliable)
    def measure(dtype):
        model = TDNNF(make_cfg(dtype))
        state = create_train_state(model, feats, tx)
        for _ in range(3):
            state, metrics = step_fn(state, feats, den, sup)
        jax.block_until_ready(metrics["loss"])
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(20):
                state, metrics = step_fn(state, feats, den, sup)
            jax.block_until_ready(metrics["loss"])
            best = min(best, (time.perf_counter() - t0) / 20)
        return best

    best = min(measure(jnp.float32), measure(jnp.bfloat16))

    b_actual = batch.feats.shape[0]
    audio_seconds_per_batch = b_actual * batch.sup.num_frames * 3 * 0.010
    value = audio_seconds_per_batch / best / max(1, len(jax.devices()))
    out = {
        "metric": "audio_seconds_per_second_per_chip",
        "value": round(value, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(value / 1000.0, 3),
    }
    # second headline: the production-scale (4-gram biphone) configuration
    # on the VMEM-resident Pallas path — TPU only (the VERDICT r1 "report
    # BOTH graph scales" requirement); guarded so a failure/timeout there
    # never loses the primary metric
    if jax.default_backend() == "tpu":
        try:
            out.update(production_config())
        except Exception as e:  # noqa: BLE001
            out["production_error"] = str(e)[:200]
    print(json.dumps(out))


if __name__ == "__main__":
    try:
        main()
    except Exception:  # one retry: the TPU relay occasionally hiccups
        import traceback

        traceback.print_exc()
        main()
