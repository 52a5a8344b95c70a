"""Benchmark: chain-training throughput in audio-seconds/s/chip.

Runs the full jitted train step (TDNN-F + chain loss on the auto-selected
denominator path) at two realistic configurations and prints ONE JSON
line.

Timing protocol (round-2 adjudication, BENCH_NOTES): the headline is the
**device-trace span per step** — jax.profiler's device timeline measured
by the chip itself — NOT host wall clock.  Through the axon relay,
host-side window timing is untrustworthy in both directions (pipelined
windows reported wall/step *below* the device span of one step, which is
physically impossible for state-dependent steps; chained-dispatch
differencing reported 30x above it).  The device span of N queued
dependent steps is relay-proof: dispatch is async, the device executes
the chain back-to-back, and the trace records device timestamps.  Wall
time is reported alongside for transparency.

Baseline note: the reference (torchain) publishes no numbers
(BASELINE.md); `vs_baseline` is measured against 1000 audio-s/s — the
order-of-magnitude throughput of the Kaldi-era single-GPU chain setups
the reference targeted (BASELINE.md ecosystem anchors).
"""

import json
import shutil
import time


def _tpu_reachable(timeout_s: int = 150, attempts: int = 4) -> bool:
    """Killable-subprocess backend probe (see torchain_tpu.utils.backend):
    a dead relay makes jax.devices() hang uninterruptibly in-process.
    The relay has been observed to FLAP on minute scales (round 4), so a
    single failed probe retries with backoff before the run is condemned
    to the CPU fallback."""
    from torchain_tpu.utils.backend import backend_reachable

    for i in range(attempts):
        if backend_reachable(timeout_s):
            return True
        if i + 1 < attempts:
            print(
                f"[bench] TPU probe {i + 1}/{attempts} failed; retrying in 60 s",
                flush=True,
            )
            time.sleep(60)
    return False


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


def _measure(step_fn, state, feats, den, sup, logdir, steps=10):
    """Device-trace-measured per-step time for the full train step.

    Returns (device_ms, wall_ms, state); device_ms is NaN if the trace
    could not be parsed (e.g. CPU backend), in which case callers fall
    back to wall_ms."""
    import jax

    for _ in range(3):
        state, metrics = step_fn(state, feats, den, sup)
    jax.block_until_ready(metrics["loss"])

    wall = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = step_fn(state, feats, den, sup)
        jax.block_until_ready(metrics["loss"])
        wall = min(wall, (time.perf_counter() - t0) / steps)

    device_ms = float("nan")
    try:
        from tools.trace_utils import device_summary, load_latest_trace

        shutil.rmtree(logdir, ignore_errors=True)
        jax.profiler.start_trace(logdir)
        for _ in range(steps):
            state, metrics = step_fn(state, feats, den, sup)
        jax.block_until_ready(metrics["loss"])
        jax.profiler.stop_trace()
        s = device_summary(load_latest_trace(logdir))
        # busy (sum of XLA-module execution durations) is the per-step
        # device truth: the raw span can include device-IDLE gaps when the
        # relay's dispatch feed hiccups mid-trace (observed: a 124 ms span
        # over 63 ms of busy), while module durations cannot under-report
        # a step — one program runs at a time per core
        device_ms = (s["busy_ms"] or s["span_ms"]) / steps
    except Exception:
        pass
    return device_ms, wall * 1e3, state


def _build(corpus, dtype, B, T_OUT):
    import jax.numpy as jnp
    import optax

    from torchain_tpu.data import ChainDataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.models import TDNNF, TdnnfConfig
    from torchain_tpu.ops import ChainLossOptions, auto_den_graph
    from torchain_tpu.ops.device_graphs import DeviceSupervision
    from torchain_tpu.train import create_train_state, make_train_step

    cfg = TdnnfConfig(
        num_pdfs=corpus.tree.num_pdfs,
        hidden_dim=768,
        bottleneck_dim=96,
        prefinal_dim=256,
        num_layers=9,
        dtype=dtype,
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
    # the bench replays this batch (device-span protocol), which matches
    # the materialized-training economics: carry the kernel-layout
    # numerator tables prepared at placement time
    sup = DeviceSupervision.from_host(batch.sup).with_kernel_tables()
    feats = jnp.asarray(batch.feats)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    step_fn = make_train_step(
        ChainLossOptions(
            l2_regularize=5e-4, leaky_hmm_coefficient=0.1, xent_regularize=0.1
        )
    )
    state = create_train_state(TDNNF(cfg), feats, tx)
    audio_s = batch.feats.shape[0] * batch.sup.num_frames * 3 * 0.010
    return step_fn, state, feats, den, sup, audio_s, dataset


def _sustained(step_fn, state, den, dataset, B, min_batches=24, depth=4,
               threads=0):
    """Sustained TRAINING throughput (VERDICT r4 #3): live
    ChainDataset.batches -> Prefetcher -> device steps, wall-clocked over
    >= min_batches warm batches.  Unlike _measure (device span of one
    replayed batch), this includes host-side egs assembly, H2D transfer,
    and dispatch — the number SURVEY §6 defines as the metric.

    The warm pass compiles the jit program and fills the supervision /
    feature caches (Kaldi's offline egs-archive role); timed epochs then
    measure the steady state a long training run actually sees."""
    import jax
    import jax.numpy as jnp

    from torchain_tpu.data import Prefetcher
    from torchain_tpu.ops.device_graphs import DeviceSupervision

    caps = dataset.estimate_sup_caps()

    def put_iter(epoch):
        for b in dataset.batches(
            B, epoch=epoch, sup_caps=caps, num_threads=threads
        ):
            if isinstance(b.sup, DeviceSupervision):  # device-materialized
                yield b, b.feats, b.sup
            else:
                yield b, jnp.asarray(b.feats), DeviceSupervision.from_host(
                    b.sup
                )

    m = None
    for _b, feats, sup in put_iter(0):  # warm pass
        state, m = step_fn(state, feats, den, sup)
    if m is None:
        raise RuntimeError("dataset yielded no batches")
    jax.block_until_ready(m["loss"])

    audio = 0.0
    n = 0
    epoch = 1
    t0 = time.perf_counter()
    while n < min_batches:
        for b, feats, sup in Prefetcher(put_iter(epoch), depth=depth):
            state, m = step_fn(state, feats, den, sup)
            audio += b.feats.shape[0] * b.sup.num_frames * 3 * 0.010
            n += 1
        epoch += 1
    jax.block_until_ready(m["loss"])
    wall = time.perf_counter() - t0
    # step_fn donates its state: hand the live state back so callers can
    # run another measurement (the donated input buffers are dead)
    return dict(
        batches=n,
        step_ms=round(wall * 1e3 / n, 2),
        audio_s_per_s_per_chip=round(audio / wall, 1),
    ), state


def production_config():
    """Production-scale measurement (VERDICT r1 item 1): 4-gram pruned LM +
    left-biphone tree (S~3.9k, P=1680), VMEM-resident Pallas denominator,
    TDNN-F bf16 trunk, B=128.  Returns dict of extra headline fields."""
    import jax
    import jax.numpy as jnp

    from torchain_tpu.data import synthetic_dataset

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
    step_fn, state, feats, den, sup, audio_s, dataset = _build(
        corpus, jnp.bfloat16, B, T_OUT
    )
    device_ms, wall_ms, state = _measure(
        step_fn, state, feats, den, sup, "/tmp/tb_bench_prod"
    )
    step_ms = device_ms if device_ms == device_ms else wall_ms
    n_dev = max(1, len(jax.devices()))
    out = {
        "production_den_path": type(den).__name__,
        "production_step_ms": round(step_ms, 2),
        "production_wall_step_ms": round(wall_ms, 2),
        "production_audio_s_per_s_per_chip": round(
            audio_s / (step_ms / 1e3) / n_dev, 1
        ),
    }
    try:
        from torchain_tpu.data import MaterializedBatches

        sus, state = _sustained(step_fn, state, den, dataset, B)
        out["production_sustained_step_ms"] = sus["step_ms"]
        out["production_sustained_audio_s_per_s_per_chip"] = sus[
            "audio_s_per_s_per_chip"
        ]
        mat = MaterializedBatches(dataset, B, device=True)
        sus_m, state = _sustained(step_fn, state, den, mat, B)
        out["production_sustained_materialized_step_ms"] = sus_m["step_ms"]
        out["production_sustained_materialized_audio_s_per_s_per_chip"] = (
            sus_m["audio_s_per_s_per_chip"]
        )
    except Exception as e:  # noqa: BLE001
        out["production_sustained_error"] = str(e)[:200]
    return out


def main():
    tpu_dead = not _tpu_reachable()
    import jax

    if tpu_dead:  # relay down: CPU fallback beats hanging forever
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    _enable_compile_cache()

    from torchain_tpu.data import synthetic_dataset

    # realistic scale: ~40 phones, pruned TRIGRAM phone LM (den graph
    # ~2k states / ~4k arcs, Kaldi-recipe scale), T_out=50 (1.5 s audio
    # per chunk at 10 ms input frames, frame-subsampling 3), batch 128
    # (the measured audio-s/s sweet spot: B=64 -> 128 gains ~3%, B=256
    # regresses — BENCH_NOTES round 2 batch sweep)
    B, T_OUT = 128, 50
    corpus = synthetic_dataset(
        num_utts=2 * B,
        num_phones=40,
        feat_dim=40,
        utt_frames_out=(T_OUT, T_OUT + 10),
        seed=0,
        lm_order=3,
        lm_extra_states=1000,
    )

    # measure f32 and bf16 trunks IN ONE process and report the best
    results = {}
    sustained_ctx = {}
    for tag, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        step_fn, state, feats, den, sup, audio_s, dataset = _build(
            corpus, dtype, B, T_OUT
        )
        device_ms, wall_ms, state = _measure(
            step_fn, state, feats, den, sup, f"/tmp/tb_bench_{tag}"
        )
        results[tag] = (device_ms, wall_ms, audio_s, type(den).__name__)
        sustained_ctx[tag] = (step_fn, state, den, dataset)

    # prefer device-trace numbers; fall back to wall (CPU dev runs)
    have_device = all(r[0] == r[0] for r in results.values())
    pick = min(results, key=lambda k: results[k][0 if have_device else 1])
    device_ms, wall_ms, audio_s, den_name = results[pick]
    step_ms = device_ms if have_device else wall_ms
    n_dev = max(1, len(jax.devices()))
    value = audio_s / (step_ms / 1e3) / n_dev
    out = {
        "metric": "audio_seconds_per_second_per_chip",
        "value": round(value, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(value / 1000.0, 3),
        "protocol": "device_trace_span" if have_device else "wall_window",
        "dtype": pick,
        "den_path": den_name,
        "step_ms": round(step_ms, 2),
        "wall_step_ms": round(wall_ms, 2),
    }
    if tpu_dead:
        out["tpu_unreachable"] = True  # relay down; CPU-fallback numbers
    # sustained TRAINING throughput at the headline config (VERDICT r4
    # #3): live loader + prefetcher + device steps; the gap between this
    # and the device-span number is the host-side cost the device-only
    # protocol hides
    if jax.default_backend() == "tpu":
        try:
            from torchain_tpu.data import MaterializedBatches

            step_fn, state, den, dataset = sustained_ctx[pick]
            sus, state = _sustained(step_fn, state, den, dataset, B)
            out["sustained_step_ms"] = sus["step_ms"]
            out["sustained_audio_s_per_s_per_chip"] = sus[
                "audio_s_per_s_per_chip"
            ]
            out["sustained_vs_device_gap_pct"] = round(
                100.0 * (sus["step_ms"] - step_ms) / step_ms, 1
            )
            # the production economics: batches materialized once (the
            # merged-cegs-archive role), epochs replay them — per-batch
            # host cost is device placement only
            mat = MaterializedBatches(dataset, B, device=True)
            sus_m, state = _sustained(step_fn, state, den, mat, B)
            out["sustained_materialized_step_ms"] = sus_m["step_ms"]
            out["sustained_materialized_audio_s_per_s_per_chip"] = sus_m[
                "audio_s_per_s_per_chip"
            ]
        except Exception as e:  # noqa: BLE001
            out["sustained_error"] = str(e)[:200]
    # second headline: the production-scale (4-gram biphone) configuration
    # (the VERDICT r1 "report BOTH graph scales" requirement); guarded so
    # a failure/timeout there never loses the primary metric
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
