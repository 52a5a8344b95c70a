"""Scaling-efficiency benchmark (BASELINE north-star: >= 80% at v5e-16).

Measures audio-s/s of the full chain train step at data-parallel widths
1..N over whatever devices exist (real chips on a pod; the 8-virtual-CPU
mesh for harness validation: run with
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python tools/scaling_bench.py
on CPU, or plainly on a multi-chip TPU host).  Per-device batch is held
constant (weak scaling), so ideal efficiency keeps audio-s/s/device flat.
Prints one JSON line per width plus a summary efficiency figure.

NOTE: on the virtual CPU mesh the efficiency NUMBER is meaningless — all
"devices" share the same physical cores, so weak scaling cannot speed up.
The CPU run only validates that the harness compiles/executes each mesh
width; real efficiency requires real chips (the north-star target is
>= 80% at v5e-16).
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main(per_device_batch: int = 8, t_out: int = 25):
    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.models import TDNNF, TdnnfConfig
    from torchain_tpu.ops import ChainLossOptions, DeviceDenseDenGraph
    from torchain_tpu.ops.device_graphs import DeviceSupervision
    from torchain_tpu.parallel import (
        MeshConfig,
        batch_sharding,
        make_mesh,
        replicated,
    )
    from torchain_tpu.train import create_train_state, make_train_step

    n_dev = len(jax.devices())
    widths = [w for w in (1, 2, 4, 8, 16, 32) if w <= n_dev]
    max_b = per_device_batch * widths[-1]
    corpus = synthetic_dataset(
        num_utts=3 * max_b, num_phones=20, feat_dim=24,
        utt_frames_out=(t_out, t_out + 8), seed=0, lm_order=2,
    )
    cfg = TdnnfConfig(
        num_pdfs=corpus.tree.num_pdfs, hidden_dim=256, bottleneck_dim=64,
        prefinal_dim=128, num_layers=5,
    )
    model = TDNNF(cfg)
    left, right = cfg.context
    ds = ChainDataset(
        corpus.utts, corpus.tree, corpus.norm_fst, chunk_frames_out=t_out,
        left_context=left, right_context=right,
        sup_opts=SupervisionOptions(left_tolerance=2, right_tolerance=2),
    )
    batch = next(ds.batches(max_b, shuffle=False))
    den_host = DeviceDenseDenGraph.from_host(corpus.dense_den)
    sup_host = DeviceSupervision.from_host(batch.sup)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    step_fn = make_train_step(ChainLossOptions(leaky_hmm_coefficient=0.1))

    results = []
    for w in widths:
        B = per_device_batch * w
        mesh = make_mesh(MeshConfig(data=w, model=1), devices=jax.devices()[:w])
        with mesh:
            feats = jax.device_put(
                jnp.asarray(batch.feats[:B]), batch_sharding(mesh, 3)
            )
            sup = jax.tree.map(
                lambda x: jax.device_put(
                    x[:B] if x.ndim >= 1 and x.shape[0] == batch.feats.shape[0] else x,
                    batch_sharding(mesh, x.ndim),
                ),
                sup_host,
            )
            den = jax.device_put(den_host, replicated(mesh))
            state = create_train_state(model, feats, tx)
            state = state.replace(
                params=jax.device_put(state.params, replicated(mesh)),
                opt_state=jax.device_put(state.opt_state, replicated(mesh)),
                batch_stats=jax.device_put(state.batch_stats, replicated(mesh)),
            )
            for _ in range(3):
                state, m = step_fn(state, feats, den, sup)
            jax.block_until_ready(m["loss"])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(10):
                    state, m = step_fn(state, feats, den, sup)
                jax.block_until_ready(m["loss"])
                best = min(best, (time.perf_counter() - t0) / 10)
        audio = B * batch.sup.num_frames * 3 * 0.010
        per_dev = audio / best / w
        results.append((w, per_dev))
        print(json.dumps({
            "devices": w, "step_ms": round(best * 1e3, 3),
            "audio_s_per_s": round(audio / best, 1),
            "audio_s_per_s_per_device": round(per_dev, 1),
        }))
    eff = results[-1][1] / results[0][1]
    print(json.dumps({
        "metric": "weak_scaling_efficiency",
        "value": round(eff, 3),
        "from_devices": results[0][0],
        "to_devices": results[-1][0],
    }))


if __name__ == "__main__":
    main()
