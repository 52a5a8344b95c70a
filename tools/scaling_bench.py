"""Scaling audit for the shard_mapped resident kernels (VERDICT r4 #1).

Only one real TPU chip exists in this environment, so multi-chip scaling
cannot be *timed* here.  What CAN be established, and what this tool
measures:

1. **Collective audit** (8-virtual-device CPU mesh): compile the
   mesh-aware train step (chain_loss(mesh=...) -> shard_map -> resident
   Pallas kernels per shard) and inspect the optimized HLO.  The scaling
   claim rests on the batch NEVER being all-gathered: each chip must run
   the kernels on its own B/N rows, with cross-chip traffic limited to
   the grad/stat all-reduces data parallelism fundamentally requires.
   The audit fails loudly if any all-gather moves activation-batch-sized
   operands (the GSPMD custom-call fallback this round was built to
   kill).

2. **Per-shard step time** (real TPU, when reachable): the per-chip cost
   of an N-chip data-parallel deployment is the single-chip step at the
   per-chip batch PLUS the grad all-reduce.  The kernels themselves need
   no communication (sequences are independent), so measuring the
   single-chip resident step at B/N directly bounds the compute term of
   the >=80%-efficiency north star; the audit in (1) proves no hidden
   resharding is added around it.

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_bench.py --audit
    python tools/scaling_bench.py --perchip 32   # on the TPU box
"""

from __future__ import annotations

import argparse
import json
import re
import sys

sys.path.insert(0, "/root/repo")


def _mesh_problem(n_devices: int, batch: int):
    import jax
    import jax.numpy as jnp
    import optax

    import __graft_entry__ as ge
    from torchain_tpu.ops import ChainLossOptions
    from torchain_tpu.ops.device_graphs import DeviceSupervision
    from torchain_tpu.parallel import (
        MeshConfig,
        batch_sharding,
        make_mesh,
        replicated,
        shard_params,
    )
    from torchain_tpu.train import create_train_state, make_train_step

    mesh = make_mesh(
        MeshConfig(data=n_devices, model=1),
        devices=jax.devices()[:n_devices],
    )
    model, cfg, den, batch_obj, example_feats = ge._build_tiny(
        num_phones=20,
        feat_dim=40,
        t_out=50,
        batch=batch,
        context_width=2,
        hidden_dim=256,
        lm_order=3,
        lm_extra_states=300,
        den_kind="resident",
    )
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    state = create_train_state(model, example_feats, tx)
    state = state.replace(
        params=shard_params(mesh, state.params),
        batch_stats=jax.device_put(state.batch_stats, replicated(mesh)),
        opt_state=jax.device_put(state.opt_state, replicated(mesh)),
    )
    den = jax.device_put(den, replicated(mesh))
    feats = jax.device_put(
        jnp.asarray(batch_obj.feats), batch_sharding(mesh, 3)
    )
    sup_host = DeviceSupervision.from_host(batch_obj.sup)
    sup = jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim)), sup_host
    )
    step_fn = make_train_step(
        ChainLossOptions(
            l2_regularize=1e-4, leaky_hmm_coefficient=0.1, xent_regularize=0.1
        ),
        donate=False,
        mesh=mesh,
    )
    return mesh, step_fn, state, feats, den, sup


def audit(n_devices: int = 8, batch: int = 32) -> dict:
    """Compile the mesh-aware step and classify every collective in the
    optimized HLO by operand bytes."""
    import os

    os.environ.setdefault("TORCHAIN_NUM_RESIDENT", "force")
    import jax

    if len(jax.devices()) < n_devices:
        from jax.extend import backend as _jeb

        _jeb.clear_backends()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", int(n_devices))

    mesh, step_fn, state, feats, den, sup = _mesh_problem(n_devices, batch)
    with mesh:
        lowered = step_fn.lower(state, feats, den, sup)
        hlo = lowered.compile().as_text()

    # Operand bytes of every collective op (one HLO op per line; tuple
    # results sum their element sizes).  Collectives whose replica_groups
    # are all singletons ({{0},{1},...}) are identity ops (e.g. the psum
    # over a size-1 mesh axis from shard_map transposes) and carry no
    # traffic — classified separately.
    kind_re = re.compile(
        r"=\s*(.*?)\s(all-gather|all-reduce|reduce-scatter"
        r"|collective-permute|all-to-all)\("
    )
    shape_re = re.compile(r"([a-z][a-z0-9]*)\[([0-9,]*)\]")
    groups_re = re.compile(r"replica_groups=\{(.*?)\}\s*[,)]")
    dtype_bytes = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                   "s16": 2, "u8": 1, "pred": 1, "f64": 8, "s64": 8}
    found: dict[str, list[int]] = {}
    noop = 0
    for line in hlo.splitlines():
        m = kind_re.search(line)
        if not m:
            continue
        result, kind = m.groups()
        g = groups_re.search(line)
        if g and not re.search(r"\d+\s*,\s*\d+", g.group(1)):
            noop += 1  # all singleton groups: no traffic
            continue
        total = 0
        for dt, dims in shape_re.findall(result):
            n = 1
            for d in dims.split(","):
                if d.strip():
                    n *= int(d)
            total += n * dtype_bytes.get(dt, 4)
        found.setdefault(kind, []).append(total)

    # threshold: anything >= one shard's activation block (B/N * T * P * 4)
    B, T_in, F = feats.shape
    P = den.num_pdfs
    t_out = sup.num_frames
    shard_act_bytes = (B // n_devices) * t_out * P * 4
    big_gathers = [
        b for b in found.get("all-gather", []) if b >= shard_act_bytes
    ]
    out = {
        "n_devices": n_devices,
        "batch": B,
        "den_path": type(den).__name__,
        "shard_activation_bytes": shard_act_bytes,
        "collectives_bytes": {k: sorted(v, reverse=True)[:8] for k, v in found.items()},
        "singleton_group_noops": noop,
        "batch_allgather_count": len(big_gathers),
        "ok": len(big_gathers) == 0,
    }
    return out


def perchip(batch: int) -> dict:
    """Single-chip resident step time at the per-chip batch — the compute
    term of an N-chip DP deployment (see module docstring)."""
    import bench as _bench

    _bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from torchain_tpu.data import synthetic_dataset

    T_OUT = 50
    corpus = synthetic_dataset(
        num_utts=2 * batch,
        num_phones=40,
        feat_dim=40,
        utt_frames_out=(T_OUT, T_OUT + 10),
        seed=0,
        lm_order=3,
        lm_extra_states=1000,
    )
    step_fn, state, feats, den, sup, audio_s, _dataset = _bench._build(
        corpus, jnp.bfloat16, batch, T_OUT
    )
    device_ms, wall_ms, _ = _bench._measure(
        step_fn, state, feats, den, sup, "/tmp/tb_scaling"
    )
    step_ms = device_ms if device_ms == device_ms else wall_ms
    return {
        "per_chip_batch": batch,
        "den_path": type(den).__name__,
        "step_ms": round(step_ms, 3),
        "wall_step_ms": round(wall_ms, 3),
        "audio_s_per_s_per_chip": round(audio_s / (step_ms / 1e3), 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--audit", action="store_true")
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--perchip", type=int, default=0)
    args = ap.parse_args()
    out = {}
    if args.audit:
        out.update(audit(args.devices, args.batch))
    if args.perchip:
        out.update(perchip(args.perchip))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
