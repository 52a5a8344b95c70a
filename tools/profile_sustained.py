"""Break down the sustained-path per-batch cost (VERDICT r4 #3 follow-up):
batch build (loader numpy work) vs DeviceSupervision.from_host vs H2D
transfer vs device step, measured separately on the real chip.

Usage: python tools/profile_sustained.py [--production] [--batch 128]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--production", action="store_true")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=6)
    args = ap.parse_args()

    import bench as _bench

    _bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from torchain_tpu.data import synthetic_dataset
    from torchain_tpu.ops.device_graphs import DeviceSupervision

    B, T_OUT = args.batch, 50
    kw = (
        dict(context_width=2, lm_order=4, lm_extra_states=2000)
        if args.production
        else dict(lm_order=3, lm_extra_states=1000)
    )
    corpus = synthetic_dataset(
        num_utts=2 * B,
        num_phones=40,
        feat_dim=40,
        utt_frames_out=(T_OUT, T_OUT + 10),
        seed=0,
        **kw,
    )
    step_fn, state, feats0, den, sup0, audio_s, dataset = _bench._build(
        corpus, jnp.bfloat16, B, T_OUT
    )
    caps = dataset.estimate_sup_caps()

    # warm: compile with capped shapes
    batches = list(dataset.batches(B, epoch=0, sup_caps=caps))
    b = batches[0]
    sup = DeviceSupervision.from_host(b.sup)
    f = jnp.asarray(b.feats)
    state, m = step_fn(state, f, den, sup)
    jax.block_until_ready(m["loss"])

    stages = {k: [] for k in ("build", "from_host", "h2d", "step")}
    bytes_h2d = 0
    for r in range(args.rounds):
        t0 = time.perf_counter()
        bs = list(dataset.batches(B, epoch=r + 1, sup_caps=caps))
        t1 = time.perf_counter()
        stages["build"].append((t1 - t0) * 1e3 / len(bs))
        for b in bs[:2]:
            t0 = time.perf_counter()
            sup = DeviceSupervision.from_host(b.sup)
            f = jnp.asarray(b.feats)
            t1 = time.perf_counter()
            jax.block_until_ready((sup, f))
            t2 = time.perf_counter()
            state, m = step_fn(state, f, den, sup)
            jax.block_until_ready(m["loss"])
            t3 = time.perf_counter()
            stages["from_host"].append((t1 - t0) * 1e3)
            stages["h2d"].append((t2 - t1) * 1e3)
            stages["step"].append((t3 - t2) * 1e3)
            if bytes_h2d == 0:
                for x in jax.tree.leaves((sup, f)):
                    bytes_h2d += x.size * x.dtype.itemsize
    med = {k: round(float(np.median(v)), 2) for k, v in stages.items()}
    print(f"batches/epoch={len(bs)} h2d_bytes={bytes_h2d/1e6:.1f}MB")
    print(f"per-batch ms (median): {med}")
    print(
        f"implied H2D bandwidth: "
        f"{bytes_h2d / 1e6 / max(med['h2d'], 1e-9) * 1e3:.0f} MB/s"
    )


if __name__ == "__main__":
    main()
