"""Sweep TORCHAIN_SCAN_UNROLL over the full train step (subprocess per
value to get fresh jit caches; repeated to average out relay noise)."""

import json
import os
import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).parent

BODY = r"""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent) if '__file__' in dir() else '/root/repo')
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np, optax
from torchain_tpu.data import ChainDataset, synthetic_dataset
from torchain_tpu.graphs import SupervisionOptions
from torchain_tpu.models import TDNNF, TdnnfConfig
from torchain_tpu.ops import ChainLossOptions, DeviceDenseDenGraph
from torchain_tpu.ops.device_graphs import DeviceSupervision
from torchain_tpu.train import create_train_state, make_train_step

B, T_OUT, FEAT = 64, 50, 40
corpus = synthetic_dataset(num_utts=2*B, num_phones=40, feat_dim=FEAT,
                           utt_frames_out=(T_OUT, T_OUT+10), seed=0)
cfg = TdnnfConfig(num_pdfs=corpus.tree.num_pdfs, hidden_dim=768,
                  bottleneck_dim=96, prefinal_dim=256, num_layers=9)
model = TDNNF(cfg)
left, right = cfg.context
ds = ChainDataset(corpus.utts, corpus.tree, corpus.norm_fst, chunk_frames_out=T_OUT,
                  left_context=left, right_context=right,
                  sup_opts=SupervisionOptions(left_tolerance=2, right_tolerance=2))
batch = next(ds.batches(B, shuffle=False))
den = DeviceDenseDenGraph.from_host(corpus.dense_den)
sup = DeviceSupervision.from_host(batch.sup)
feats = jnp.asarray(batch.feats)
tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
state = create_train_state(model, feats, tx)
step_fn = make_train_step(ChainLossOptions(l2_regularize=5e-4, leaky_hmm_coefficient=0.1, xent_regularize=0.1))
for _ in range(3):
    state, m = step_fn(state, feats, den, sup)
jax.block_until_ready(m['loss'])
times = []
for _ in range(5):
    t0 = time.perf_counter()
    for _ in range(20):
        state, m = step_fn(state, feats, den, sup)
    jax.block_until_ready(m['loss'])
    times.append((time.perf_counter()-t0)/20)
print(f"RESULT {min(times)*1e3:.3f} ms (min of 5x20)")
"""


def main():
    for unroll in sys.argv[1:] or ["1", "4"]:
        env = dict(os.environ, TORCHAIN_SCAN_UNROLL=unroll)
        r = subprocess.run(
            [sys.executable, "-c", BODY], env=env, capture_output=True, text=True,
            timeout=1200,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
        print(f"unroll={unroll}: {line[0] if line else 'FAILED: ' + r.stderr[-300:]}")


if __name__ == "__main__":
    main()
