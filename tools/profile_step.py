"""Breakdown profiling of the chain train step on the current backend.

Remote TPU compiles are expensive here, so this times only two programs:
the full train step and an encoder-only step (loss replaced by a mean),
attributing the difference to the chain loss (num + den fwd-bwd).
Run on the TPU box: python tools/profile_step.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.models import TDNNF, TdnnfConfig
    from torchain_tpu.ops import ChainLossOptions, DeviceDenseDenGraph, chain_loss
    from torchain_tpu.ops.device_graphs import DeviceSupervision
    from torchain_tpu.train import create_train_state, make_train_step

    B, T_OUT, FEAT = 64, 50, 40
    corpus = synthetic_dataset(
        num_utts=2 * B, num_phones=40, feat_dim=FEAT,
        utt_frames_out=(T_OUT, T_OUT + 10), seed=0,
    )
    d = corpus.dense_den
    print(f"den graph: S={d.real_orig} E={d.real_exp} (padded {d.num_orig}x{d.num_exp}) P={d.num_pdfs}", flush=True)
    cfg = TdnnfConfig(num_pdfs=corpus.tree.num_pdfs, hidden_dim=768,
                      bottleneck_dim=96, prefinal_dim=256, num_layers=9)
    model = TDNNF(cfg)
    left, right = cfg.context
    dataset = ChainDataset(corpus.utts, corpus.tree, corpus.norm_fst,
                           chunk_frames_out=T_OUT, left_context=left, right_context=right,
                           sup_opts=SupervisionOptions(left_tolerance=2, right_tolerance=2))
    batch = next(dataset.batches(B, shuffle=False))
    print(f"sup: S={batch.sup.max_states} K={batch.sup.max_arcs} T={batch.sup.num_frames} B={batch.feats.shape[0]}", flush=True)
    den = DeviceDenseDenGraph.from_host(d)
    sup = DeviceSupervision.from_host(batch.sup)
    feats = jnp.asarray(batch.feats)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    state = create_train_state(model, feats, tx)
    opts = ChainLossOptions(l2_regularize=5e-4, leaky_hmm_coefficient=0.1, xent_regularize=0.1)

    B_actual = batch.feats.shape[0]
    audio_s = B_actual * batch.sup.num_frames * 3 * 0.010

    # 1. full train step
    step_fn = make_train_step(opts, donate=False)  # timeit replays state
    t_full = timeit(lambda s: step_fn(s, feats, den, sup)[0], state, iters=20)
    print(f"full train step   : {t_full*1e3:8.3f} ms ({audio_s/t_full:10.0f} audio-s/s)", flush=True)

    # 2. encoder-only step (same structure, dummy loss)
    @jax.jit
    def enc_step(state, feats):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (chain_out, xent_out), upd = state.apply_fn(
                variables, feats, train=True, mutable=["batch_stats"]
            )
            return jnp.mean(chain_out) + jnp.mean(xent_out), upd["batch_stats"]
        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, bs)

    t_enc = timeit(lambda s: enc_step(s, feats), state, iters=20)
    print(f"encoder-only step : {t_enc*1e3:8.3f} ms ({audio_s/t_enc:10.0f} audio-s/s)", flush=True)
    print(f"loss share        : {100*(t_full-t_enc)/t_full:6.1f}%  ({(t_full-t_enc)*1e3:.3f} ms)", flush=True)

    flops_den = 3 * 2 * B_actual * d.num_orig * d.num_exp * T_OUT * 2
    print(f"~den TFLOP/step: {flops_den/1e12:.3f}; V={d.num_orig*d.num_exp*4/1e6:.1f} MB; "
          f"V HBM re-reads/step (fwd+bwd): {2*T_OUT*d.num_orig*d.num_exp*4/1e9:.2f} GB "
          f"(~{2*T_OUT*d.num_orig*d.num_exp*4/819e9*1e3:.2f} ms at 819 GB/s)", flush=True)


if __name__ == "__main__":
    main()
