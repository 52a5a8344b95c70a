"""Breakdown profiling of the chain train step on the current backend.

Times each stage separately (encoder fwd, loss fwd, full fwd+bwd+update,
den fwd-bwd alone) so optimization effort goes where the time is.
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
    from torchain_tpu.ops import den_dense
    from torchain_tpu.ops.device_graphs import DeviceSupervision
    from torchain_tpu.train import create_train_state, make_train_step

    B, T_OUT, FEAT = 64, 50, 40
    corpus = synthetic_dataset(
        num_utts=2 * B, num_phones=40, feat_dim=FEAT,
        utt_frames_out=(T_OUT, T_OUT + 10), seed=0,
    )
    d = corpus.dense_den
    print(f"den graph: S={d.real_orig} E={d.real_exp} (padded {d.num_orig}x{d.num_exp}) P={d.num_pdfs}")
    cfg = TdnnfConfig(num_pdfs=corpus.tree.num_pdfs, hidden_dim=768,
                      bottleneck_dim=96, prefinal_dim=256, num_layers=9)
    model = TDNNF(cfg)
    left, right = cfg.context
    dataset = ChainDataset(corpus.utts, corpus.tree, corpus.norm_fst,
                           chunk_frames_out=T_OUT, left_context=left, right_context=right,
                           sup_opts=SupervisionOptions(left_tolerance=2, right_tolerance=2))
    batch = next(dataset.batches(B, shuffle=False))
    print(f"sup: S={batch.sup.max_states} K={batch.sup.max_arcs} T={batch.sup.num_frames} B={batch.feats.shape[0]}")
    den = DeviceDenseDenGraph.from_host(d)
    sup = DeviceSupervision.from_host(batch.sup)
    feats = jnp.asarray(batch.feats)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    state = create_train_state(model, feats, tx)
    opts = ChainLossOptions(l2_regularize=5e-4, leaky_hmm_coefficient=0.1, xent_regularize=0.1)

    B_actual = batch.feats.shape[0]
    audio_s = B_actual * batch.sup.num_frames * 3 * 0.010

    # 1. encoder forward only
    @jax.jit
    def enc_fwd(params, bs, feats):
        vars_ = {"params": params, "batch_stats": bs}
        return model.apply(vars_, feats, train=False)

    t = timeit(enc_fwd, state.params, state.batch_stats, feats)
    print(f"encoder fwd           : {t*1e3:8.3f} ms  ({audio_s/t:10.0f} audio-s/s)")

    chain_out, xent_out = enc_fwd(state.params, state.batch_stats, feats)

    # 2. den fwd only / fwd+bwd
    @jax.jit
    def den_fwd(y):
        return den_dense.den_forward(y, den, 0.1)[0]

    t = timeit(den_fwd, chain_out)
    print(f"den fwd               : {t*1e3:8.3f} ms  ({audio_s/t:10.0f} audio-s/s)")

    @jax.jit
    def den_fwdbwd(y):
        logz, res = den_dense.den_forward(y, den, 0.1)
        return logz, den_dense.den_backward(den, res, 0.1)

    t = timeit(den_fwdbwd, chain_out)
    print(f"den fwd+bwd           : {t*1e3:8.3f} ms  ({audio_s/t:10.0f} audio-s/s)")

    # 3. full loss fwd+grad (num + den + l2 + xent)
    @jax.jit
    def loss_grad(y, x):
        return jax.grad(lambda y: chain_loss(y, x, den, sup, opts)[0])(y)

    t = timeit(loss_grad, chain_out, xent_out)
    print(f"loss fwd+grad         : {t*1e3:8.3f} ms  ({audio_s/t:10.0f} audio-s/s)")

    # 4. full train step
    step_fn = make_train_step(opts)
    t = timeit(lambda s: step_fn(s, feats, den, sup)[0], state, iters=10)
    print(f"full train step       : {t*1e3:8.3f} ms  ({audio_s/t:10.0f} audio-s/s)")

    # roofline context
    flops_enc = 0
    # rough: 9 tdnnf layers, kernel-2 convs both factors
    T_in = feats.shape[1]
    flops_enc = 9 * (2 * 768 * 96 + 2 * 96 * 768) * 2 * T_in * B_actual * 3  # fwd+bwd
    flops_den = 3 * 2 * B_actual * d.num_orig * d.num_exp * T_OUT * 2
    print(f"~encoder TFLOP/step: {flops_enc/1e12:.3f}  ~den TFLOP/step: {flops_den/1e12:.3f}")
    print(f"V bytes: {d.num_orig*d.num_exp*4/1e6:.1f} MB; per-step HBM traffic for V re-reads (fwd+bwd): {2*T_OUT*d.num_orig*d.num_exp*4/1e9:.2f} GB")


if __name__ == "__main__":
    main()
