"""CNN-TDNN model family: conv front-end geometry (context contract,
height subsampling), parity of the conv stack against a per-frame numpy
reference, and chain training."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torchain_tpu.models import CNNTDNN, CnnTdnnConfig


def _small_cfg(**kw):
    base = dict(
        num_pdfs=30,
        feat_dim=12,
        conv_filters=(8, 16),
        conv_freq_strides=(1, 2),
        hidden_dim=48,
        bottleneck_dim=8,
        prefinal_dim=16,
        num_tdnnf_layers=3,
    )
    base.update(kw)
    return CnnTdnnConfig(**base)


def test_context_contract_and_shapes():
    cfg = _small_cfg()
    # conv: 2 blocks x (3//2) = 2 frames per side at input rate, then the
    # tdnnf geometry (1,1), (1,3), (3,1): left 2+1+1+3*3=13, right
    # 2+1+3+3*3=15
    assert cfg.conv_context == 2
    assert cfg.context == (13, 15)
    assert cfg.conv_out_dim == 6 * 16  # 12 -> 12 -> ceil(12/2)=6 bins
    left, right = cfg.context
    T_out, B = 5, 2
    x = jnp.zeros((B, T_out * 3 + left + right, cfg.feat_dim), jnp.float32)
    model = CNNTDNN(cfg)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    (chain, xent), _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert chain.shape == (B, T_out, cfg.num_pdfs)
    assert xent.shape == (B, T_out, cfg.num_pdfs)


def test_conv_front_matches_numpy_reference():
    """One conv block (eval mode, identity BN stats) against an explicit
    per-output-position numpy convolution."""
    cfg = _small_cfg(conv_filters=(5,), conv_freq_strides=(1,),
                     num_tdnnf_layers=1)
    B, T = 2, 9
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, cfg.feat_dim)), jnp.float32)
    model = CNNTDNN(cfg)
    variables = model.init(jax.random.PRNGKey(1), x, train=True)
    kernel = np.asarray(variables["params"]["conv0"]["kernel"])  # [kt,kf,1,F]
    bias = np.asarray(variables["params"]["conv0"]["bias"])
    xn = np.asarray(x)[..., None]  # [B,T,F,1]
    kt, kf = cfg.time_kernel, cfg.freq_kernel
    pt, pf = 0, (kf - 1) // 2
    xp = np.pad(xn, ((0, 0), (pt, pt), (pf, pf), (0, 0)))
    T_o, F_o = T - kt + 1, cfg.feat_dim
    want = np.zeros((B, T_o, F_o, 5), np.float32)
    for t in range(T_o):
        for f in range(F_o):
            patch = xp[:, t : t + kt, f : f + kf, :]  # [B,kt,kf,1]
            want[:, t, f] = (
                patch.reshape(B, -1) @ kernel.reshape(-1, 5) + bias
            )
    # reach inside: apply only conv0 via a sliced module
    import flax.linen as nn

    conv = nn.Conv(
        5, kernel_size=(kt, kf), strides=(1, 1),
        padding=((0, 0), (pf, pf)),
    )
    got = np.asarray(
        conv.apply({"params": variables["params"]["conv0"]}, xn)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bf16_trunk_finite():
    cfg = _small_cfg(dtype=jnp.bfloat16)
    left, right = cfg.context
    x = jax.random.normal(
        jax.random.PRNGKey(2), (2, 4 * 3 + left + right, cfg.feat_dim)
    )
    model = CNNTDNN(cfg)
    variables = model.init(jax.random.PRNGKey(3), x, train=True)
    (chain, xent), _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert chain.dtype == jnp.float32  # heads always emit f32
    assert bool(jnp.isfinite(chain).all())


def test_chain_training_decreases_loss():
    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.ops import ChainLossOptions, DeviceDenseDenGraph
    from torchain_tpu.ops.device_graphs import DeviceSupervision
    from torchain_tpu.train import create_train_state, make_train_step

    cfg = _small_cfg(feat_dim=10)
    left, right = cfg.context
    corpus = synthetic_dataset(
        num_utts=8, num_phones=6, feat_dim=10,
        utt_frames_out=(8, 12), seed=0,
    )
    cfg = _small_cfg(feat_dim=10, num_pdfs=corpus.tree.num_pdfs)
    dataset = ChainDataset(
        corpus.utts, corpus.tree, corpus.norm_fst,
        chunk_frames_out=6, left_context=left, right_context=right,
        sup_opts=SupervisionOptions(left_tolerance=2, right_tolerance=2),
    )
    batch = next(dataset.batches(4, shuffle=False))
    den = DeviceDenseDenGraph.from_host(corpus.dense_den)
    sup = DeviceSupervision.from_host(batch.sup)
    feats = jnp.asarray(batch.feats)
    model = CNNTDNN(cfg)
    tx = optax.adam(2e-3)
    state = create_train_state(model, feats, tx)
    step_fn = make_train_step(ChainLossOptions(l2_regularize=1e-4))
    losses = []
    for _ in range(8):
        state, metrics = step_fn(state, feats, den, sup)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_cli_accepts_cnn_tdnn(tmp_path):
    from torchain_tpu.cli.train import main as train_main

    res = train_main(
        [
            "--synthetic",
            "--model", "cnn-tdnn",
            "--num-utts", "8",
            "--num-phones", "5",
            "--hidden-dim", "32",
            "--bottleneck-dim", "8",
            "--num-layers", "2",
            "--chunk-frames", "6",
            "--batch-size", "4",
            "--epochs", "1",
            "--checkpoint-dir", str(tmp_path),
        ]
    )
    assert res["steps"] > 0
    assert np.isfinite(res["objf"] if "objf" in res else res["loss"])
