"""Frame-shift augmentation + dropout-schedule tests (Kaldi recipe
behaviors: nnet3-chain-copy-egs --frame-shift and
--trainer.dropout-schedule with continuous per-dim dropout)."""

import jax
import jax.numpy as jnp
import numpy as np

from torchain_tpu.train.trainer import parse_dropout_schedule


# -- dropout schedule parsing ------------------------------------------------


def test_schedule_kaldi_example():
    f = parse_dropout_schedule("0,0@0.20,0.5@0.50,0")
    assert f(0.0) == 0.0
    assert f(0.10) == 0.0
    assert abs(f(0.35) - 0.25) < 1e-9  # linear ramp 0.2 -> 0.5
    assert abs(f(0.50) - 0.5) < 1e-9
    assert abs(f(0.75) - 0.25) < 1e-9  # linear decay to 0 at 1.0
    assert f(1.0) == 0.0
    assert f(2.0) == 0.0  # clipped


def test_schedule_constant_and_two_point():
    assert parse_dropout_schedule("0.3")(0.5) == 0.3
    f = parse_dropout_schedule("0.0,0.5")
    assert abs(f(0.5) - 0.25) < 1e-9


def test_schedule_rejects_unsorted_and_bare_middle():
    import pytest

    with pytest.raises(ValueError):
        parse_dropout_schedule("0,0.5@0.9,0.2@0.1,0")
    with pytest.raises(ValueError):
        parse_dropout_schedule("0,0.5,0.2@0.5,0")


# -- continuous dropout in the models ----------------------------------------


def _tiny_tdnnf():
    from torchain_tpu.models import TDNNF, TdnnfConfig

    cfg = TdnnfConfig(
        num_pdfs=10, hidden_dim=16, bottleneck_dim=8, prefinal_dim=8,
        num_layers=2,
    )
    left, right = cfg.context
    t_in = 6 * cfg.frame_subsampling_factor + left + right
    feats = jnp.asarray(np.random.default_rng(0).normal(size=(2, t_in, 5)), jnp.float32)
    model = TDNNF(cfg)
    variables = model.init(jax.random.PRNGKey(0), feats, train=False)
    return model, variables, feats


def test_dropout_rate_zero_is_identity():
    model, variables, feats = _tiny_tdnnf()
    base, _ = model.apply(
        variables, feats, train=True, mutable=["batch_stats"]
    )
    out, _ = model.apply(
        variables,
        feats,
        train=True,
        mutable=["batch_stats"],
        dropout_rate=jnp.float32(0.0),
        rngs={"dropout": jax.random.PRNGKey(7)},
    )
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(base[0]), rtol=1e-6, atol=1e-6
    )


def test_dropout_perturbs_and_eval_is_clean():
    model, variables, feats = _tiny_tdnnf()
    out, _ = model.apply(
        variables,
        feats,
        train=True,
        mutable=["batch_stats"],
        dropout_rate=jnp.float32(0.5),
        rngs={"dropout": jax.random.PRNGKey(7)},
    )
    base, _ = model.apply(variables, feats, train=True, mutable=["batch_stats"])
    assert not np.allclose(np.asarray(out[0]), np.asarray(base[0]))
    # eval (train=False) ignores dropout entirely, even with a rate+rng
    ev1 = model.apply(variables, feats, train=False)
    ev2 = model.apply(
        variables,
        feats,
        train=False,
        dropout_rate=jnp.float32(0.5),
        rngs={"dropout": jax.random.PRNGKey(7)},
    )
    np.testing.assert_array_equal(np.asarray(ev1[0]), np.asarray(ev2[0]))


def test_dropout_mask_expectation_one():
    """Continuous dropout noise has mean 1: averaging outputs over many
    rngs must approach the no-dropout output (no train/eval rescale)."""
    from torchain_tpu.models.tdnn import continuous_dropout
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, rate):
            return continuous_dropout(self, x, rate, train=True)

    x = jnp.ones((1, 1, 64), jnp.float32) * 3.0
    m = M()
    # split one key (NOT consecutive integer seeds, whose streams showed
    # visible per-channel correlation through flax's rng folding)
    keys = jax.random.split(jax.random.PRNGKey(42), 600)
    outs = [m.apply({}, x, 0.5, rngs={"dropout": k}) for k in keys]
    mean = np.mean([np.asarray(o) for o in outs], axis=0)
    np.testing.assert_allclose(mean, 3.0, rtol=0.06)
    # and every draw stays within the [1-2p, 1+2p] envelope
    assert all(
        (np.asarray(o) >= 3.0 * (1 - 2 * 0.5) - 1e-6).all()
        and (np.asarray(o) <= 3.0 * (1 + 2 * 0.5) + 1e-6).all()
        for o in outs
    )


# -- frame shift in the loader -----------------------------------------------


def _dataset(shift_utts=None):
    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.graphs import SupervisionOptions

    corpus = synthetic_dataset(
        num_utts=4, num_phones=5, feat_dim=6, utt_frames_out=(20, 24), seed=0
    )
    return corpus, ChainDataset(
        corpus.utts,
        corpus.tree,
        corpus.norm_fst,
        chunk_frames_out=8,
        left_context=3,
        right_context=3,
        sup_opts=SupervisionOptions(left_tolerance=1, right_tolerance=1),
    )


def test_frame_shift_shifts_features_not_supervision():
    corpus, ds = _dataset()
    b0 = next(ds.batches(2, shuffle=False))
    ds.frame_shift = 1
    b1 = next(ds.batches(2, shuffle=False))
    assert b0.feats.shape == b1.feats.shape
    # interior frames shift by exactly one input frame
    np.testing.assert_array_equal(b0.feats[:, 2:-2], b1.feats[:, 1:-3])
    # supervision identical (the shift is sub-subsampling)
    np.testing.assert_array_equal(
        b0.sup.row_starts if hasattr(b0.sup, "row_starts") else 0,
        b1.sup.row_starts if hasattr(b1.sup, "row_starts") else 0,
    )
    assert b0.sup.num_frames == b1.sup.num_frames


def test_trainer_cycles_frame_shift():
    import numpy as np

    from torchain_tpu.models import TDNN, TdnnConfig
    from torchain_tpu.ops import ChainLossOptions
    from torchain_tpu.ops.device_graphs import DeviceDenseDenGraph
    from torchain_tpu.train import Trainer, TrainerConfig

    corpus, ds = _dataset()
    cfg = TdnnConfig(
        num_pdfs=corpus.tree.num_pdfs, hidden_dim=16, prefinal_dim=8,
        layers=((3, 1, 1), (3, 1, 3)),
    )
    left, right = cfg.context
    ds.left_context, ds.right_context = left, right
    den = DeviceDenseDenGraph.from_host(corpus.dense_den)
    tcfg = TrainerConfig(
        lr=1e-3, num_epochs=2, batch_size=2, log_every=100,
        semi_ortho_every=0, frame_shift_cycle=True,
        dropout_schedule="0,0.2@0.5,0",
        loss=ChainLossOptions(
            l2_regularize=1e-4, leaky_hmm_coefficient=0.1, xent_regularize=0.1
        ),
    )
    t_in = 8 * 3 + left + right
    trainer = Trainer(model=TDNN(cfg), den_device=den, cfg=tcfg,
                      example_feats=np.zeros((2, t_in, 6), np.float32))
    shifts_seen = []
    orig_chunk = ds._chunk_feats

    def spy(utt, c0, t_out):
        shifts_seen.append(ds.frame_shift)
        return orig_chunk(utt, c0, t_out)

    ds._chunk_feats = spy
    res = trainer.fit(ds, log_fn=lambda s: None)
    assert res.tot_weight > 0
    assert set(shifts_seen) == {0, 1}, set(shifts_seen)  # epoch 0 -> 0, epoch 1 -> 1
    assert ds.frame_shift == 0  # reset after fit
