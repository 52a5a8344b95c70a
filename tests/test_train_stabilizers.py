"""Max-change update clipping + backstitch training tests (Kaldi
--trainer.max-param-change / max-change and
--trainer.backstitch-training-scale behaviors)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from torchain_tpu.train.trainer import max_change


# -- max-change ---------------------------------------------------------------


def test_max_change_per_component_caps_each_leaf():
    tx = max_change(per_component=1.0, global_change=0.0)
    updates = {
        "big": jnp.full((4, 4), 10.0),  # norm 40
        "small": jnp.full((2,), 0.1),  # norm ~0.14, untouched
    }
    out, _ = tx.update(updates, tx.init(updates))
    np.testing.assert_allclose(float(jnp.linalg.norm(out["big"])), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["small"]), 0.1, rtol=1e-6)
    # direction preserved
    assert np.allclose(
        np.asarray(out["big"]) / np.linalg.norm(out["big"]),
        np.asarray(updates["big"]) / np.linalg.norm(updates["big"]),
    )


def test_max_change_global_caps_total_norm():
    tx = max_change(per_component=0.0, global_change=2.0)
    updates = {"a": jnp.full((3,), 3.0), "b": jnp.full((3,), 4.0)}  # global ~8.66
    out, _ = tx.update(updates, tx.init(updates))
    np.testing.assert_allclose(float(optax.global_norm(out)), 2.0, rtol=1e-6)
    # relative magnitudes preserved
    r_in = float(jnp.linalg.norm(updates["a"]) / jnp.linalg.norm(updates["b"]))
    r_out = float(jnp.linalg.norm(out["a"]) / jnp.linalg.norm(out["b"]))
    np.testing.assert_allclose(r_out, r_in, rtol=1e-6)


def test_max_change_noop_below_caps():
    tx = max_change(per_component=100.0, global_change=100.0)
    updates = {"a": jnp.asarray([1.0, -2.0])}
    out, _ = tx.update(updates, tx.init(updates))
    np.testing.assert_array_equal(np.asarray(out["a"]), np.asarray(updates["a"]))


def test_max_change_bounds_actual_parameter_motion():
    """End-to-end through make_optimizer: even with a huge LR, no step
    moves the params by more than max_param_change."""
    from torchain_tpu.train.trainer import TrainerConfig, make_optimizer

    cfg = TrainerConfig(
        lr=100.0, optimizer="sgd", momentum=0.0, grad_clip=0.0,
        max_change_per_component=0.75, max_param_change=2.0,
    )
    tx = make_optimizer(cfg)
    params = {"w": jnp.zeros((8, 8)), "b": jnp.zeros((8,))}
    state = tx.init(params)
    g = jax.tree.map(lambda p: jnp.ones_like(p) * 50.0, params)
    upd, state = tx.update(g, state, params)
    assert float(optax.global_norm(upd)) <= 2.0 + 1e-5
    for leaf in jax.tree.leaves(upd):
        assert float(jnp.linalg.norm(leaf)) <= 0.75 + 1e-5


# -- backstitch ---------------------------------------------------------------


def _quadratic_setup():
    """Simple strongly-convex problem with an exactly known SGD update."""
    a = jnp.asarray(np.diag([1.0, 4.0]), jnp.float32)

    def loss(p):
        return 0.5 * p["w"] @ a @ p["w"]

    return a, loss


def test_backstitch_matches_hand_computation():
    """theta1 = theta + alpha*lr*g(theta); theta2 = theta1 - (1+alpha)*lr*g(theta1)
    for plain SGD — the step must reproduce this exactly."""
    from torchain_tpu.graphs import SupervisionOptions  # noqa: F401 (env parity)

    a, loss = _quadratic_setup()
    lr, alpha = 0.1, 0.3
    tx = optax.sgd(lr)
    p0 = {"w": jnp.asarray([1.0, 1.0], jnp.float32)}
    opt0 = tx.init(p0)

    # hand computation
    g0 = np.asarray(a) @ np.array([1.0, 1.0])
    t1 = np.array([1.0, 1.0]) + alpha * lr * g0
    g1 = np.asarray(a) @ t1
    t2 = t1 - (1 + alpha) * lr * g1

    # the same algebra through the step's update-scaling formulation
    grad_fn = jax.grad(loss)
    u1, opt1 = tx.update(grad_fn(p0), opt0, p0)
    p1 = optax.apply_updates(p0, jax.tree.map(lambda u: -alpha * u, u1))
    u2, _ = tx.update(grad_fn(p1), opt1, p1)
    p2 = optax.apply_updates(p1, jax.tree.map(lambda u: (1 + alpha) * u, u2))
    np.testing.assert_allclose(np.asarray(p2["w"]), t2, rtol=1e-6)


def test_backstitch_trainer_integration():
    """TrainerConfig(backstitch_scale=0.3) trains with finite, improving
    objf and interval-gating picks the right step function."""
    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.models import TDNN, TdnnConfig
    from torchain_tpu.ops import ChainLossOptions
    from torchain_tpu.ops.device_graphs import DeviceDenseDenGraph
    from torchain_tpu.train import Trainer, TrainerConfig

    corpus = synthetic_dataset(
        num_utts=12, num_phones=5, feat_dim=10, utt_frames_out=(24, 30), seed=0
    )
    cfg = TdnnConfig(
        num_pdfs=corpus.tree.num_pdfs, hidden_dim=16, prefinal_dim=8,
        layers=((3, 1, 1), (3, 1, 3)),
    )
    left, right = cfg.context
    ds = ChainDataset(
        corpus.utts, corpus.tree, corpus.norm_fst, chunk_frames_out=8,
        left_context=left, right_context=right,
        sup_opts=SupervisionOptions(left_tolerance=1, right_tolerance=1),
    )
    den = DeviceDenseDenGraph.from_host(corpus.dense_den)
    tcfg = TrainerConfig(
        lr=5e-3, momentum=0.0, optimizer="sgd", num_epochs=3, batch_size=4,
        log_every=100, semi_ortho_every=0,
        backstitch_scale=0.3, backstitch_interval=2,
        max_param_change=2.0, max_change_per_component=0.75,
        loss=ChainLossOptions(
            l2_regularize=1e-4, leaky_hmm_coefficient=0.1, xent_regularize=0.1
        ),
    )
    t_in = 8 * 3 + left + right
    trainer = Trainer(TDNN(cfg), den, tcfg, np.zeros((2, t_in, 10), np.float32))
    assert trainer.backstitch_step is not None
    res = trainer.fit(ds, log_fn=lambda s: None)
    assert res.tot_weight > 0
    assert trainer.results.tot_failed == 0
    assert np.isfinite(res.objf)


def test_backstitch_and_dropout_are_exclusive():
    import pytest

    from torchain_tpu.models import TDNN, TdnnConfig
    from torchain_tpu.train import Trainer, TrainerConfig

    cfg = TdnnConfig(num_pdfs=6, hidden_dim=8, prefinal_dim=8,
                     layers=((3, 1, 1), (3, 1, 3)))
    left, right = cfg.context
    t_in = 8 * 3 + left + right
    with pytest.raises(ValueError, match="mutually"):
        Trainer(
            TDNN(cfg),
            None,
            TrainerConfig(backstitch_scale=0.3, dropout_schedule="0,0.5"),
            np.zeros((2, t_in, 4), np.float32),
        )
