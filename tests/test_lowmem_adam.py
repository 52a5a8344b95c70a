"""adam-lowmem (bf16-resident moments): trajectory tracks optax.adam
within bf16 storage rounding; state really is bf16."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from torchain_tpu.train.lowmem_adam import adam_lowmem, scale_by_adam_lowmem


def _quad_traj(tx, steps=50):
    params = {"w": jnp.array([1.0, -2.0, 3.0], jnp.float32),
              "b": jnp.array([[0.5, -0.5]], jnp.float32)}
    state = tx.init(params)
    traj = []

    def loss(p):
        return jnp.sum(p["w"] ** 2) + jnp.sum((p["b"] - 1.0) ** 2)

    for _ in range(steps):
        g = jax.grad(loss)(params)
        u, state = tx.update(g, state, params)
        params = optax.apply_updates(params, u)
        traj.append(float(loss(params)))
    return np.array(traj), params


def test_tracks_adam():
    ref, p_ref = _quad_traj(optax.adam(0.05))
    low, p_low = _quad_traj(adam_lowmem(0.05))
    # identical optimization behavior up to bf16 moment storage rounding
    assert np.max(np.abs(ref - low)) < 2e-2
    assert float(ref[-1]) < float(ref[0])  # both actually optimize
    assert float(low[-1]) < float(low[0])
    np.testing.assert_allclose(
        np.asarray(p_low["w"]), np.asarray(p_ref["w"]), atol=5e-2
    )


def test_state_is_bf16_and_half_size():
    params = {"w": jnp.zeros((64, 64), jnp.float32)}
    st = scale_by_adam_lowmem().init(params)
    assert st.mu["w"].dtype == jnp.bfloat16
    assert st.nu["w"].dtype == jnp.bfloat16
    ref = optax.scale_by_adam().init(params)
    lb = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves((st.mu, st.nu)))
    rb = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves((ref.mu, ref.nu)))
    assert lb * 2 == rb


def test_trainer_config_wiring():
    from torchain_tpu.train.trainer import TrainerConfig, make_optimizer

    tx = make_optimizer(TrainerConfig(optimizer="adam-lowmem"))
    params = {"w": jnp.ones((4,), jnp.float32)}
    st = tx.init(params)
    u, _ = tx.update({"w": jnp.ones((4,), jnp.float32)}, st, params)
    assert np.all(np.isfinite(np.asarray(u["w"])))
