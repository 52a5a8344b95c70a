"""Multi-chip sharding on the simulated 8-device CPU mesh (SURVEY.md
section 4): the sharded global-batch training step must match the
single-device step bit-for-bit in semantics (same loss/grads), and the
driver's dryrun entry points must compile and run."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def test_devices_available():
    assert len(jax.devices()) == 8
    assert jax.devices()[0].platform == "cpu"


def test_graft_entry_single_chip():
    import __graft_entry__ as g

    fn, args = g.entry()
    loss, objf = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(objf))


@pytest.mark.parametrize("n", [2, 8])
def test_dryrun_multichip(n):
    import __graft_entry__ as g

    g.dryrun_multichip(n)  # asserts finiteness internally


def test_sharded_loss_matches_single_device():
    """Same batch, same params: a (data=4, model=2) mesh run must produce
    the same loss and gradient norm as an unsharded run (GSPMD collectives
    must not change the math)."""
    import optax

    import __graft_entry__ as g
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

    model, cfg, den, batch_obj, example_feats = g._build_tiny(batch=8)
    tx = optax.adam(1e-3)
    step_fn = make_train_step(ChainLossOptions(leaky_hmm_coefficient=0.1))

    sup_host = DeviceSupervision.from_host(batch_obj.sup)
    feats_np = jnp.asarray(batch_obj.feats)

    # single-device reference
    state0 = create_train_state(model, example_feats, tx)
    _, m_ref = step_fn(state0, feats_np, den, sup_host)

    # sharded run with identical params
    mesh = make_mesh(MeshConfig(data=4, model=2))
    with mesh:
        state1 = create_train_state(model, example_feats, tx)
        state1 = state1.replace(
            params=shard_params(mesh, state0.params, min_shard_size=1024),
            batch_stats=jax.device_put(state0.batch_stats, replicated(mesh)),
            opt_state=jax.device_put(state0.opt_state, replicated(mesh)),
        )
        den_s = jax.device_put(den, replicated(mesh))
        feats = jax.device_put(feats_np, batch_sharding(mesh, 3))
        sup = jax.tree.map(
            lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim)), sup_host
        )
        _, m_shard = step_fn(state1, feats, den_s, sup)

    assert float(m_shard["loss"]) == pytest.approx(float(m_ref["loss"]), abs=1e-5)
    assert float(m_shard["grad_norm"]) == pytest.approx(
        float(m_ref["grad_norm"]), rel=1e-4
    )
