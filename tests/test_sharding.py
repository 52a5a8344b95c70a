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


def test_conformer_model_parallel_matches_single_device():
    """Config-4 shape (BASELINE.json): conformer with weights sharded over
    the model axis; GSPMD must reproduce the unsharded loss."""
    import numpy as np
    import optax

    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.models import Conformer, ConformerConfig
    from torchain_tpu.ops import ChainLossOptions, DeviceDenseDenGraph
    from torchain_tpu.ops.device_graphs import DeviceSupervision
    from torchain_tpu.parallel import (
        MeshConfig,
        batch_sharding,
        make_mesh,
        replicated,
        shard_params,
    )
    from torchain_tpu.train import create_train_state, make_train_step

    corpus = synthetic_dataset(num_utts=8, num_phones=4, feat_dim=8, seed=5)
    cfg = ConformerConfig(
        num_pdfs=corpus.tree.num_pdfs, dim=64, num_layers=2, num_heads=2,
        prefinal_dim=32,
    )
    model = Conformer(cfg)
    left, right = cfg.context
    ds = ChainDataset(
        corpus.utts, corpus.tree, corpus.norm_fst, chunk_frames_out=10,
        left_context=left, right_context=right,
        sup_opts=SupervisionOptions(left_tolerance=1, right_tolerance=1),
    )
    batch = next(ds.batches(4, shuffle=False))
    den = DeviceDenseDenGraph.from_host(corpus.dense_den)
    sup = DeviceSupervision.from_host(batch.sup)
    feats = jnp.asarray(batch.feats)
    tx = optax.adam(1e-3)
    step_fn = make_train_step(
        ChainLossOptions(leaky_hmm_coefficient=0.1),
        donate=False,  # the reference state is reused for the sharded run
    )

    state = create_train_state(model, feats, tx)
    _, m_ref = step_fn(state, feats, den, sup)

    mesh = make_mesh(MeshConfig(data=2, model=4))
    with mesh:
        sharded = state.replace(
            # low threshold so the conformer FFN/attention kernels shard
            params=shard_params(mesh, state.params, min_shard_size=256),
            batch_stats=jax.device_put(state.batch_stats, replicated(mesh)),
            opt_state=jax.device_put(state.opt_state, replicated(mesh)),
        )
        feats_s = jax.device_put(feats, batch_sharding(mesh, 3))
        sup_s = jax.tree.map(
            lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim)), sup
        )
        den_s = jax.device_put(den, replicated(mesh))
        _, m_tp = step_fn(sharded, feats_s, den_s, sup_s)
    assert float(m_tp["loss"]) == pytest.approx(float(m_ref["loss"]), abs=2e-4)
    assert float(m_tp["grad_norm"]) == pytest.approx(
        float(m_ref["grad_norm"]), rel=1e-3
    )
    # confirm something actually got sharded over 'model'
    from torchain_tpu.parallel import param_sharding_rules

    specs = jax.tree.leaves(param_sharding_rules(mesh, state.params, 256))
    assert any("model" in str(s.spec) for s in specs)


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
    step_fn = make_train_step(
        ChainLossOptions(leaky_hmm_coefficient=0.1),
        donate=False,  # the reference state is reused for the sharded run
    )

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
