"""TDNN-LSTM model family: LSTMP cell correctness (vs a naive per-frame
reference), delay-phase batching, context contract, and chain training."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torchain_tpu.models import TDNNLSTM, Lstmp, TdnnLstmConfig


def _naive_lstmp(params, x, delay):
    """Per-frame python reference of the Kaldi LSTMP recurrence
    (frame t reads state from frame t - delay; zero initial state)."""
    w_x = np.asarray(params["w_x"], np.float32)
    w_r = np.asarray(params["w_r"], np.float32)
    bias = np.asarray(params["bias"], np.float32)
    w_ic = np.asarray(params["w_ic"], np.float32)
    w_fc = np.asarray(params["w_fc"], np.float32)
    w_oc = np.asarray(params["w_oc"], np.float32)
    w_rm = np.asarray(params["w_rm"], np.float32)
    T, B, _ = x.shape
    cell = w_ic.shape[0]
    rec = w_r.shape[0]
    proj = w_rm.shape[1]

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    cs = np.zeros((T, B, cell), np.float32)
    rs = np.zeros((T, B, rec), np.float32)
    out = np.zeros((T, B, proj), np.float32)
    for t in range(T):
        c_prev = cs[t - delay] if t >= delay else np.zeros((B, cell))
        r_prev = rs[t - delay] if t >= delay else np.zeros((B, rec))
        gates = x[t] @ w_x + r_prev @ w_r + bias
        gi, gf, gg, go = np.split(gates, 4, axis=-1)
        i = sig(gi + w_ic * c_prev)
        f = sig(gf + w_fc * c_prev)
        c = f * c_prev + i * np.tanh(gg)
        o = sig(go + w_oc * c)
        m = o * np.tanh(c)
        rp = m @ w_rm
        cs[t], rs[t], out[t] = c, rp[:, :rec], rp
    return out


@pytest.mark.parametrize("delay,T", [(1, 7), (2, 8), (3, 7)])
def test_lstmp_matches_naive_reference(delay, T):
    B, C = 3, 10
    mod = Lstmp(cell_dim=12, rec_proj_dim=5, nonrec_proj_dim=4, delay=delay)
    x = jax.random.normal(jax.random.PRNGKey(0), (T, B, C), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(1), x)
    got = np.asarray(mod.apply(variables, x))
    want = _naive_lstmp(variables["params"], np.asarray(x), delay)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_lstmp_delay_equals_interleaved_chains():
    """delay=d must equal running delay=1 on each phase subsequence."""
    B, C, T, d = 2, 8, 9, 3
    mod_d = Lstmp(cell_dim=8, rec_proj_dim=4, nonrec_proj_dim=4, delay=d)
    mod_1 = Lstmp(cell_dim=8, rec_proj_dim=4, nonrec_proj_dim=4, delay=1)
    x = jax.random.normal(jax.random.PRNGKey(2), (T, B, C), jnp.float32)
    variables = mod_d.init(jax.random.PRNGKey(3), x)
    full = np.asarray(mod_d.apply(variables, x))
    for p in range(d):
        sub = np.asarray(mod_1.apply(variables, x[p::d]))
        np.testing.assert_allclose(full[p::d], sub, rtol=1e-5, atol=1e-6)


def test_context_contract_and_shapes():
    cfg = TdnnLstmConfig(num_pdfs=30, hidden_dim=32, cell_dim=24,
                         rec_proj_dim=8, nonrec_proj_dim=8, prefinal_dim=16)
    left, right = cfg.context
    fsf = cfg.frame_subsampling_factor
    assert fsf == 3
    B, T_out = 2, 11
    feats = jnp.zeros((B, T_out * fsf + left + right, 13))
    model = TDNNLSTM(cfg)
    variables = model.init(jax.random.PRNGKey(0), feats)
    chain, xent = model.apply(variables, feats, train=False)
    assert chain.shape == (B, T_out, cfg.num_pdfs)
    assert xent.shape == (B, T_out, cfg.num_pdfs)
    assert chain.dtype == jnp.float32


def test_warmup_frames_only_extend_left_context():
    a = TdnnLstmConfig(num_pdfs=10, warmup_frames=0)
    b = TdnnLstmConfig(num_pdfs=10, warmup_frames=6)
    la, ra = a.context
    lb, rb = b.context
    assert rb == ra
    assert lb == la + 6 * b.frame_subsampling_factor


def test_bf16_trunk_finite():
    cfg = TdnnLstmConfig(num_pdfs=20, hidden_dim=32, cell_dim=16,
                         rec_proj_dim=8, nonrec_proj_dim=8,
                         prefinal_dim=16, dtype=jnp.bfloat16,
                         warmup_frames=2)
    left, right = cfg.context
    feats = jax.random.normal(
        jax.random.PRNGKey(1), (2, 8 * 3 + left + right, 13), jnp.float32
    )
    model = TDNNLSTM(cfg)
    variables = model.init(jax.random.PRNGKey(0), feats)
    chain, _ = model.apply(variables, feats, train=False)
    assert bool(jnp.all(jnp.isfinite(chain)))


def test_chain_training_decreases_loss():
    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.ops import ChainLossOptions, auto_den_graph
    from torchain_tpu.ops.device_graphs import DeviceSupervision
    from torchain_tpu.train import create_train_state, make_train_step

    corpus = synthetic_dataset(
        num_utts=8, num_phones=8, feat_dim=12, utt_frames_out=(14, 18), seed=0
    )
    cfg = TdnnLstmConfig(
        num_pdfs=corpus.tree.num_pdfs, hidden_dim=24, cell_dim=16,
        rec_proj_dim=8, nonrec_proj_dim=8, prefinal_dim=16, warmup_frames=2,
    )
    left, right = cfg.context
    ds = ChainDataset(
        corpus.utts, corpus.tree, corpus.norm_fst, chunk_frames_out=12,
        left_context=left, right_context=right,
        sup_opts=SupervisionOptions(left_tolerance=2, right_tolerance=2),
    )
    batch = next(ds.batches(4, shuffle=False))
    den = auto_den_graph(corpus.den_graph, batch_hint=4)
    sup = DeviceSupervision.from_host(batch.sup)
    feats = jnp.asarray(batch.feats)
    step = make_train_step(
        ChainLossOptions(l2_regularize=5e-4, leaky_hmm_coefficient=0.1,
                         xent_regularize=0.1)
    )
    state = create_train_state(TDNNLSTM(cfg), feats, optax.adam(2e-3))
    losses = []
    for _ in range(6):
        state, m = step(state, feats, den, sup)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def _naive_opgru(params, x, delay):
    """Per-frame python reference of the OPGRU recurrence."""
    w_x = np.asarray(params["w_x"], np.float32)
    u_s = np.asarray(params["u_s"], np.float32)
    bias = np.asarray(params["bias"], np.float32)
    u_h = np.asarray(params["u_h"], np.float32)
    w_rm = np.asarray(params["w_rm"], np.float32)
    T, B, _ = x.shape
    cell = u_h.shape[0]
    rec = u_s.shape[0]
    proj = w_rm.shape[1]

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    cs = np.zeros((T, B, cell), np.float32)
    ss = np.zeros((T, B, rec), np.float32)
    out = np.zeros((T, B, proj), np.float32)
    for t in range(T):
        c_prev = cs[t - delay] if t >= delay else np.zeros((B, cell))
        s_prev = ss[t - delay] if t >= delay else np.zeros((B, rec))
        gz, go, gh = np.split(x[t] @ w_x + bias, 3, axis=-1)
        zz, oo = np.split(s_prev @ u_s, 2, axis=-1)
        z = sig(gz + zz)
        o = sig(go + oo)
        h = np.tanh(gh + u_h * c_prev)
        c = (1.0 - z) * h + z * c_prev
        m = c * o
        rp = m @ w_rm
        cs[t], ss[t], out[t] = c, rp[:, :rec], rp
    return out


@pytest.mark.parametrize("delay,T", [(1, 7), (3, 8)])
def test_opgru_matches_naive_reference(delay, T):
    from torchain_tpu.models import Opgru

    B, C = 3, 10
    mod = Opgru(cell_dim=12, rec_proj_dim=5, nonrec_proj_dim=4, delay=delay)
    x = jax.random.normal(jax.random.PRNGKey(4), (T, B, C), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(5), x)
    # zero-init u_h/u_s makes the recurrence trivial; randomize them
    params = dict(variables["params"])
    params["u_h"] = jax.random.normal(jax.random.PRNGKey(6), params["u_h"].shape) * 0.5
    variables = {"params": params}
    got = np.asarray(mod.apply(variables, x))
    want = _naive_opgru(params, np.asarray(x), delay)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_opgru_ladder_trains():
    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.ops import ChainLossOptions, auto_den_graph
    from torchain_tpu.ops.device_graphs import DeviceSupervision
    from torchain_tpu.train import create_train_state, make_train_step

    corpus = synthetic_dataset(
        num_utts=8, num_phones=8, feat_dim=12, utt_frames_out=(14, 18), seed=0
    )
    cfg = TdnnLstmConfig(
        num_pdfs=corpus.tree.num_pdfs, hidden_dim=24, cell_dim=16,
        rec_proj_dim=8, nonrec_proj_dim=8, prefinal_dim=16, warmup_frames=2,
        layers=(
            ("tdnn", 5, 1, 1), ("tdnn", 3, 1, 3), ("gru", 1),
            ("tdnn", 3, 3, 1), ("gru", 1),
        ),
    )
    left, right = cfg.context
    ds = ChainDataset(
        corpus.utts, corpus.tree, corpus.norm_fst, chunk_frames_out=12,
        left_context=left, right_context=right,
        sup_opts=SupervisionOptions(left_tolerance=2, right_tolerance=2),
    )
    batch = next(ds.batches(4, shuffle=False))
    den = auto_den_graph(corpus.den_graph, batch_hint=4)
    sup = DeviceSupervision.from_host(batch.sup)
    feats = jnp.asarray(batch.feats)
    step = make_train_step(
        ChainLossOptions(l2_regularize=5e-4, leaky_hmm_coefficient=0.1,
                         xent_regularize=0.1)
    )
    state = create_train_state(TDNNLSTM(cfg), feats, optax.adam(2e-3))
    losses = []
    for _ in range(6):
        state, m = step(state, feats, den, sup)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
