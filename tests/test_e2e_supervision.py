"""e2e (flat-start) supervision: language checks, scoring vs brute force,
and chain_loss integration — the GenericNumeratorComputation parity tests."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchain_tpu.fstkit import Fst, compose, enumerate_paths
from torchain_tpu.graphs import (
    ContextTree,
    PhoneLmOptions,
    compile_den_graph,
    compile_e2e_supervision,
    estimate_phone_lm,
    make_den_fst,
    make_dense_den_graph,
    make_e2e_supervision_fst,
    make_normalization_fst,
    pad_and_stack_e2e,
    transcript_to_e2e_fst,
)
from torchain_tpu.ops import ChainLossOptions, DeviceDenseDenGraph, chain_loss
from torchain_tpu.ops.num_e2e import DeviceE2eSupervision, e2e_backward, e2e_forward


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    num_phones = 3
    sents = [
        list(map(int, rng.integers(1, num_phones + 1, size=rng.integers(2, 5))))
        for _ in range(25)
    ]
    lm = estimate_phone_lm(sents, PhoneLmOptions(ngram_order=2, num_extra_lm_states=50))
    tree = ContextTree(num_phones)
    den_fst = make_den_fst(lm, tree)
    graph = compile_den_graph(den_fst, tree.num_pdfs)
    dense = make_dense_den_graph(graph, pad_to=8)
    norm = make_normalization_fst(den_fst, graph.initial_probs)
    return dict(rng=rng, sents=sents, tree=tree, graph=graph, dense=dense, norm=norm)


class TestE2eFst:
    def test_language_is_all_durations(self, setup):
        tree = setup["tree"]
        fst = transcript_to_e2e_fst([1, 2], tree)
        # paths of length 3: (d1,d2) in {(1,2),(2,1)}
        free = Fst()
        free.add_states(4)
        for t in range(3):
            for pdf in range(tree.num_pdfs):
                free.add_arc(t, pdf + 1, 0.0, t + 1)
        free.set_final(3, 0.0)
        paths = {labels for labels, _ in enumerate_paths(compose(free, fst))}
        p10, p11 = tree.pdf(1, 0) + 1, tree.pdf(1, 1) + 1
        p20, p21 = tree.pdf(2, 0) + 1, tree.pdf(2, 1) + 1
        assert paths == {(p10, p11, p20), (p10, p20, p21)}

    def test_scoring_matches_brute_force(self, setup):
        tree, norm, rng = setup["tree"], setup["norm"], setup["rng"]
        phones = setup["sents"][0]
        T = len(phones) + 3
        fst = make_e2e_supervision_fst(phones, tree, norm)
        sup = compile_e2e_supervision(fst, T, tree.num_pdfs)
        dsup = DeviceE2eSupervision.from_host(sup)
        y = rng.normal(size=(1, T, tree.num_pdfs)).astype(np.float32)
        log_p, alphas = e2e_forward(jnp.asarray(y), dsup)
        # brute force: unroll over T frames via composition with free FST
        free = Fst()
        free.add_states(T + 1)
        for t in range(T):
            for pdf in range(tree.num_pdfs):
                free.add_arc(t, pdf + 1, 0.0, t + 1)
        free.set_final(T, 0.0)
        scores = []
        for labels, w in enumerate_paths(compose(free, fst)):
            scores.append(w + sum(y[0, t, lab - 1] for t, lab in enumerate(labels)))
        m = max(scores)
        expected = m + math.log(sum(math.exp(s - m) for s in scores))
        assert float(log_p[0]) == pytest.approx(expected, abs=2e-4)

    def test_gamma_finite_diff(self, setup):
        tree, norm, rng = setup["tree"], setup["norm"], setup["rng"]
        phones = setup["sents"][1]
        T = len(phones) + 2
        fst = make_e2e_supervision_fst(phones, tree, norm)
        sup = compile_e2e_supervision(fst, T, tree.num_pdfs)
        dsup = DeviceE2eSupervision.from_host(sup)
        y = (rng.normal(size=(1, T, tree.num_pdfs)) * 0.5).astype(np.float32)
        yj = jnp.asarray(y)
        log_p, alphas = e2e_forward(yj, dsup)
        gamma = e2e_backward(yj, dsup, log_p, alphas)
        np.testing.assert_allclose(
            np.asarray(gamma[0].sum(axis=-1)), 1.0, atol=1e-4
        )
        eps = 1e-2
        for t in range(T):
            for j in range(0, tree.num_pdfs, 2):
                yp = y.copy(); yp[0, t, j] += eps
                ym = y.copy(); ym[0, t, j] -= eps
                fd = (
                    float(e2e_forward(jnp.asarray(yp), dsup)[0][0])
                    - float(e2e_forward(jnp.asarray(ym), dsup)[0][0])
                ) / (2 * eps)
                assert float(gamma[0, t, j]) == pytest.approx(fd, abs=5e-3)


class TestE2eChainLoss:
    def test_loss_and_training_signal(self, setup):
        tree, norm, dense, rng = setup["tree"], setup["norm"], setup["dense"], setup["rng"]
        T = 8
        sups = []
        for b in range(3):
            phones = setup["sents"][b][:3]
            fst = make_e2e_supervision_fst(phones, tree, norm)
            sups.append(compile_e2e_supervision(fst, T, tree.num_pdfs))
        batch = pad_and_stack_e2e(sups)
        dsup = DeviceE2eSupervision.from_host(batch)
        den = DeviceDenseDenGraph.from_host(dense)
        opts = ChainLossOptions(leaky_hmm_coefficient=0.1)
        y = jnp.zeros((3, T, tree.num_pdfs))
        step = jax.jit(
            jax.value_and_grad(lambda y: chain_loss(y, None, den, dsup, opts)[0], has_aux=False)
        )
        losses = []
        for _ in range(60):
            loss, g = step(y)
            y = y - 3.0 * g
            losses.append(float(loss))
        assert losses[-1] < losses[0] - 0.3  # objf improves without alignments
        assert np.isfinite(losses[-1])

def test_e2e_supervision_cached_across_epochs(monkeypatch):
    from torchain_tpu.data.loader import E2eChainDataset
    from torchain_tpu.data import synthetic_dataset

    corpus = synthetic_dataset(num_utts=8, num_phones=4, feat_dim=8, seed=0,
                               utt_frames_out=(20, 30))
    ds = E2eChainDataset(corpus.utts, corpus.tree, corpus.norm_fst,
                         chunk_frames_out=12, left_context=2, right_context=2)
    calls = {"n": 0}
    real = ds._compile

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(ds, "_compile", counting)
    b0 = list(ds.batches(2, epoch=0))
    n_first = calls["n"]
    assert n_first > 0
    b1 = list(ds.batches(2, epoch=1))
    assert calls["n"] == n_first  # warm epoch: zero recompiles
    assert len(b0) == len(b1)
    # determinism: same epoch replays identical batches
    b0b = list(ds.batches(2, epoch=0))
    for x, y in zip(b0, b0b):
        import numpy as np

        np.testing.assert_array_equal(x.feats, y.feats)
        np.testing.assert_array_equal(x.sup.in_src, y.sup.in_src)


class TestResidentE2eKernels:
    """The e2e resident Pallas kernels (ops/num_resident e2e variants)
    must match the lax.scan path; interpret mode on CPU."""

    def test_matches_scan(self, setup, monkeypatch):
        tree, norm, rng = setup["tree"], setup["norm"], setup["rng"]
        T = 8
        sups = []
        for b in range(3):
            phones = setup["sents"][b][:3]
            fst = make_e2e_supervision_fst(phones, tree, norm)
            sups.append(compile_e2e_supervision(fst, T, tree.num_pdfs))
        batch = pad_and_stack_e2e(sups)
        dsup = DeviceE2eSupervision.from_host(batch)
        y = jnp.asarray(
            rng.normal(size=(3, T, tree.num_pdfs)).astype(np.float32)
        )
        monkeypatch.setenv("TORCHAIN_NUM_RESIDENT", "0")
        lp0, al0 = e2e_forward(y, dsup)
        g0 = e2e_backward(y, dsup, lp0, al0)
        monkeypatch.setenv("TORCHAIN_NUM_RESIDENT", "force")
        lp1, al1 = e2e_forward(y, dsup)
        g1 = e2e_backward(y, dsup, lp1, al1)
        np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp0), atol=1e-5)
        a0_, a1_ = np.asarray(al0), np.asarray(al1)
        assert (np.isfinite(a0_) == np.isfinite(a1_)).all()
        fin = np.isfinite(a0_)
        np.testing.assert_allclose(a1_[fin], a0_[fin], atol=1e-5)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-5)

    def test_invalid_sequence_zeroes_gamma(self, setup, monkeypatch):
        tree, norm, rng = setup["tree"], setup["norm"], setup["rng"]
        T = 6
        fst = make_e2e_supervision_fst(setup["sents"][0][:2], tree, norm)
        sup = compile_e2e_supervision(fst, T, tree.num_pdfs)
        batch = pad_and_stack_e2e([sup, sup])
        dsup = DeviceE2eSupervision.from_host(batch)
        y = jnp.asarray(
            rng.normal(size=(2, T, tree.num_pdfs)).astype(np.float32)
        )
        monkeypatch.setenv("TORCHAIN_NUM_RESIDENT", "force")
        lp, al = e2e_forward(y, dsup)
        bad = lp.at[0].set(-jnp.inf)
        g = e2e_backward(y, dsup, bad, al)
        assert np.all(np.asarray(g)[0] == 0.0)
        assert np.isfinite(np.asarray(g)).all()
