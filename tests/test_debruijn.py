"""De Bruijn denominator path vs the FST path and the float64 oracle.

The de Bruijn lift (graphs/debruijn.py, ops/den_debruijn.py) claims EXACT
equality with the FST denominator (same log Z, same occupancies) whenever
the phone LM is truncation-estimated (factor-closed states).  These tests
pin that claim:

  * quotient exactness: with a delta initial distribution (start_boost=1.0)
    the lift and the FST den graph are the same distribution over paths, so
    den_debruijn must match den_scan to float tolerance — any init-split
    ambiguity is removed by the delta.
  * lift-oracle exactness: for arbitrary initial distributions, the lift is
    materialized back into an explicit sparse HMM (materialize_lift_fst) and
    den_debruijn must match the float64 oracle on it exactly.
  * chain_loss integration: finite differences through the custom VJP.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchain_tpu.graphs import (
    ChainTopology,
    ContextTree,
    PhoneLmOptions,
    SupervisionOptions,
    alignment_to_supervision_fst,
    compile_den_graph,
    compile_supervision,
    estimate_phone_lm,
    make_debruijn_den_graph,
    make_den_fst,
    make_normalization_fst,
    materialize_lift_fst,
)
from torchain_tpu.fstkit import compose
from torchain_tpu.graphs.supervision import pad_and_stack_supervisions
from torchain_tpu.ops import (
    ChainLossOptions,
    DeviceDeBruijnDenGraph,
    DeviceDenGraph,
    DeviceSupervision,
    chain_loss,
)
from torchain_tpu.ops import den_debruijn, den_scan, oracle


def _corpus(num_phones, seed=0, n=40):
    rng = np.random.default_rng(seed)
    return [
        list(map(int, rng.integers(1, num_phones + 1, size=rng.integers(3, 9))))
        for _ in range(n)
    ]


def _rand_y(B, T, P, seed=1, scale=0.8):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(B, T, P)) * scale).astype(np.float32)


CASES = [
    # (num_phones, ngram_order, context_width, extra_states)
    (3, 2, 1, 10),
    (3, 3, 1, 30),
    (3, 3, 2, 30),
    (4, 4, 2, 60),
]


@pytest.mark.parametrize("num_phones,order,ctx_w,extra", CASES)
@pytest.mark.parametrize("leaky", [0.0, 0.1])
def test_quotient_matches_fst_path(num_phones, order, ctx_w, extra, leaky):
    """Delta init (start_boost=1.0) removes init-split freedom: the lift and
    the FST den graph must agree exactly on log Z and gamma."""
    sents = _corpus(num_phones)
    lm = estimate_phone_lm(
        sents, PhoneLmOptions(ngram_order=order, num_extra_lm_states=extra)
    )
    tree = ContextTree(num_phones, context_width=ctx_w)
    den_fst = make_den_fst(lm, tree)
    graph = compile_den_graph(den_fst, tree.num_pdfs, start_boost=1.0)
    dbj = make_debruijn_den_graph(lm, tree, start_boost=1.0)

    B, T = 3, 7
    y = _rand_y(B, T, tree.num_pdfs)
    g_fst = DeviceDenGraph.from_host(graph)
    g_dbj = DeviceDeBruijnDenGraph.from_host(dbj)
    z_fst, alphas = den_scan.den_forward(jnp.asarray(y), g_fst, leaky)
    gam_fst = den_scan.den_backward(jnp.asarray(y), g_fst, z_fst, alphas, leaky)
    z_dbj, res = den_debruijn.den_forward(jnp.asarray(y), g_dbj, leaky)
    gam_dbj = den_debruijn.den_backward(jnp.asarray(y), g_dbj, z_dbj, res, leaky)
    np.testing.assert_allclose(
        np.asarray(z_dbj), np.asarray(z_fst), atol=2e-4,
        err_msg="lift log Z must equal the FST den log Z",
    )
    np.testing.assert_allclose(
        np.asarray(gam_dbj), np.asarray(gam_fst), atol=2e-4
    )


@pytest.mark.parametrize("num_phones,order,ctx_w,extra", CASES[:3])
@pytest.mark.parametrize("leaky", [0.0, 0.07])
def test_matches_materialized_lift_oracle(num_phones, order, ctx_w, extra, leaky):
    """Arbitrary (stationary + boost) init: materialize the lift into an
    explicit sparse HMM and require exact float64-oracle agreement."""
    sents = _corpus(num_phones, seed=2)
    lm = estimate_phone_lm(
        sents, PhoneLmOptions(ngram_order=order, num_extra_lm_states=extra)
    )
    tree = ContextTree(num_phones, context_width=ctx_w)
    dbj = make_debruijn_den_graph(lm, tree, start_boost=0.01)
    fst, init = materialize_lift_fst(dbj)
    graph = compile_den_graph(fst, tree.num_pdfs, initial_probs=init)

    B, T = 2, 6
    y = _rand_y(B, T, tree.num_pdfs, seed=3)
    g_dbj = DeviceDeBruijnDenGraph.from_host(dbj)
    z_dbj, res = den_debruijn.den_forward(jnp.asarray(y), g_dbj, leaky)
    gam_dbj = den_debruijn.den_backward(jnp.asarray(y), g_dbj, z_dbj, res, leaky)
    for b in range(B):
        oz, og = oracle.den_forward_backward(graph, y[b], leaky=leaky)
        assert float(z_dbj[b]) == pytest.approx(oz, abs=2e-4)
        np.testing.assert_allclose(np.asarray(gam_dbj[b]), og, atol=2e-4)


def test_gamma_rows_sum_to_one():
    sents = _corpus(4, seed=5)
    lm = estimate_phone_lm(sents, PhoneLmOptions(ngram_order=3, num_extra_lm_states=40))
    tree = ContextTree(4, context_width=2)
    dbj = make_debruijn_den_graph(lm, tree)
    g = DeviceDeBruijnDenGraph.from_host(dbj)
    y = jnp.asarray(_rand_y(3, 9, tree.num_pdfs, seed=6))
    z, res = den_debruijn.den_forward(y, g, 0.1)
    gam = den_debruijn.den_backward(y, g, z, res, 0.1)
    np.testing.assert_allclose(np.asarray(gam.sum(axis=-1)), 1.0, atol=1e-4)


def test_extreme_outputs_stay_finite():
    """The per-frame max shift must keep prob-space f32 healthy even for
    wild unnormalized nnet outputs."""
    sents = _corpus(3, seed=7)
    lm = estimate_phone_lm(sents, PhoneLmOptions(ngram_order=3, num_extra_lm_states=20))
    tree = ContextTree(3)
    dbj = make_debruijn_den_graph(lm, tree)
    g = DeviceDeBruijnDenGraph.from_host(dbj)
    y = _rand_y(2, 8, tree.num_pdfs, seed=8)
    y[:, :, 0] += 60.0
    y[:, 3:, 1] -= 60.0
    z, res = den_debruijn.den_forward(jnp.asarray(y), g, 0.1)
    gam = den_debruijn.den_backward(jnp.asarray(y), g, z, res, 0.1)
    assert np.isfinite(np.asarray(z)).all()
    assert np.isfinite(np.asarray(gam)).all()
    np.testing.assert_allclose(np.asarray(gam.sum(axis=-1)), 1.0, atol=1e-4)


class TestChainLossIntegration:
    @pytest.fixture(scope="class")
    def setup(self):
        num_phones = 3
        sents = _corpus(num_phones, seed=9)
        lm = estimate_phone_lm(
            sents, PhoneLmOptions(ngram_order=3, num_extra_lm_states=30)
        )
        tree = ContextTree(num_phones, context_width=2)
        den_fst = make_den_fst(lm, tree)
        graph = compile_den_graph(den_fst, tree.num_pdfs)
        norm = make_normalization_fst(den_fst, graph.initial_probs)
        dbj = make_debruijn_den_graph(lm, tree)
        rng = np.random.default_rng(10)
        B, T = 3, 8
        sups = []
        for b in range(B):
            sent = sents[b][:4]
            durs = [2] * len(sent)
            durs[-1] += T - sum(durs)
            fst = alignment_to_supervision_fst(
                list(zip(sent, durs)), tree,
                SupervisionOptions(left_tolerance=1, right_tolerance=1),
            )
            sups.append(compile_supervision(compose(fst, norm), tree.num_pdfs))
        batch = pad_and_stack_supervisions(sups)
        y = _rand_y(B, T, tree.num_pdfs, seed=11)
        return dict(dbj=dbj, batch=batch, y=y, B=B, T=T, P=tree.num_pdfs)

    def test_finite_diff(self, setup):
        den = DeviceDeBruijnDenGraph.from_host(setup["dbj"])
        sup = DeviceSupervision.from_host(setup["batch"])
        opts = ChainLossOptions(leaky_hmm_coefficient=0.1)
        y64 = setup["y"].astype(np.float64)

        def loss_np(y):
            return float(
                chain_loss(jnp.asarray(y, dtype=jnp.float32), None, den, sup, opts)[0]
            )

        grad = jax.grad(lambda y: chain_loss(y, None, den, sup, opts)[0])(
            jnp.asarray(setup["y"])
        )
        rng = np.random.default_rng(12)
        for _ in range(5):
            b = int(rng.integers(setup["B"]))
            t = int(rng.integers(setup["T"]))
            j = int(rng.integers(setup["P"]))
            eps = 1e-2
            yp = y64.copy(); yp[b, t, j] += eps
            ym = y64.copy(); ym[b, t, j] -= eps
            fd = (loss_np(yp) - loss_np(ym)) / (2 * eps)
            assert float(grad[b, t, j]) == pytest.approx(fd, abs=3e-4)

    def test_jit_and_loss_finite(self, setup):
        den = DeviceDeBruijnDenGraph.from_host(setup["dbj"])
        sup = DeviceSupervision.from_host(setup["batch"])
        opts = ChainLossOptions(leaky_hmm_coefficient=0.1, xent_regularize=0.1)
        y = jnp.asarray(setup["y"])
        f = jax.jit(lambda y, x: chain_loss(y, x, den, sup, opts))
        (loss, aux) = f(y, y * 0.5)
        assert np.isfinite(float(loss))
        assert float(aux["num_failed"]) == 0.0
