"""Edge cases across the stack: degenerate shapes, extreme inputs, empty
structures — the inputs a production run eventually hits."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchain_tpu.fstkit import compose
from torchain_tpu.graphs import (
    ContextTree,
    PhoneLmOptions,
    SupervisionOptions,
    alignment_to_supervision_fst,
    compile_den_graph,
    compile_supervision,
    estimate_phone_lm,
    make_den_fst,
    make_dense_den_graph,
    make_normalization_fst,
)
from torchain_tpu.ops import (
    ChainLossOptions,
    DeviceDenseDenGraph,
    DeviceSupervision,
    chain_loss,
)
from torchain_tpu.ops import oracle


@pytest.fixture(scope="module")
def tiny():
    sents = [[1, 2], [2, 1], [1, 1, 2], [2, 2, 1]]
    lm = estimate_phone_lm(sents, PhoneLmOptions(ngram_order=2))
    tree = ContextTree(2)
    den_fst = make_den_fst(lm, tree)
    graph = compile_den_graph(den_fst, tree.num_pdfs)
    dense = make_dense_den_graph(graph, pad_to=8)
    norm = make_normalization_fst(den_fst, graph.initial_probs)
    return dict(tree=tree, graph=graph, dense=dense, norm=norm)


def make_sup(tiny, ali, tol=1):
    fst = alignment_to_supervision_fst(
        ali, tiny["tree"], SupervisionOptions(left_tolerance=tol, right_tolerance=tol)
    )
    return compile_supervision(compose(fst, tiny["norm"]), tiny["tree"].num_pdfs)


class TestDegenerateShapes:
    def test_single_frame_chunk(self, tiny):
        sup = make_sup(tiny, [(1, 1)])
        assert sup.num_frames == 1
        y = np.zeros((1, tiny["tree"].num_pdfs), np.float32)
        logp, gamma = oracle.num_forward_backward(sup, y)
        assert np.isfinite(logp)
        np.testing.assert_allclose(gamma.sum(), 1.0, atol=1e-6)

    def test_batch_of_one(self, tiny):
        sup = DeviceSupervision.from_host(make_sup(tiny, [(1, 2), (2, 2)]))
        den = DeviceDenseDenGraph.from_host(tiny["dense"])
        y = jnp.zeros((1, 4, tiny["tree"].num_pdfs))
        loss, aux = chain_loss(y, None, den, sup, ChainLossOptions())
        assert np.isfinite(float(loss))

    def test_single_phone_utterance(self, tiny):
        sup = make_sup(tiny, [(2, 5)])
        y = np.zeros((5, tiny["tree"].num_pdfs), np.float32)
        logp, _ = oracle.num_forward_backward(sup, y)
        assert np.isfinite(logp)

    def test_t1_denominator(self, tiny):
        y = np.zeros((1, tiny["tree"].num_pdfs), np.float32)
        logz, gamma = oracle.den_forward_backward(tiny["graph"], y, leaky=0.1)
        assert np.isfinite(logz)
        np.testing.assert_allclose(gamma.sum(axis=1), 1.0, atol=1e-8)


class TestExtremeValues:
    def test_all_equal_outputs(self, tiny):
        den = DeviceDenseDenGraph.from_host(tiny["dense"])
        sup = DeviceSupervision.from_host(make_sup(tiny, [(1, 2), (2, 2)]))
        y = jnp.full((1, 4, tiny["tree"].num_pdfs), -3.5)
        loss, aux = chain_loss(y, None, den, sup, ChainLossOptions())
        assert np.isfinite(float(loss))
        # constant outputs: objf = num-den where emissions cancel except
        # structure; must be finite and <= ~0
        assert float(aux["objf"]) < 0.5

    def test_gradient_finite_at_extremes(self, tiny):
        den = DeviceDenseDenGraph.from_host(tiny["dense"])
        sup = DeviceSupervision.from_host(make_sup(tiny, [(1, 2), (2, 2)]))
        for scale in (80.0, -80.0):
            y = jnp.full((1, 4, tiny["tree"].num_pdfs), scale)
            g = jax.grad(
                lambda y: chain_loss(y, None, den, sup, ChainLossOptions())[0]
            )(y)
            assert bool(jnp.all(jnp.isfinite(g))), scale

    def test_zero_weight_sequence(self, tiny):
        sup_h = make_sup(tiny, [(1, 2), (2, 2)])
        sup_h.weight = 0.0
        sup = DeviceSupervision.from_host(sup_h)
        den = DeviceDenseDenGraph.from_host(tiny["dense"])
        y = jnp.zeros((1, 4, tiny["tree"].num_pdfs))
        loss, aux = chain_loss(y, None, den, sup, ChainLossOptions())
        # weight 0: the normalizer is floored, so the loss stays finite
        assert np.isfinite(float(loss))
        assert float(aux["weight"]) == 0.0


class TestSupervisionFailures:
    def test_impossible_tolerance_raises(self, tiny):
        # 3 phones in 2 frames cannot fit
        with pytest.raises(ValueError):
            alignment_to_supervision_fst(
                [(1, 1), (2, 1), (1, 0)], tiny["tree"],
                SupervisionOptions(left_tolerance=0, right_tolerance=0),
            )

    def test_unknown_phone_raises(self, tiny):
        with pytest.raises(ValueError):
            alignment_to_supervision_fst(
                [(9, 3)], tiny["tree"], SupervisionOptions()
            )
