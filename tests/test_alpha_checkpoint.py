"""Alpha-checkpointed denominator scan (recompute-in-backward): numerical
identity with the full-residual reference at a fraction of the residual
memory (SURVEY.md section 5 long-context rebuild note)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchain_tpu.graphs import (
    ContextTree,
    PhoneLmOptions,
    compile_den_graph,
    estimate_phone_lm,
    make_den_fst,
)
from torchain_tpu.ops import DeviceDenGraph
from torchain_tpu.ops import den_scan


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    sents = [
        list(map(int, rng.integers(1, 5, size=rng.integers(3, 8))))
        for _ in range(40)
    ]
    lm = estimate_phone_lm(sents, PhoneLmOptions(ngram_order=2, num_extra_lm_states=30))
    tree = ContextTree(4, context_width=2)
    graph = compile_den_graph(make_den_fst(lm, tree), tree.num_pdfs)
    g = DeviceDenGraph.from_host(graph)
    y = jnp.asarray(rng.normal(size=(3, 20, tree.num_pdfs)).astype(np.float32))
    return g, y


@pytest.mark.parametrize("leaky", [0.0, 0.1])
@pytest.mark.parametrize("every", [4, 5, 10])
def test_checkpointed_matches_reference(setup, leaky, every):
    g, y = setup
    z_ref, alphas = den_scan.den_forward(y, g, leaky)
    gamma_ref = den_scan.den_backward(y, g, z_ref, alphas, leaky)
    z, chks = den_scan.den_forward_checkpointed(y, g, leaky, every)
    gamma = den_scan.den_backward_checkpointed(y, g, z, chks, leaky, every)
    T = y.shape[1]
    assert chks.shape[0] == T // every  # the memory claim
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gamma), np.asarray(gamma_ref), atol=1e-5
    )


def test_checkpoints_are_true_alphas(setup):
    g, y = setup
    _, alphas = den_scan.den_forward(y, g, 0.05)
    _, chks = den_scan.den_forward_checkpointed(y, g, 0.05, 5)
    np.testing.assert_allclose(
        np.asarray(chks), np.asarray(alphas[0:-1:5]), atol=1e-5
    )


def test_chain_loss_dispatches_checkpointing(setup, monkeypatch):
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.graphs.supervision import (
        alignment_to_supervision_fst,
        compile_supervision,
        pad_and_stack_supervisions,
    )
    from torchain_tpu.ops import DeviceSupervision, chain_loss

    g, y = setup
    B, T, P = y.shape
    tree = ContextTree(4, context_width=2)
    rng = np.random.default_rng(3)
    sups = []
    for _ in range(B):
        ali, left = [], T
        while left > 0:
            d = int(min(rng.integers(1, 4), left))
            ali.append((int(rng.integers(1, 5)), d))
            left -= d
        fst = alignment_to_supervision_fst(
            ali, tree, SupervisionOptions(left_tolerance=1, right_tolerance=1)
        )
        sups.append(compile_supervision(fst, tree.num_pdfs))
    sup = DeviceSupervision.from_host(pad_and_stack_supervisions(sups))

    def run():
        def f(y):
            return chain_loss(y, None, g, sup)[0]

        return jax.value_and_grad(f)(y)

    l_ref, g_ref = run()
    monkeypatch.setattr(den_scan, "CHECKPOINT_EVERY", 5)
    l_chk, g_chk = run()
    assert float(l_chk) == pytest.approx(float(l_ref), abs=1e-5)
    np.testing.assert_allclose(np.asarray(g_chk), np.asarray(g_ref), atol=1e-5)
