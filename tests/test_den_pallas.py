"""Pallas fused denominator kernels vs the den_dense reference (interpret
mode on CPU; the real-TPU path is exercised by bench/profile runs)."""

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
    make_dense_den_graph,
)
from torchain_tpu.ops import DeviceDenseDenGraph, den_dense
from torchain_tpu.ops import den_pallas


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    sents = [list(map(int, rng.integers(1, 4, size=rng.integers(3, 8)))) for _ in range(30)]
    lm = estimate_phone_lm(sents, PhoneLmOptions(ngram_order=2, num_extra_lm_states=20))
    tree = ContextTree(3)
    graph = compile_den_graph(make_den_fst(lm, tree), tree.num_pdfs)
    dense = make_dense_den_graph(graph, pad_to=8)
    g = DeviceDenseDenGraph.from_host(dense)
    y = jnp.asarray(rng.normal(size=(4, 7, tree.num_pdfs)).astype(np.float32))
    return g, y


@pytest.mark.parametrize("leaky", [0.0, 0.1])
def test_pallas_matches_dense(setup, leaky):
    g, y = setup
    z_ref, res_ref = den_dense.den_forward(y, g, leaky)
    gamma_ref = den_dense.den_backward(g, res_ref, leaky)
    z_pl, res_pl = den_pallas.den_forward(y, g, leaky, interpret=True)
    gamma_pl = den_pallas.den_backward(g, res_pl, leaky, interpret=True)
    np.testing.assert_allclose(np.asarray(z_pl), np.asarray(z_ref), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(gamma_pl), np.asarray(gamma_ref), atol=2e-4
    )


def test_fits_vmem_estimates(setup):
    g, y = setup
    assert den_pallas.fits_vmem(g, B=4, T=7)
    assert not den_pallas.fits_vmem(g, B=4096, T=1000)
