"""Parity tests for the fused conformer FFN (ops/fused_ffn.py).

The Pallas kernels run in interpret mode on the CPU test mesh; the
reference is the plain-XLA formulation (ffn_reference), itself matched
against the stock nn.Dense chain through the conformer-level test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchain_tpu.ops import fused_ffn


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def _setup(rng, n, d, f):
    xn = _rand(rng, n, d)
    res = _rand(rng, n, d)
    w1 = _rand(rng, d, f) * 0.3
    b1 = _rand(rng, f) * 0.1
    w2 = _rand(rng, f, d) * 0.3
    b2 = _rand(rng, d) * 0.1
    return xn, res, w1, b1, w2, b2


@pytest.mark.parametrize("n", [48, 1040])
def test_kernel_matches_reference_fwd_bwd(n):
    rng = np.random.default_rng(0)
    d, f = 128, 256
    xn, res, w1, b1, w2, b2 = _setup(rng, n, d, f)
    g = _rand(rng, n, d)

    def loss_ref(*args):
        return jnp.sum(fused_ffn.ffn_reference(*args, 0.5) * g)

    def loss_fused(*args):
        return jnp.sum(fused_ffn._ffn_fused(*args, 0.5, True) * g)

    args = (xn, res, w1, b1, w2, b2)
    y_ref = fused_ffn.ffn_reference(*args, 0.5)
    y_fused = fused_ffn._ffn_fused(*args, 0.5, True)
    np.testing.assert_allclose(y_fused, y_ref, rtol=2e-5, atol=2e-5)

    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    for a, b, name in zip(
        g_fused, g_ref, ["xn", "res", "w1", "b1", "w2", "b2"]
    ):
        np.testing.assert_allclose(
            a, b, rtol=2e-4, atol=2e-4, err_msg=f"grad {name}"
        )


def test_kernel_bf16_close():
    rng = np.random.default_rng(1)
    d, f = 128, 256
    xn, res, w1, b1, w2, b2 = _setup(rng, 64, d, f)
    xnb, resb = xn.astype(jnp.bfloat16), res.astype(jnp.bfloat16)
    y_ref = fused_ffn.ffn_reference(xnb, resb, w1, b1, w2, b2, 0.5)
    y_fused = fused_ffn._ffn_fused(xnb, resb, w1, b1, w2, b2, 0.5, True)
    np.testing.assert_allclose(
        np.asarray(y_fused, np.float32),
        np.asarray(y_ref, np.float32),
        rtol=2e-2,
        atol=2e-2,
    )


def test_reference_matches_dense_chain():
    """ffn_reference == the stock nn.Dense formulation in f32."""
    import flax.linen as nn

    rng = np.random.default_rng(2)
    d, f = 96, 192  # deliberately non-MXU-aligned: reference path
    xn, res, w1, b1, w2, b2 = _setup(rng, 32, d, f)
    h = jnp.dot(xn, w1) + b1
    h = nn.swish(h)
    dense = res + 0.5 * (jnp.dot(h, w2) + b2)
    out = fused_ffn.ffn_apply(xn, res, w1, b1, w2, b2, 0.5)
    np.testing.assert_allclose(out, dense, rtol=1e-5, atol=1e-5)


def test_conformer_ffn_impls_match():
    """Conformer forward with ffn_impl fused vs dense: same params tree,
    matching outputs (CPU: fused dispatches to the XLA reference)."""
    from torchain_tpu.models import Conformer, ConformerConfig

    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.standard_normal((2, 34, 40)), jnp.float32)
    outs = {}
    trees = {}
    for impl in ("fused", "dense"):
        cfg = ConformerConfig(
            num_pdfs=60, dim=128, num_layers=2, num_heads=4,
            attn_impl="einsum", ffn_impl=impl,
        )
        model = Conformer(cfg)
        params = model.init(jax.random.PRNGKey(0), feats)
        chain, xent = model.apply(params, feats, train=False)
        outs[impl] = (np.asarray(chain), np.asarray(xent))
        trees[impl] = jax.tree.map(lambda x: x.shape, params)
    assert trees["fused"] == trees["dense"], "param trees must interchange"
    np.testing.assert_allclose(
        outs["fused"][0], outs["dense"][0], rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        outs["fused"][1], outs["dense"][1], rtol=2e-4, atol=2e-4
    )
