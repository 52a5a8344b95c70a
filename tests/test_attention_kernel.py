"""Fused relative-position attention kernel vs the einsum reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchain_tpu.ops.attention import (
    fused_relpos_attention,
    reference_relpos_attention,
)


def _inputs(B=3, T=17, H=4, dh=16, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    D = H * dh
    qkv = jnp.asarray(rng.normal(size=(B, T, 3 * D)), dtype)
    bias = jnp.asarray(rng.normal(size=(H, T, T)) * 0.3, jnp.float32)
    return qkv, bias


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_reference(dtype):
    qkv, bias = _inputs(dtype=dtype)
    scale = 0.25
    out = fused_relpos_attention(qkv, bias, 4, scale)
    ref = reference_relpos_attention(qkv, bias, 4, scale)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=tol
    )


def test_gradients_match_reference():
    qkv, bias = _inputs(T=12, dh=8)
    scale = 1.0 / np.sqrt(8)

    def loss_fused(qkv, bias):
        out = fused_relpos_attention(qkv, bias, 4, scale)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    def loss_ref(qkv, bias):
        out = reference_relpos_attention(qkv, bias, 4, scale)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    g0 = jax.grad(loss_fused, argnums=(0, 1))(qkv, bias)
    g1 = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    np.testing.assert_allclose(np.asarray(g0[0]), np.asarray(g1[0]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(g0[1]), np.asarray(g1[1]), atol=2e-5)


def test_jit_and_odd_time_length():
    # T not a multiple of any tile size; jit compile path
    qkv, bias = _inputs(B=2, T=23, H=2, dh=32, seed=1)
    f = jax.jit(lambda a, b: fused_relpos_attention(a, b, 2, 0.125))
    out = f(qkv, bias)
    ref = reference_relpos_attention(qkv, bias, 2, 0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_conformer_uses_fused_kernel_equivalently():
    """Conformer with attn_impl='fused' matches the einsum block."""
    from torchain_tpu.models import Conformer, ConformerConfig

    for impl in ("einsum", "fused"):
        cfg = ConformerConfig(
            num_pdfs=12,
            dim=32,
            num_layers=2,
            num_heads=2,
            attn_impl=impl,
        )
        model = Conformer(cfg)
        rng = np.random.default_rng(2)
        feats = jnp.asarray(rng.normal(size=(2, 40, 16)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), feats, train=False)
        out, _ = model.apply(variables, feats, train=False)
        if impl == "einsum":
            ref = np.asarray(out)
        else:
            np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
