"""Hand-fused LayerNorm (custom VJP) for the conformer trunk.

Behavioral reference: the pre-norm LayerNorms of the conformer blocks
(models/conformer.py ln(); SURVEY.md section 2 config-4 model family).
Matches flax nn.LayerNorm with use_fast_variance (mean/var over the last
axis, f32 reductions) — parity-tested in tests/test_fused_bn.py.

Why not autodiff: each conformer block runs 4 LayerNorms over [B, T, C]
as f32 islands; flax's lowering materializes the f32 upcast and autodiff
adds separate dmean/dvar elementwise chains (r3 trace: ~0.29 ms/step of
LN at trigram B=128, plus its share of 'convert' glue).  The closed-form
gradient

    w  = dy * scale
    dx = rstd * (w - mean_r(w) - xhat * mean_r(w * xhat))

needs one recompute of xhat and two row-mean reductions — two passes
total — with f32 accumulation straight off the bf16 operands.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def ln_apply(x, scale, bias, eps: float):
    """LayerNorm over the LAST axis; returns y in x.dtype."""
    y, _ = _ln_fwd(x, scale, bias, eps)
    return y


def _row_stats(x, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean),
        0.0,
    )
    rstd = jax.lax.rsqrt(var + eps)
    return xf, mean, rstd


def _ln_fwd(x, scale, bias, eps):
    xf, mean, rstd = _row_stats(x, eps)
    xhat = (xf - mean) * rstd
    y = (xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        x.dtype
    )
    return y, (x, mean, rstd, scale)


def _ln_bwd(eps, res, dy):
    x, mean, rstd, scale = res
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    xhat = (xf - mean) * rstd
    dbias = jnp.sum(dyf, axis=tuple(range(x.ndim - 1)))
    dscale = jnp.sum(dyf * xhat, axis=tuple(range(x.ndim - 1)))
    w = dyf * scale.astype(jnp.float32)
    mw = jnp.mean(w, axis=-1, keepdims=True)
    mwx = jnp.mean(w * xhat, axis=-1, keepdims=True)
    dx = (rstd * (w - mw - xhat * mwx)).astype(x.dtype)
    return dx, dscale, dbias


ln_apply.defvjp(_ln_fwd, _ln_bwd)
