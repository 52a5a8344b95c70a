"""Hand-fused train-mode batch normalization (forward 2 passes, backward
2 passes) for the acoustic trunks.

Behavioral reference: the batchnorm of Kaldi's TDNN-F / prefinal blocks
([K] nnet-normalize-component.cc BatchNormComponent; SURVEY.md section
2.1 example recipe).  Numerically it matches flax nn.BatchNorm with
use_fast_variance (var = E[x^2] - E[x]^2, f32 reductions, negative-var
clip) — parity-tested in tests/test_fused_bn.py.

Why not autodiff: on the v5e the flax module's backward materializes an
f32 upcast of the [T, B, C] activation plus separate dmean/dvar chains
(r3 device trace: ~0.57 ms/step of BN stat reduces + converts at
trigram B=128).  The custom VJP uses the closed-form batchnorm gradient

    dx = g * rstd * (dy - mean(dy) - xhat * mean(dy * xhat))

which needs exactly two extra passes over the activation (one fused
reduce producing mean(dy) and mean(dy*xhat), one elementwise pass for
dx), with every reduction accumulating f32 directly from the bf16
operands — no materialized f32 copy of x in either direction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_train(x, scale, bias, eps: float):
    """Batch-normalize `x` over all axes but the last, with batch stats.

    Returns (y, mean, var): y in x.dtype, stats in f32 (for the caller's
    running-average update — their cotangents are dropped, as the running
    stats are not part of the training objective)."""
    out, _ = _bn_train_fwd(x, scale, bias, eps)
    return out


def _moments(x):
    axes = tuple(range(x.ndim - 1))
    n = 1
    for a in axes:
        n *= x.shape[a]
    # one fused reduction pass: sum and sum-of-squares accumulate f32
    # directly from the (possibly bf16) operand
    s = jnp.sum(x, axis=axes, dtype=jnp.float32)
    sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axes, dtype=jnp.float32)
    mean = s / n
    var = jnp.maximum(sq / n - jnp.square(mean), 0.0)  # flax negative clip
    return mean, var, n


def _bn_train_fwd(x, scale, bias, eps):
    mean, var, _n = _moments(x)
    rstd = jax.lax.rsqrt(var + eps)
    sf32 = scale.astype(jnp.float32)
    # y = (x - mean) * rstd * scale + bias, folded to one multiply-add:
    # a = rstd * scale (per channel), b = bias - mean * a
    a = (rstd * sf32).astype(x.dtype)
    b = (bias.astype(jnp.float32) - mean * rstd * sf32).astype(x.dtype)
    y = x * a + b
    return (y, mean, var), (x, mean, rstd, sf32)


def _bn_train_bwd(eps, res, cts):
    x, mean, rstd, sf32 = res
    dy, _dmean, _dvar = cts  # running-stat cotangents are structurally zero
    axes = tuple(range(x.ndim - 1))
    n = 1
    for a in axes:
        n *= x.shape[a]
    dyf = dy.astype(jnp.float32) if dy.dtype != jnp.float32 else dy
    # pass 1 (fused reduces): sum(dy), sum(dy * x) — dscale is recovered
    # from these without materializing xhat
    s_dy = jnp.sum(dy, axis=axes, dtype=jnp.float32)
    s_dyx = jnp.sum(
        dyf * x.astype(jnp.float32), axis=axes, dtype=jnp.float32
    )
    dbias = s_dy
    dscale = (s_dyx - mean * s_dy) * rstd
    # pass 2: dx = scale * rstd * (dy - s_dy/n - xhat * dscale/n) with the
    # per-channel constants pre-folded so the pass is one multiply-add
    # over x and dy:  dx = A * dy + B * x + C
    g = sf32 * rstd
    A = g
    B = -g * rstd * dscale / n
    C = g * (mean * rstd * dscale - s_dy) / n
    dx = (
        A.astype(x.dtype) * dy
        + B.astype(x.dtype) * x
        + C.astype(x.dtype)
    )
    return dx, dscale.astype(jnp.float32), dbias.astype(jnp.float32)


bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)


# ---------------------------------------------------------------------------
# Fused  bias -> relu -> batchnorm [-> + bypass]  (the whole TDNN-F layer
# tail as ONE custom-VJP op).  The device trace at the trigram B=128
# headline shows the separate bias+relu pass at 0.40 ms/step and the
# bypass add at ~0.17 (tdnn.py:251/:331, BENCH_NOTES round 4): both are
# full HBM read+write passes over the [T, B, 768] activation that this
# op folds into the batchnorm's two passes — relu(x + cb) is recomputed
# on the fly inside both the stats reduce and the apply/backward passes
# (compute-free next to the bandwidth), so the intermediate h tensor is
# never materialized and only x is saved for the backward.
# ---------------------------------------------------------------------------


def _brb_moments_apply(x, cb, scale, bias, eps):
    cbx = cb.astype(x.dtype)
    h = jnp.maximum(x + cbx, 0)
    mean, var, _n = _moments(h)
    rstd = jax.lax.rsqrt(var + eps)
    sf32 = scale.astype(jnp.float32)
    a = (rstd * sf32).astype(x.dtype)
    b = (bias.astype(jnp.float32) - mean * rstd * sf32).astype(x.dtype)
    return h * a + b, mean, var, rstd, sf32


def _brb_bwd_core(x, cb, mean, rstd, sf32, dy, eps):
    """Shared backward: (dx, dcb, dscale, dbias)."""
    axes = tuple(range(x.ndim - 1))
    n = 1
    for a in axes:
        n *= x.shape[a]
    xp = x + cb.astype(x.dtype)
    h = jnp.maximum(xp, 0)
    dyf = dy.astype(jnp.float32) if dy.dtype != jnp.float32 else dy
    s_dy = jnp.sum(dy, axis=axes, dtype=jnp.float32)
    s_dyh = jnp.sum(dyf * h.astype(jnp.float32), axis=axes, dtype=jnp.float32)
    dbias = s_dy
    dscale = (s_dyh - mean * s_dy) * rstd
    g = sf32 * rstd
    A = g
    B = -g * rstd * dscale / n
    C = g * (mean * rstd * dscale - s_dy) / n
    dh = (
        A.astype(x.dtype) * dy
        + B.astype(x.dtype) * h
        + C.astype(x.dtype)
    )
    dx = jnp.where(xp > 0, dh, jnp.zeros((), x.dtype))
    dcb = jnp.sum(dx, axis=axes, dtype=jnp.float32)
    return dx, dcb, dscale.astype(jnp.float32), dbias.astype(jnp.float32)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def brb_train(x, cb, scale, bias, eps: float):
    """y = batchnorm(relu(x + cb)); returns (y, mean, var) like bn_train."""
    out, _ = _brb_train_fwd(x, cb, scale, bias, eps)
    return out


def _brb_train_fwd(x, cb, scale, bias, eps):
    y, mean, var, rstd, sf32 = _brb_moments_apply(x, cb, scale, bias, eps)
    return (y, mean, var), (x, cb, mean, rstd, sf32)


def _brb_train_bwd(eps, res, cts):
    x, cb, mean, rstd, sf32 = res
    dy, _dm, _dv = cts
    return _brb_bwd_core(x, cb, mean, rstd, sf32, dy, eps)


brb_train.defvjp(_brb_train_fwd, _brb_train_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def brb_bypass_train(x, cb, scale, bias, byp, eps: float, bypass_scale: float):
    """y = batchnorm(relu(x + cb)) + bypass_scale * byp; (y, mean, var)."""
    out, _ = _brb_byp_fwd(x, cb, scale, bias, byp, eps, bypass_scale)
    return out


def _brb_byp_fwd(x, cb, scale, bias, byp, eps, bypass_scale):
    y, mean, var, rstd, sf32 = _brb_moments_apply(x, cb, scale, bias, eps)
    y = y + jnp.asarray(bypass_scale, y.dtype) * byp.astype(y.dtype)
    return (y, mean, var), (x, cb, mean, rstd, sf32)


def _brb_byp_bwd(eps, bypass_scale, res, cts):
    x, cb, mean, rstd, sf32 = res
    dy, _dm, _dv = cts
    dx, dcb, dscale, dbias = _brb_bwd_core(x, cb, mean, rstd, sf32, dy, eps)
    dbyp = jnp.asarray(bypass_scale, dy.dtype) * dy
    return dx, dcb, dscale, dbias, dbyp


brb_bypass_train.defvjp(_brb_byp_fwd, _brb_byp_bwd)
