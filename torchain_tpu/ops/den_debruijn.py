"""Denominator forward-backward on the de Bruijn lift — gather-free.

Behavioral reference: kaldi/src/chain/chain-denominator.cc
(`DenominatorComputation`, prob space with per-frame renormalization and
leaky HMM) and chain-kernels.cu (the per-arc gather/scatter hot loop).
Re-designed for TPU via the de Bruijn quotient (graphs/debruijn.py): all
per-arc irregularity becomes dense strided tensor ops.

Per frame (prob space, Kaldi-style "arbitrary scale" renormalization):

    p0, p1  = exp(y_t gathered per trailing-symbol group)   (one-hot matmul)
    arr     = einsum('brj,rjq->bjq', a, W3)                  (shift + LM)
    u       = p0 * arr + p1 * l
    a', l'  = e_end * u, e_cont * u                          (chain topology)
    leak; kappa = sum(a' + l'); renorm; log_z += log kappa + frame max shift

The backward pass is the exact transpose with the same renormalization
constants folded in (Kaldi's BetaDash bookkeeping), emitting occupancy
gradients gamma[t, pdf] directly; chain_loss.py wires it as the custom VJP.

Unlike den_scan/den_dense this runs in PROBABILITY space: the per-frame
renorm plus a per-frame max-shift of y makes f32 safe (the same conditioning
argument as Kaldi's GPU implementation).
"""

from __future__ import annotations

import dataclasses
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.tree_util import register_dataclass

from torchain_tpu.graphs.debruijn import DeBruijnDenGraph

UNROLL = int(_os.environ.get("TORCHAIN_SCAN_UNROLL", "4"))

#: contraction precision.  The einsum contracts over sigma ~ tens of terms of
#: renormalized probabilities; DEFAULT precision rounds f32 multiplicands to
#: bf16 which broke the gamma-sums-to-1 invariant on the r1 dense path, so
#: HIGHEST stays the default (override TORCHAIN_DEBRUIJN_PRECISION to
#: "high" [3-pass bf16] or "default" [1-pass bf16]).
PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}[_os.environ.get("TORCHAIN_DEBRUIJN_PRECISION", "highest")]


NEG_BIG = -1e30  # "log zero" that exps to exactly 0.0 without inf-inf NaNs


@register_dataclass
@dataclasses.dataclass
class DeviceDeBruijnDenGraph:
    """Device twin of graphs.debruijn.DeBruijnDenGraph.

    The pdf gather runs as a strided slice + reshape/transpose of y when the
    tree's group->pdf map is affine (all ContextTree flavors; spec0/spec1
    carry (base, qstride, pstride)), falling back to a [P, G] one-hot matmul
    for arbitrary imported trees (onehot0/onehot1 are None when unused)."""

    W3: jnp.ndarray  # f32 [sigma, D, sigma]
    onehot0: jnp.ndarray | None  # f32 [P, G] or None when spec0 is affine
    onehot1: jnp.ndarray | None
    init_bnd: jnp.ndarray  # f32 [C]
    init_loop: jnp.ndarray  # f32 [C]
    sigma: int = dataclasses.field(metadata=dict(static=True))
    m: int = dataclasses.field(metadata=dict(static=True))
    tail_len: int = dataclasses.field(metadata=dict(static=True))
    num_pdfs: int = dataclasses.field(metadata=dict(static=True))
    log_continue: float = dataclasses.field(metadata=dict(static=True))
    log_end: float = dataclasses.field(metadata=dict(static=True))
    spec0: tuple | None = dataclasses.field(
        default=None, metadata=dict(static=True)
    )
    spec1: tuple | None = dataclasses.field(
        default=None, metadata=dict(static=True)
    )

    @property
    def num_contexts(self) -> int:
        return self.sigma**self.m

    @staticmethod
    def from_host(g: DeBruijnDenGraph) -> "DeviceDeBruijnDenGraph":
        P, G = g.num_pdfs, g.num_groups
        spec0, spec1 = g.affine_pdf_specs()

        def onehot(groups):
            oh = np.zeros((P, G), dtype=np.float32)
            # q=0 groups are dead (no emission enters a boundary-tailed
            # context); they select pdf 0 but carry zero mass
            oh[groups, np.arange(G)] = 1.0
            return jnp.asarray(oh)

        return DeviceDeBruijnDenGraph(
            W3=jnp.asarray(g.W3),
            onehot0=None if spec0 else onehot(g.pdf0_group),
            onehot1=None if spec1 else onehot(g.pdf1_group),
            init_bnd=jnp.asarray(g.init_bnd),
            init_loop=jnp.asarray(g.init_loop),
            sigma=int(g.sigma),
            m=int(g.m),
            tail_len=int(g.tail_len),
            num_pdfs=int(g.num_pdfs),
            log_continue=float(g.log_continue),
            log_end=float(g.log_end),
            spec0=spec0,
            spec1=spec1,
        )


def _gather_groups(y_t, spec, onehot, sigma, tail_len):
    """y_t [B, P] -> grouped log-values [B, G], G = sigma^tail_len, with
    dead (q=0) groups at NEG_BIG.  Affine specs lower to strided slices +
    reshapes (no matmul, no gather); see affine_pdf_specs."""
    B = y_t.shape[0]
    p = sigma - 1
    if spec is None:
        return jnp.dot(y_t, onehot, precision=jax.lax.Precision.HIGHEST)
    base, qs, ps = spec
    dead = jnp.full((B, 1), NEG_BIG, dtype=y_t.dtype)
    if tail_len == 1:
        if qs == 0:
            vals = jnp.broadcast_to(y_t[:, base : base + 1], (B, p))
        else:
            vals = y_t[:, base + qs : base + qs * p + 1 : qs]
        return jnp.concatenate([dead, vals], axis=1)
    if ps == 0:
        if qs == 0:
            vals = jnp.broadcast_to(y_t[:, base : base + 1], (B, p))
        else:
            vals = y_t[:, base + qs : base + qs * p + 1 : qs]  # [B, p]
        tile = jnp.broadcast_to(vals[:, None, :], (B, sigma, p))
    elif qs == sigma * ps:
        start = base + ps * sigma
        span = y_t[:, start : start + ps * p * sigma : ps]  # [B, p*sigma]
        tile = jnp.swapaxes(span.reshape(B, p, sigma), 1, 2)  # [B, prev, q]
    elif ps == sigma * qs and qs > 0:
        span = y_t[:, base : base + qs * sigma * sigma : qs]
        tile = span.reshape(B, sigma, sigma)[:, :, 1:]  # drop q=0 col
    else:
        raise NotImplementedError(f"unsupported affine pdf spec {spec}")
    deadcol = jnp.full((B, sigma, 1), NEG_BIG, dtype=y_t.dtype)
    return jnp.concatenate([deadcol, tile], axis=2).reshape(B, sigma * sigma)


def _scatter_groups(gg, spec, onehot, sigma, tail_len, P):
    """Transpose of _gather_groups: grouped values [B, G] -> pdf grads
    [B, P] (dead q=0 groups dropped)."""
    B = gg.shape[0]
    p = sigma - 1
    if spec is None:
        return jnp.dot(gg, onehot.T, precision=jax.lax.Precision.HIGHEST)
    base, qs, ps = spec
    out = jnp.zeros((B, P), dtype=gg.dtype)
    if tail_len == 1:
        vals = gg[:, 1:]
        if qs == 0:
            return out.at[:, base].add(vals.sum(axis=1))
        return out.at[:, base + qs : base + qs * p + 1 : qs].add(vals)
    tile = gg.reshape(B, sigma, sigma)
    if ps == 0:
        vals = tile[:, :, 1:].sum(axis=1)  # reduce over prev -> [B, p]
        if qs == 0:
            return out.at[:, base].add(vals.sum(axis=1))
        return out.at[:, base + qs : base + qs * p + 1 : qs].add(vals)
    if qs == sigma * ps:
        span = jnp.swapaxes(tile[:, :, 1:], 1, 2).reshape(B, p * sigma)
        start = base + ps * sigma
        return out.at[:, start : start + ps * p * sigma : ps].add(span)
    if ps == sigma * qs and qs > 0:
        span = tile.at[:, :, 0].set(0.0).reshape(B, sigma * sigma)
        return out.at[:, base : base + qs * sigma * sigma : qs].add(span)
    raise NotImplementedError(f"unsupported affine pdf spec {spec}")


def _pdf_probs(y_t: jnp.ndarray, g: DeviceDeBruijnDenGraph):
    """y_t [B, P] -> (p0, p1) [B, C] emission probs per context, and the
    per-batch max shift mt [B] folded out of the exps."""
    B = y_t.shape[0]
    C = g.num_contexts
    G = g.sigma**g.tail_len
    lead = C // G
    mt = jnp.max(y_t, axis=-1)  # [B]
    y0 = _gather_groups(y_t, g.spec0, g.onehot0, g.sigma, g.tail_len)
    y1 = _gather_groups(y_t, g.spec1, g.onehot1, g.sigma, g.tail_len)
    p0g = jnp.exp(y0 - mt[:, None])
    p1g = jnp.exp(y1 - mt[:, None])
    p0 = jnp.broadcast_to(p0g[:, None, :], (B, lead, G)).reshape(B, C)
    p1 = jnp.broadcast_to(p1g[:, None, :], (B, lead, G)).reshape(B, C)
    return p0, p1, mt


def _shift(a: jnp.ndarray, g: DeviceDeBruijnDenGraph) -> jnp.ndarray:
    """arr[b, (j, q)] = sum_r a[b, (r, j)] * W3[r, j, q] — follow every LM
    arc by dropping the oldest context symbol and appending q."""
    B, C = a.shape
    D = C // g.sigma
    arr = jnp.einsum(
        "brj,rjq->bjq", a.reshape(B, g.sigma, D), g.W3, precision=PRECISION
    )
    return arr.reshape(B, C)


def _shift_t(x: jnp.ndarray, g: DeviceDeBruijnDenGraph) -> jnp.ndarray:
    """Transpose of _shift: pull dst-side values back to src contexts."""
    B, C = x.shape
    D = C // g.sigma
    out = jnp.einsum(
        "rjq,bjq->brj", g.W3, x.reshape(B, D, g.sigma), precision=PRECISION
    )
    return out.reshape(B, C)


def _leak(a, l, g: DeviceDeBruijnDenGraph, leaky: float):
    if leaky <= 0.0:
        return a, l
    tot = jnp.sum(a, axis=-1, keepdims=True) + jnp.sum(l, axis=-1, keepdims=True)
    return a + leaky * tot * g.init_bnd[None, :], l + leaky * tot * g.init_loop[None, :]


def _leak_t(ba, bl, g: DeviceDeBruijnDenGraph, leaky: float):
    """Transpose of _leak: btilde = beta + leaky * <init, beta>."""
    if leaky <= 0.0:
        return ba, bl
    inner = jnp.sum(ba * g.init_bnd[None, :], axis=-1, keepdims=True) + jnp.sum(
        bl * g.init_loop[None, :], axis=-1, keepdims=True
    )
    return ba + leaky * inner, bl + leaky * inner


def den_forward(
    y: jnp.ndarray,  # [B, T, P] nnet log-prob outputs
    g: DeviceDeBruijnDenGraph,
    leaky: float = 0.0,
) -> tuple[jnp.ndarray, dict]:
    """Returns (log_z [B], residuals) with residuals = dict(a, l, logk):
    a/l [T, B, C] renormalized pre-step masses, logk [T, B] per-step log
    normalizers (including the frame max shift)."""
    B, T, P = y.shape
    C = g.num_contexts
    e_cont = float(np.exp(g.log_continue))
    e_end = float(np.exp(g.log_end))

    a0 = jnp.broadcast_to(g.init_bnd[None, :], (B, C))
    l0 = jnp.broadcast_to(g.init_loop[None, :], (B, C))
    a0, l0 = _leak(a0, l0, g, leaky)
    k0 = jnp.sum(a0, axis=-1) + jnp.sum(l0, axis=-1)  # [B]
    a0 = a0 / k0[:, None]
    l0 = l0 / k0[:, None]

    def step(carry, y_t):
        a, l = carry
        p0, p1, mt = _pdf_probs(y_t, g)
        arr = _shift(a, g)
        u = p0 * arr + p1 * l
        a2, l2 = e_end * u, e_cont * u
        a2, l2 = _leak(a2, l2, g, leaky)
        kt = jnp.sum(a2, axis=-1) + jnp.sum(l2, axis=-1)
        a2 = a2 / kt[:, None]
        l2 = l2 / kt[:, None]
        # logk stays in the SHIFTED system (kt was computed with p*exp(-mt));
        # occupancies are invariant under per-frame operator scaling, so the
        # backward runs entirely in the shifted system and mt enters log_z only
        return (a2, l2), (a, l, jnp.log(kt), mt)

    (aT, lT), (As, Ls, logks, mts) = jax.lax.scan(
        step, (a0, l0), jnp.swapaxes(y, 0, 1), unroll=UNROLL
    )
    log_z = jnp.log(k0) + jnp.sum(logks, axis=0) + jnp.sum(mts, axis=0)
    return log_z, dict(a=As, l=Ls, logk=logks, logk0=jnp.log(k0))


def den_backward(
    y: jnp.ndarray,  # [B, T, P]
    g: DeviceDeBruijnDenGraph,
    log_z: jnp.ndarray,  # [B] (unused; scales live in the residual logks)
    res: dict,
    leaky: float = 0.0,
) -> jnp.ndarray:
    """Returns gamma [B, T, P] = d(log Z)/dy via the transposed recursion
    with the forward's renormalizers folded in (BetaDash bookkeeping):

        bhat_T = 1/kappa_T;  bhat_t = E_t^T(L^T(bhat_{t+1})) / kappa_t
        gamma[t] = a_t * w * p_t * L^T(bhat_{t+1})
    """
    B, T, P = y.shape
    C = g.num_contexts
    G = g.sigma**g.tail_len
    lead = C // G
    e_cont = float(np.exp(g.log_continue))
    e_end = float(np.exp(g.log_end))
    As, Ls, logks, logk0 = res["a"], res["l"], res["logk"], res["logk0"]

    # kappa to divide by at reverse step t: kappa_t (init norm for t=0)
    logk_div = jnp.concatenate([logk0[None, :], logks[:-1]], axis=0)  # [T, B]
    binit = jnp.exp(-logks[-1])  # 1/kappa_T, [B]
    ba0 = jnp.broadcast_to(binit[:, None], (B, C))
    bl0 = ba0

    def step(carry, inputs):
        ba, bl = carry  # bhat_{t+1} per register
        a_t, l_t, y_t, lk = inputs
        ta, tl = _leak_t(ba, bl, g, leaky)  # btilde
        v = e_end * ta + e_cont * tl  # [B, C] combined dst-side factor
        p0, p1, _mt = _pdf_probs(y_t, g)
        arr = _shift(a_t, g)  # recompute arrivals (cheaper than storing)
        g0 = arr * p0 * v  # occupancy of phone-entry arcs, per dst context
        g1 = l_t * p1 * v  # occupancy of self-loop/exit arcs
        g0g = jnp.sum(g0.reshape(B, lead, G), axis=1)
        g1g = jnp.sum(g1.reshape(B, lead, G), axis=1)
        gamma_t = _scatter_groups(
            g0g, g.spec0, g.onehot0, g.sigma, g.tail_len, P
        ) + _scatter_groups(g1g, g.spec1, g.onehot1, g.sigma, g.tail_len, P)
        # the whole backward runs in the forward's max-shifted system
        # (shifted p's AND shifted kappas); occupancies are invariant under
        # per-frame operator scaling, so gamma is exact
        ka = jnp.exp(-lk)[:, None]
        ba2 = _shift_t(p0 * v, g) * ka
        bl2 = p1 * v * ka
        return (ba2, bl2), gamma_t

    _, gammas = jax.lax.scan(
        step,
        (ba0, bl0),
        (As, Ls, jnp.swapaxes(y, 0, 1), logk_div),
        reverse=True,
        unroll=UNROLL,
    )
    return jnp.swapaxes(gammas, 0, 1)
