"""Numerator (supervision) forward-backward: log-semiring scan over the
packed per-frame arc tensors.

Behavioral reference: kaldi/src/chain/chain-numerator.cc
(`NumeratorComputation`): log-domain recursion over the time-sorted
supervision FST, gathering nnet log-probs by (frame, pdf), emitting
occupancy derivatives.  Re-designed for TPU: the frame-local packing
(graphs/supervision.py) turns Kaldi's ragged time-sorted state ranges into
dense [B, T, S, K] tables so each step is two gathers and a masked
logsumexp — no scatter, no raggedness, fully vectorized over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from torchain_tpu.ops.device_graphs import DeviceSupervision

#: scan unroll factor (env TORCHAIN_SCAN_UNROLL).  Unrolling amortizes
#: sequential-loop overhead but inflates the program; measured on TPU v5e,
#: unroll=1 wins at mini scale — revisit per config with
#: tools/profile_step.py before changing.
import os as _os

UNROLL = int(_os.environ.get("TORCHAIN_SCAN_UNROLL", "4"))


NEG_INF = -jnp.inf


def _gather_states(alpha: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """alpha [B, S], idx [B, S, K] (values in [0, S), -1 = pad) -> [B, S, K]."""
    B, S = alpha.shape
    flat = jnp.take_along_axis(
        alpha, jnp.clip(idx, 0, S - 1).reshape(B, -1), axis=1
    )
    return flat.reshape(idx.shape)


def _gather_pdfs(y_t: jnp.ndarray, pdf: jnp.ndarray) -> jnp.ndarray:
    """y_t [B, P], pdf [B, S, K] -> [B, S, K]."""
    B = y_t.shape[0]
    return jnp.take_along_axis(y_t, pdf.reshape(B, -1), axis=1).reshape(pdf.shape)


def num_forward(
    y: jnp.ndarray,  # [B, T, P]
    sup: DeviceSupervision,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (log_prob [B], alphas [T+1, B, S])."""
    B, T, P = y.shape
    S = sup.max_states
    a0 = jnp.full((B, S), NEG_INF).at[:, 0].set(0.0)

    def step(alpha, inputs):
        y_t, src, pdf, logw = inputs
        vals = jnp.where(
            src >= 0,
            _gather_states(alpha, src) + logw + _gather_pdfs(y_t, pdf),
            NEG_INF,
        )  # [B, S, K]
        nxt = jax.nn.logsumexp(vals, axis=-1)
        return nxt, nxt

    ys = jnp.swapaxes(y, 0, 1)  # [T, B, P]
    srcs = jnp.swapaxes(sup.in_src, 0, 1)  # [T, B, S, K]
    pdfs = jnp.swapaxes(sup.in_pdf, 0, 1)
    logws = jnp.swapaxes(sup.in_logw, 0, 1)
    aT, alphas = jax.lax.scan(step, a0, (ys, srcs, pdfs, logws), unroll=UNROLL)
    alphas = jnp.concatenate([a0[None], alphas], axis=0)
    log_p = jax.nn.logsumexp(aT + sup.final_logw, axis=-1)
    return log_p, alphas


def num_backward(
    y: jnp.ndarray,  # [B, T, P]
    sup: DeviceSupervision,
    log_p: jnp.ndarray,  # [B]
    alphas: jnp.ndarray,  # [T+1, B, S]
) -> jnp.ndarray:
    """Returns gamma [B, T, P] = d(log_prob)/dy (numerator occupancies).
    Sequences with non-finite log_p yield zero gamma (the caller applies the
    numeric-failure policy).

    Runs over the OUT-arc tables (the in-arc set regrouped by source slot in
    DeviceSupervision.from_host): the beta pullback is then a plain masked
    logsumexp over the arc axis — per-src-slot stabilization by
    construction (the ADVICE r1 underflow fix) with no data-dependent
    segment ops inside the scan."""
    B, T, P = y.shape
    safe_logp = jnp.where(jnp.isfinite(log_p), log_p, 0.0)
    valid = jnp.isfinite(log_p)

    def step(b, inputs):
        # b [B, S]: log beta of frame t+1 states; process frame step t
        y_t, odst, opdf, ologw, alpha_t = inputs
        mask = odst >= 0
        arc_w = jnp.where(
            mask,
            ologw + _gather_pdfs(y_t, opdf) + _gather_states(b, odst),
            NEG_INF,
        )  # out-arc weight + beta(dst): [B, S(src), K2]
        arc_post = alpha_t[:, :, None] + arc_w
        post = jnp.where(
            mask & valid[:, None, None],
            jnp.exp(arc_post - safe_logp[:, None, None]),
            0.0,
        )
        # scatter into pdf space: flat one-hot scatter-add per batch row
        flat_idx = (
            jnp.arange(B)[:, None, None] * P + opdf
        ).reshape(-1)
        gamma_t = (
            jnp.zeros((B * P,)).at[flat_idx].add(post.reshape(-1)).reshape(B, P)
        )
        # beta pullback: per-src-slot masked logsumexp over out-arcs
        nb = jax.nn.logsumexp(arc_w, axis=-1)
        return nb, gamma_t

    bT = sup.final_logw  # [B, S]
    ys = jnp.swapaxes(y, 0, 1)
    odsts = jnp.swapaxes(sup.out_dst, 0, 1)
    opdfs = jnp.swapaxes(sup.out_pdf, 0, 1)
    ologws = jnp.swapaxes(sup.out_logw, 0, 1)
    _, gammas = jax.lax.scan(
        step, bT, (ys, odsts, opdfs, ologws, alphas[:-1]), reverse=True,
        unroll=UNROLL,
    )
    return jnp.swapaxes(gammas, 0, 1)
