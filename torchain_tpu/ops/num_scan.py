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


def beta_pullback(
    arc_w: jnp.ndarray,  # [B, S, K] in-arc weights incl. beta(dst); NEG_INF pad
    src: jnp.ndarray,  # int32 [B, S, K] source-state ids (-1 = pad)
    S: int,
) -> jnp.ndarray:
    """Per-src-state logsumexp of in-arc weights: [B, S, K] -> beta [B, S].

    Stabilizes with a PER-SRC-SLOT max (segment_max over flattened (b, src)
    ids), not a frame-global max: with a global max, any src state whose
    best arc is more than ~88 nats below the frame maximum would underflow
    to -inf in float32, silently zeroing its gamma contributions at earlier
    frames (matters for cyclic e2e graphs and long chunks).  Mirrors
    den_scan._seg_logsumexp.
    """
    B = arc_w.shape[0]
    mask = src >= 0
    flat_w = jnp.where(mask, arc_w, NEG_INF).reshape(-1)
    src_idx = (
        jnp.arange(B)[:, None, None] * S + jnp.clip(src, 0, S - 1)
    ).reshape(-1)
    m = jax.ops.segment_max(flat_w, src_idx, num_segments=B * S)  # [B*S]
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    contrib = jnp.where(mask.reshape(-1), jnp.exp(flat_w - m_safe[src_idx]), 0.0)
    acc = jax.ops.segment_sum(contrib, src_idx, num_segments=B * S)
    nb = jnp.where(acc > 0, jnp.log(jnp.maximum(acc, 1e-300)) + m_safe, NEG_INF)
    return nb.reshape(B, S)


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
    numeric-failure policy)."""
    B, T, P = y.shape
    S, K = sup.max_states, sup.max_arcs
    safe_logp = jnp.where(jnp.isfinite(log_p), log_p, 0.0)
    valid = jnp.isfinite(log_p)

    def step(b, inputs):
        # b [B, S]: log beta of frame t+1 states; process frame step t
        y_t, src, pdf, logw, alpha_t = inputs
        mask = src >= 0
        arc_w = jnp.where(
            mask, logw + _gather_pdfs(y_t, pdf) + b[:, :, None], NEG_INF
        )  # in-arc weight + beta(dst): [B, S(dst), K]
        arc_post = _gather_states(alpha_t, src) + arc_w
        post = jnp.where(
            mask & valid[:, None, None],
            jnp.exp(arc_post - safe_logp[:, None, None]),
            0.0,
        )
        # scatter into pdf space: flat one-hot scatter-add per batch row
        flat_idx = (
            jnp.arange(B)[:, None, None] * P + pdf
        ).reshape(-1)
        gamma_t = (
            jnp.zeros((B * P,)).at[flat_idx].add(post.reshape(-1)).reshape(B, P)
        )
        # pull beta back to frame-t states: logsumexp over arcs grouped by
        # src slot, stabilized per-slot (see beta_pullback)
        nb = beta_pullback(arc_w, src, S)
        return nb, gamma_t

    bT = sup.final_logw  # [B, S]
    ys = jnp.swapaxes(y, 0, 1)
    srcs = jnp.swapaxes(sup.in_src, 0, 1)
    pdfs = jnp.swapaxes(sup.in_pdf, 0, 1)
    logws = jnp.swapaxes(sup.in_logw, 0, 1)
    _, gammas = jax.lax.scan(
        step, bT, (ys, srcs, pdfs, logws, alphas[:-1]), reverse=True,
        unroll=UNROLL,
    )
    return jnp.swapaxes(gammas, 0, 1)
