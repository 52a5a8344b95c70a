"""Denominator forward-backward, v1: log-semiring `lax.scan` over sparse
arcs.

Behavioral reference: kaldi/src/chain/chain-denominator.cc
(`DenominatorComputation::Forward/Backward`) and the per-arc CUDA kernels in
chain-kernels.cu — re-expressed as a single traced scan in the LOG semiring
(equivalent objective to Kaldi's prob-space-with-renormalization; different
conditioning strategy, see SURVEY.md section 7 hard-part 2).  This is the
exactness/reference path: fully general (any arc structure), numerically
bulletproof, used by tests and by graphs too irregular for the dense MXU
path in den_dense.py.

Gradients are NOT taken by autodiff through the scan: the occupancy
identity d(log Z)/dy[t,j] = gamma[t,j] means the backward pass IS the beta
recursion, wired up via jax.custom_vjp in chain_loss.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from torchain_tpu.ops.device_graphs import DeviceDenGraph

#: scan unroll factor (env TORCHAIN_SCAN_UNROLL).  Unrolling amortizes
#: sequential-loop overhead but inflates the program; measured on TPU v5e,
#: unroll=1 wins at mini scale — revisit per config with
#: tools/profile_step.py before changing.
import os as _os

UNROLL = int(_os.environ.get("TORCHAIN_SCAN_UNROLL", "4"))


NEG_INF = -jnp.inf


def _seg_logsumexp(
    vals: jnp.ndarray, seg: jnp.ndarray, num_seg: int, is_sorted: bool = False
) -> jnp.ndarray:
    """Segment logsumexp along axis 0.  vals [A, B] -> [num_seg, B]."""
    m = jax.ops.segment_max(
        vals, seg, num_segments=num_seg, indices_are_sorted=is_sorted
    )  # [S, B]
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jax.ops.segment_sum(
        jnp.exp(vals - m_safe[seg]), seg, num_segments=num_seg,
        indices_are_sorted=is_sorted,
    )
    return jnp.where(s > 0, jnp.log(jnp.maximum(s, 1e-300)) + m_safe, NEG_INF)


def _leak(log_alpha: jnp.ndarray, log_init: jnp.ndarray, leaky: float) -> jnp.ndarray:
    """alpha' = alpha + leaky * init * sum(alpha)   (log space, [B, S])."""
    if leaky <= 0.0:
        return log_alpha
    tot = jax.nn.logsumexp(log_alpha, axis=-1, keepdims=True)
    return jnp.logaddexp(log_alpha, jnp.log(leaky) + log_init[None, :] + tot)


def den_forward(
    y: jnp.ndarray,  # [B, T, P] nnet log-prob outputs
    g: DeviceDenGraph,
    leaky: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (log_z [B], alphas [T+1, B, S]) where alphas are post-leak."""
    B = y.shape[0]
    a0 = _leak(jnp.broadcast_to(g.log_init, (B, g.num_states)), g.log_init, leaky)

    def step(alpha, y_t):
        # arc values [A, B]: alpha'[src] + w + y_t[pdf]
        arc = alpha[:, g.in_src].T + g.in_logw[:, None] + y_t[:, g.in_pdf].T
        nxt = _seg_logsumexp(arc, g.in_dst, g.num_states, is_sorted=True).T
        nxt = _leak(nxt, g.log_init, leaky)
        return nxt, nxt

    aT, alphas = jax.lax.scan(step, a0, jnp.swapaxes(y, 0, 1), unroll=UNROLL)
    alphas = jnp.concatenate([a0[None], alphas], axis=0)
    log_z = jax.nn.logsumexp(aT, axis=-1)
    return log_z, alphas


def den_backward(
    y: jnp.ndarray,  # [B, T, P]
    g: DeviceDenGraph,
    log_z: jnp.ndarray,  # [B]
    alphas: jnp.ndarray,  # [T+1, B, S]
    leaky: float = 0.0,
) -> jnp.ndarray:
    """Returns gamma [B, T, P] = d(log Z)/dy (denominator occupancies)."""
    B, T, P = y.shape
    S = g.num_states
    log_leaky = jnp.log(leaky) if leaky > 0.0 else None

    def step(b, inputs):
        # b: [B, S] = log dZ/dalpha'_t ; process frame t (0-based y index)
        y_t, alpha_prev = inputs  # y[:, t], alphas[t] (post-leak at t)
        if log_leaky is not None:
            tot = jax.nn.logsumexp(g.log_init[None, :] + b, axis=-1, keepdims=True)
            btilde = jnp.logaddexp(b, log_leaky + tot)
        else:
            btilde = b
        # single pass over the src-sorted out-arc view: arc_w feeds BOTH
        # the beta pull-back (sorted segment reduce) and, combined with
        # alpha, the gamma accumulation (unsorted pdf scatter — measured
        # cheaper than a second arc traversal over a pdf-sorted view)
        arc_w = (
            g.out_logw[:, None] + y_t[:, g.out_pdf].T + btilde[:, g.out_dst].T
        )
        arc_post = alpha_prev[:, g.out_src].T + arc_w
        gamma_t = jax.ops.segment_sum(
            jnp.exp(arc_post - log_z[None, :]), g.out_pdf, num_segments=P
        ).T  # [B, P]
        nb = _seg_logsumexp(arc_w, g.out_src, S, is_sorted=True).T  # [B, S]
        return nb, gamma_t

    bT = jnp.zeros((B, S))
    ys = jnp.swapaxes(y, 0, 1)  # [T, B, P]
    _, gammas = jax.lax.scan(step, bT, (ys, alphas[:-1]), reverse=True, unroll=UNROLL)
    return jnp.swapaxes(gammas, 0, 1)  # [B, T, P]


# ---------------------------------------------------------------------------
# alpha-checkpointed variant (recompute-in-backward)
# ---------------------------------------------------------------------------
#
# SURVEY.md section 5 long-context note: the plain scan stores [T+1, B, S]
# alpha residuals, capping chunk length x batch at large S.  Checkpointing
# stores alpha every `every` frames ([T/every, B, S]) and the backward
# re-runs the forward inside each segment before its beta sweep — an
# `every`-fold residual-memory cut for one extra forward pass of compute.
# Enable via TORCHAIN_ALPHA_CHECKPOINT=<every> (chain_loss dispatches when
# T is divisible); den_forward/den_backward stay the exact reference.

CHECKPOINT_EVERY = int(_os.environ.get("TORCHAIN_ALPHA_CHECKPOINT", "0"))


def _fwd_step(g: DeviceDenGraph, leaky: float):
    def step(alpha, y_t):
        arc = alpha[:, g.in_src].T + g.in_logw[:, None] + y_t[:, g.in_pdf].T
        nxt = _seg_logsumexp(arc, g.in_dst, g.num_states, is_sorted=True).T
        return _leak(nxt, g.log_init, leaky), None

    return step


def den_forward_checkpointed(
    y: jnp.ndarray,  # [B, T, P]
    g: DeviceDenGraph,
    leaky: float = 0.0,
    every: int = 10,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (log_z [B], checkpoints [T//every, B, S]): the post-leak
    alpha entering each segment.  Requires T % every == 0."""
    B, T, P = y.shape
    if T % every:
        raise ValueError(f"T={T} not divisible by checkpoint every={every}")
    a0 = _leak(jnp.broadcast_to(g.log_init, (B, g.num_states)), g.log_init, leaky)
    ys = jnp.swapaxes(y, 0, 1).reshape(T // every, every, B, P)
    step = _fwd_step(g, leaky)

    def seg(alpha, y_seg):
        out, _ = jax.lax.scan(
            lambda a, y_t: (step(a, y_t)[0], None), alpha, y_seg, unroll=UNROLL
        )
        return out, alpha  # emit the segment-entry alpha

    aT, chks = jax.lax.scan(seg, a0, ys)
    return jax.nn.logsumexp(aT, axis=-1), chks


def den_backward_checkpointed(
    y: jnp.ndarray,  # [B, T, P]
    g: DeviceDenGraph,
    log_z: jnp.ndarray,  # [B]
    chks: jnp.ndarray,  # [T//every, B, S]
    leaky: float = 0.0,
    every: int = 10,
) -> jnp.ndarray:
    """Gamma [B, T, P]; recomputes each segment's alphas from its
    checkpoint, then runs the beta sweep — numerically identical ops to
    den_backward."""
    B, T, P = y.shape
    S = g.num_states
    log_leaky = jnp.log(leaky) if leaky > 0.0 else None
    fstep = _fwd_step(g, leaky)
    ys = jnp.swapaxes(y, 0, 1).reshape(T // every, every, B, P)

    def bstep(b, inputs):
        y_t, alpha_prev = inputs
        if log_leaky is not None:
            tot = jax.nn.logsumexp(g.log_init[None, :] + b, axis=-1, keepdims=True)
            btilde = jnp.logaddexp(b, log_leaky + tot)
        else:
            btilde = b
        arc_w = (
            g.out_logw[:, None] + y_t[:, g.out_pdf].T + btilde[:, g.out_dst].T
        )
        arc_post = alpha_prev[:, g.out_src].T + arc_w
        gamma_t = jax.ops.segment_sum(
            jnp.exp(arc_post - log_z[None, :]), g.out_pdf, num_segments=P
        ).T
        nb = _seg_logsumexp(arc_w, g.out_src, S, is_sorted=True).T
        return nb, gamma_t

    def seg(b, inputs):
        chk, y_seg = inputs
        # recompute this segment's pre-frame alphas from its checkpoint
        _, alphas_seg = jax.lax.scan(
            lambda a, y_t: (fstep(a, y_t)[0], a), chk, y_seg, unroll=UNROLL
        )
        b2, gammas = jax.lax.scan(
            bstep, b, (y_seg, alphas_seg), reverse=True, unroll=UNROLL
        )
        return b2, gammas

    bT = jnp.zeros((B, S))
    _, gammas = jax.lax.scan(seg, bT, (chks, ys), reverse=True)
    return jnp.swapaxes(gammas.reshape(T, B, P), 0, 1)
