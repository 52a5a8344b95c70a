"""Denominator forward-backward, v4: padded in-arc TABLE path.

For production-scale graphs the dense Moore path wastes FLOPs (the
transition matrix is ~0.2% dense) and the segment-op scan pays scatter
costs.  But chain denominator graphs have TINY in-degrees (measured p99
<= 13, max <= 17 at 4-gram+biphone scale — BENCH_NOTES.md), so padding
per-state in-arc lists to a fixed K gives dense [S, K] tables and each
frame becomes two constant-index gathers + a masked logsumexp over K —
the same shape that makes num_scan fast, now for the cyclic denominator
with leaky-HMM and all-states-final semantics.

Log-semiring throughout; same contract as den_scan (drop-in: forward
returns alphas for the backward), verified against the oracle.

STATUS (measured, TPU v5e, S=3.9k K_in=17 K_out=80): 125x SLOWER than the
segment-scan path — the [B, S, K] constant-index gathers lower to
pathological TPU code at this scale even though the same shape is fast for
the small per-frame numerator tables.  Kept as a tested alternate (it IS
the fastest path on CPU) and as the starting point for a Pallas gather
kernel; auto_den_graph does NOT select it on TPU.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.tree_util import register_dataclass

from torchain_tpu.graphs.den_graph import DenGraph

NEG_INF = -jnp.inf

import os as _os

UNROLL = int(_os.environ.get("TORCHAIN_SCAN_UNROLL", "4"))


@register_dataclass
@dataclasses.dataclass
class DeviceDenTableGraph:
    """Padded in/out-arc tables of the denominator HMM (shared across the
    batch).  -1 src/dst marks padding (weight -inf)."""

    in_src: jnp.ndarray  # int32 [S, K]
    in_pdf: jnp.ndarray  # int32 [S, K]
    in_logw: jnp.ndarray  # float32 [S, K]
    out_dst: jnp.ndarray  # int32 [S, K2]
    out_pdf: jnp.ndarray  # int32 [S, K2]
    out_logw: jnp.ndarray  # float32 [S, K2]
    log_init: jnp.ndarray  # float32 [S]
    num_states: int = dataclasses.field(metadata=dict(static=True))
    num_pdfs: int = dataclasses.field(metadata=dict(static=True))
    max_in: int = dataclasses.field(metadata=dict(static=True))
    max_out: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def from_host(g: DenGraph, pad_multiple: int = 1) -> "DeviceDenTableGraph":
        S = g.num_states

        def pack(offsets, a_idx, a_pdf, a_logw):
            deg = np.diff(offsets)
            K = int(deg.max())
            K = ((K + pad_multiple - 1) // pad_multiple) * pad_multiple
            idx = np.full((S, K), -1, dtype=np.int32)
            pdf = np.zeros((S, K), dtype=np.int32)
            logw = np.full((S, K), -np.inf, dtype=np.float32)
            for s in range(S):
                lo, hi = offsets[s], offsets[s + 1]
                n = hi - lo
                idx[s, :n] = a_idx[lo:hi]
                pdf[s, :n] = a_pdf[lo:hi]
                logw[s, :n] = a_logw[lo:hi]
            return idx, pdf, logw, K

        in_src, in_pdf, in_logw, K_in = pack(
            g.in_offsets, g.in_src, g.in_pdf, g.in_logw
        )
        out_dst, out_pdf, out_logw, K_out = pack(
            g.out_offsets, g.out_dst, g.out_pdf, g.out_logw
        )
        with np.errstate(divide="ignore"):
            log_init = np.log(g.initial_probs.astype(np.float64)).astype(np.float32)
        return DeviceDenTableGraph(
            in_src=jnp.asarray(in_src),
            in_pdf=jnp.asarray(in_pdf),
            in_logw=jnp.asarray(in_logw),
            out_dst=jnp.asarray(out_dst),
            out_pdf=jnp.asarray(out_pdf),
            out_logw=jnp.asarray(out_logw),
            log_init=jnp.asarray(log_init),
            num_states=S,
            num_pdfs=int(g.num_pdfs),
            max_in=K_in,
            max_out=K_out,
        )


def _gather_states(alpha: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """alpha [B, S] gathered by constant idx [S, K] -> [B, S, K]."""
    return alpha[:, jnp.clip(idx, 0, alpha.shape[1] - 1)]


def _gather_pdfs(y_t: jnp.ndarray, pdf: jnp.ndarray) -> jnp.ndarray:
    """y_t [B, P] gathered by constant pdf [S, K] -> [B, S, K]."""
    return y_t[:, pdf]


def _leak(log_alpha, log_init, leaky):
    if leaky <= 0.0:
        return log_alpha
    tot = jax.nn.logsumexp(log_alpha, axis=-1, keepdims=True)
    return jnp.logaddexp(log_alpha, jnp.log(leaky) + log_init[None, :] + tot)


def den_forward(
    y: jnp.ndarray,  # [B, T, P]
    g: DeviceDenTableGraph,
    leaky: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (log_z [B], alphas [T+1, B, S]) — post-leak, den_scan
    contract."""
    B = y.shape[0]
    mask = (g.in_src >= 0)[None]  # [1, S, K]
    a0 = _leak(jnp.broadcast_to(g.log_init, (B, g.num_states)), g.log_init, leaky)

    def step(alpha, y_t):
        vals = jnp.where(
            mask,
            _gather_states(alpha, g.in_src) + g.in_logw[None] + _gather_pdfs(y_t, g.in_pdf),
            NEG_INF,
        )
        nxt = _leak(jax.nn.logsumexp(vals, axis=-1), g.log_init, leaky)
        return nxt, nxt

    aT, alphas = jax.lax.scan(step, a0, jnp.swapaxes(y, 0, 1), unroll=UNROLL)
    alphas = jnp.concatenate([a0[None], alphas], axis=0)
    return jax.nn.logsumexp(aT, axis=-1), alphas


def den_backward(
    y: jnp.ndarray,
    g: DeviceDenTableGraph,
    log_z: jnp.ndarray,
    alphas: jnp.ndarray,
    leaky: float = 0.0,
) -> jnp.ndarray:
    """Returns gamma [B, T, P] = d(log Z)/dy.

    Beta pulls back over OUT-arc tables (gather over dst, logsumexp over
    out-arcs — no scatter); the only scatter is the per-frame gamma
    accumulation into pdf bins."""
    B, T, P = y.shape
    S = g.num_states
    out_mask = (g.out_dst >= 0)[None]
    log_leaky = jnp.log(leaky) if leaky > 0.0 else None

    def step(b, inputs):
        y_t, alpha_prev = inputs  # b: dZ/dalpha'_t ; alpha_prev = alphas[t]
        if log_leaky is not None:
            tot = jax.nn.logsumexp(g.log_init[None] + b, axis=-1, keepdims=True)
            btilde = jnp.logaddexp(b, log_leaky + tot)
        else:
            btilde = b
        # out-arc view: for src s, arcs (dst, pdf, w)
        arc_w = jnp.where(
            out_mask,
            g.out_logw[None] + _gather_pdfs(y_t, g.out_pdf) + _gather_states(btilde, g.out_dst),
            NEG_INF,
        )  # [B, S, K2]
        arc_post = alpha_prev[:, :, None] + arc_w
        post = jnp.exp(arc_post - log_z[:, None, None])
        post = jnp.where(out_mask, post, 0.0)
        flat_idx = (
            jnp.arange(B)[:, None, None] * P + g.out_pdf[None]
        ).reshape(-1)
        gamma_t = (
            jnp.zeros((B * P,)).at[flat_idx].add(post.reshape(-1)).reshape(B, P)
        )
        nb = jax.nn.logsumexp(arc_w, axis=-1)  # [B, S] = dZ/dalpha'_{t-1}
        return nb, gamma_t

    bT = jnp.zeros((B, S))
    ys = jnp.swapaxes(y, 0, 1)
    _, gammas = jax.lax.scan(
        step, bT, (ys, alphas[:-1]), reverse=True, unroll=UNROLL
    )
    return jnp.swapaxes(gammas, 0, 1)
