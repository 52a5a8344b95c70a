"""End-to-end (generic) numerator forward-backward.

Behavioral reference: kaldi/src/chain/chain-generic-numerator.{h,cc}
(`GenericNumeratorComputation`): full log-space alpha/beta over cyclic
per-sequence numerator graphs (self-loops allowed, states do not map to
frames).  Same gather/masked-logsumexp machinery as num_scan.py, but the
arc tables are constant over time, so the scan carries only [B, S] state
vectors and the tables stay resident.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.tree_util import register_dataclass

from torchain_tpu.graphs.e2e import E2eSupervision

#: scan unroll factor (env TORCHAIN_SCAN_UNROLL).  Unrolling amortizes
#: sequential-loop overhead but inflates the program; measured on TPU v5e,
#: unroll=1 wins at mini scale — revisit per config with
#: tools/profile_step.py before changing.
import os as _os

UNROLL = int(_os.environ.get("TORCHAIN_SCAN_UNROLL", "4"))


NEG_INF = -jnp.inf


@register_dataclass
@dataclasses.dataclass
class DeviceE2eSupervision:
    """Batched packed cyclic numerator graphs [B, S, K]."""

    in_src: jnp.ndarray  # int32 [B, S, K]
    in_pdf: jnp.ndarray  # int32 [B, S, K]
    in_logw: jnp.ndarray  # float32 [B, S, K]
    #: the same arc set regrouped by SOURCE slot (backward pass tables)
    out_dst: jnp.ndarray  # int32 [B, S, K2]
    out_pdf: jnp.ndarray  # int32 [B, S, K2]
    out_logw: jnp.ndarray  # float32 [B, S, K2]
    final_logw: jnp.ndarray  # float32 [B, S]
    weight: jnp.ndarray  # float32 [B]
    num_frames: int = dataclasses.field(metadata=dict(static=True))
    max_states: int = dataclasses.field(metadata=dict(static=True))
    max_arcs: int = dataclasses.field(metadata=dict(static=True))
    num_pdfs: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def from_host(s: E2eSupervision) -> "DeviceE2eSupervision":
        in_src = s.in_src if s.in_src.ndim == 3 else s.in_src[None]
        in_pdf = s.in_pdf if s.in_pdf.ndim == 3 else s.in_pdf[None]
        in_logw = s.in_logw if s.in_logw.ndim == 3 else s.in_logw[None]
        final = s.final_logw if s.final_logw.ndim == 2 else s.final_logw[None]
        B = in_src.shape[0]
        import numpy as np

        from torchain_tpu.ops.device_graphs import _out_tables

        odst, opdf, ologw = _out_tables(
            np.asarray(in_src)[:, None],
            np.asarray(in_pdf)[:, None],
            np.asarray(in_logw)[:, None],
            np.float32(-np.inf),
        )
        return DeviceE2eSupervision(
            in_src=jnp.asarray(in_src),
            in_pdf=jnp.asarray(in_pdf),
            in_logw=jnp.asarray(in_logw),
            out_dst=jnp.asarray(odst[:, 0]),
            out_pdf=jnp.asarray(opdf[:, 0]),
            out_logw=jnp.asarray(ologw[:, 0]),
            final_logw=jnp.asarray(final),
            weight=jnp.broadcast_to(
                jnp.asarray(s.weight, dtype=jnp.float32), (B,)
            ),
            num_frames=int(s.num_frames),
            max_states=int(s.max_states),
            max_arcs=int(s.max_arcs),
            num_pdfs=int(s.num_pdfs),
        )


def _gather_states(alpha, idx):
    B, S = alpha.shape
    return jnp.take_along_axis(
        alpha, jnp.clip(idx, 0, S - 1).reshape(B, -1), axis=1
    ).reshape(idx.shape)


def _gather_pdfs(y_t, pdf):
    B = y_t.shape[0]
    return jnp.take_along_axis(y_t, pdf.reshape(B, -1), axis=1).reshape(pdf.shape)


def e2e_forward(
    y: jnp.ndarray,  # [B, T, P]
    sup: DeviceE2eSupervision,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (log_prob [B], alphas [T+1, B, S])."""
    B, T, P = y.shape
    S = sup.max_states
    mask = sup.in_src >= 0  # [B, S, K]
    a0 = jnp.full((B, S), NEG_INF).at[:, 0].set(0.0)

    def step(alpha, y_t):
        vals = jnp.where(
            mask,
            _gather_states(alpha, sup.in_src) + sup.in_logw + _gather_pdfs(y_t, sup.in_pdf),
            NEG_INF,
        )
        nxt = jax.nn.logsumexp(vals, axis=-1)
        return nxt, nxt

    aT, alphas = jax.lax.scan(step, a0, jnp.swapaxes(y, 0, 1), unroll=UNROLL)
    alphas = jnp.concatenate([a0[None], alphas], axis=0)
    log_p = jax.nn.logsumexp(aT + sup.final_logw, axis=-1)
    return log_p, alphas


def e2e_backward(
    y: jnp.ndarray,
    sup: DeviceE2eSupervision,
    log_p: jnp.ndarray,
    alphas: jnp.ndarray,
) -> jnp.ndarray:
    """Returns gamma [B, T, P] = d(log_prob)/dy; zero for non-finite
    sequences."""
    B, T, P = y.shape
    S, K = sup.max_states, sup.max_arcs
    mask = sup.in_src >= 0
    safe_logp = jnp.where(jnp.isfinite(log_p), log_p, 0.0)
    valid = jnp.isfinite(log_p)

    omask = sup.out_dst >= 0

    def step(b, inputs):
        # out-arc tables (grouped by src slot): the beta pullback is a
        # plain per-slot masked logsumexp, no segment ops (see num_scan)
        y_t, alpha_t = inputs
        arc_w = jnp.where(
            omask,
            sup.out_logw + _gather_pdfs(y_t, sup.out_pdf) + _gather_states(b, sup.out_dst),
            NEG_INF,
        )
        arc_post = alpha_t[:, :, None] + arc_w
        post = jnp.where(
            omask & valid[:, None, None],
            jnp.exp(arc_post - safe_logp[:, None, None]),
            0.0,
        )
        flat_idx = (jnp.arange(B)[:, None, None] * P + sup.out_pdf).reshape(-1)
        gamma_t = jnp.zeros((B * P,)).at[flat_idx].add(post.reshape(-1)).reshape(B, P)
        nb = jax.nn.logsumexp(arc_w, axis=-1)
        return nb, gamma_t

    bT = sup.final_logw
    _, gammas = jax.lax.scan(
        step, bT, (jnp.swapaxes(y, 0, 1), alphas[:-1]), reverse=True,
        unroll=UNROLL,
    )
    return jnp.swapaxes(gammas, 0, 1)
