"""End-to-end (generic) numerator forward-backward.

Behavioral reference: kaldi/src/chain/chain-generic-numerator.{h,cc}
(`GenericNumeratorComputation`): full log-space alpha/beta over cyclic
per-sequence numerator graphs (self-loops allowed, states do not map to
frames).  Arc tables are constant over time, so the scan carries only
[B, S] state vectors and the tables stay resident.

TPU re-design (round 2, same motivation as num_scan.py): data-dependent
gather/scatter lowers pathologically on TPU (~10 cycles/index, worse on
bf16).  Because the e2e arc tables are TIME-CONSTANT, the pdf indexing
here collapses to MXU one-hot matmuls with ZERO gathers or scatters:

  * each sequence's graph references a small pdf vocabulary `vocab`
    [B, Pv]; a one-hot [B, Pv, P] built by iota-comparison projects
    y -> ysmall [B, T, Pv] (matmul);
  * a second one-hot [B, S*K, Pv] over the arcs' local pdf ids expands
    emissions to per-arc values [B, T, S, K] (matmul) and, transposed,
    reduces per-arc posteriors to vocabulary space;
  * gamma re-expands to [B, T, P] through the first one-hot (matmul).

State selection in the scans uses comparison masks + masked logsumexp
(per-src-slot stabilization by construction).  Selection matmuls run at
HIGHEST precision: with 0/1 multiplicands the bf16x3 passes reproduce the
float32 operand exactly, so this path stays bit-faithful to a direct
gather.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.tree_util import register_dataclass

from torchain_tpu.graphs.e2e import E2eSupervision

#: scan unroll factor (env TORCHAIN_SCAN_UNROLL).  Unrolling amortizes
#: sequential-loop overhead but inflates the program; measured on TPU v5e,
#: unroll=1 wins at mini scale — revisit per config with
#: tools/profile_step.py before changing.
import os as _os

UNROLL = int(_os.environ.get("TORCHAIN_SCAN_UNROLL", "4"))


NEG_INF = -jnp.inf

_SEL_PRECISION = jax.lax.Precision.HIGHEST


def _seq_vocab_tables(in_src, in_pdf, round_to=8):
    """Per-sequence pdf vocabulary: returns (vocab [B, Pv] int32 0-padded,
    pdf_local [B, S, K] int32 indices into vocab, 0 for pad arcs)."""
    B, S, K = in_pdf.shape
    flat = in_pdf.reshape(B, S * K).astype(np.int64)
    valid = in_src.reshape(B, S * K) >= 0
    BIG = np.int64(1) << 40
    a = np.where(valid, flat, BIG)
    order = np.argsort(a, axis=1, kind="stable")
    s = np.take_along_axis(a, order, axis=1)
    new = np.ones_like(s, dtype=bool)
    new[:, 1:] = s[:, 1:] != s[:, :-1]
    new &= s < BIG
    rank_sorted = np.cumsum(new, axis=1) - 1
    pv = int(max(1, new.sum(axis=1).max()))
    Pv = ((pv + round_to - 1) // round_to) * round_to
    vocab = np.zeros((B, Pv), dtype=np.int32)
    rows = np.broadcast_to(np.arange(B)[:, None], s.shape)
    vocab[rows[new], rank_sorted[new]] = s[new].astype(np.int32)
    local_sorted = np.where(s < BIG, np.maximum(rank_sorted, 0), 0)
    local = np.zeros_like(flat, dtype=np.int32)
    np.put_along_axis(local, order, local_sorted.astype(np.int32), axis=1)
    return vocab, local.reshape(B, S, K)


@register_dataclass
@dataclasses.dataclass
class DeviceE2eSupervision:
    """Batched packed cyclic numerator graphs [B, S, K]."""

    in_src: jnp.ndarray  # int32 [B, S, K]
    in_pdf: jnp.ndarray  # int32 [B, S, K]
    in_logw: jnp.ndarray  # float32 [B, S, K]
    final_logw: jnp.ndarray  # float32 [B, S]
    weight: jnp.ndarray  # float32 [B]
    #: per-sequence pdf vocabulary (gather-free emission projection)
    vocab: jnp.ndarray  # int32 [B, Pv]
    pdf_local: jnp.ndarray  # int32 [B, S, K] (indices into vocab)
    num_frames: int = dataclasses.field(metadata=dict(static=True))
    max_states: int = dataclasses.field(metadata=dict(static=True))
    max_arcs: int = dataclasses.field(metadata=dict(static=True))
    num_pdfs: int = dataclasses.field(metadata=dict(static=True))
    #: optional per-frame derivative weights [B, T] (deriv_weights
    #: semantics; applied by the chain_loss VJP, not here)
    frame_weights: "jnp.ndarray | None" = None

    @staticmethod
    def from_host(s: E2eSupervision) -> "DeviceE2eSupervision":
        in_src = s.in_src if s.in_src.ndim == 3 else s.in_src[None]
        in_pdf = s.in_pdf if s.in_pdf.ndim == 3 else s.in_pdf[None]
        in_logw = s.in_logw if s.in_logw.ndim == 3 else s.in_logw[None]
        final = s.final_logw if s.final_logw.ndim == 2 else s.final_logw[None]
        B = in_src.shape[0]
        vocab, pdf_local = _seq_vocab_tables(
            np.asarray(in_src), np.asarray(in_pdf)
        )
        return DeviceE2eSupervision(
            in_src=jnp.asarray(in_src),
            in_pdf=jnp.asarray(in_pdf),
            in_logw=jnp.asarray(in_logw),
            final_logw=jnp.asarray(final),
            weight=jnp.broadcast_to(
                jnp.asarray(s.weight, dtype=jnp.float32), (B,)
            ),
            vocab=jnp.asarray(vocab),
            pdf_local=jnp.asarray(pdf_local),
            num_frames=int(s.num_frames),
            max_states=int(s.max_states),
            max_arcs=int(s.max_arcs),
            num_pdfs=int(s.num_pdfs),
            frame_weights=(
                None
                if getattr(s, "frame_weights", None) is None
                else jnp.asarray(s.frame_weights, dtype=jnp.float32)
            ),
        )


def _vocab_onehot(sup: DeviceE2eSupervision, P: int) -> jnp.ndarray:
    """[B, Pv, P] float32 one-hot of each sequence's vocabulary."""
    return (
        sup.vocab[..., None] == jnp.arange(P, dtype=sup.vocab.dtype)
    ).astype(jnp.float32)


def _arc_onehot(sup: DeviceE2eSupervision) -> jnp.ndarray:
    """[B, S, K, Pv] float32 one-hot of each arc's local pdf id."""
    Pv = sup.vocab.shape[-1]
    return (
        sup.pdf_local[..., None] == jnp.arange(Pv, dtype=sup.pdf_local.dtype)
    ).astype(jnp.float32)


def _arc_emissions(y: jnp.ndarray, sup: DeviceE2eSupervision) -> jnp.ndarray:
    """y [B, T, P] -> per-arc emission log-probs ylocal [B, T, S, K]
    via two one-hot matmuls (no gathers)."""
    B, T, P = y.shape
    oh_v = _vocab_onehot(sup, P)  # [B, Pv, P]
    ysmall = jnp.einsum(
        "btp,bvp->btv", y.astype(jnp.float32), oh_v, precision=_SEL_PRECISION
    )  # [B, T, Pv]
    oh_a = _arc_onehot(sup)  # [B, S, K, Pv]
    ylocal = jnp.einsum(
        "btv,bskv->btsk", ysmall, oh_a, precision=_SEL_PRECISION
    )
    return ylocal


def e2e_forward(
    y: jnp.ndarray,  # [B, T, P]
    sup: DeviceE2eSupervision,
    ylocal: jnp.ndarray | None = None,  # [B, T, S, K] to share with backward
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (log_prob [B], alphas [T+1, B, S])."""
    B, T, P = y.shape
    S = sup.max_states
    a0 = jnp.full((B, S), NEG_INF).at[:, 0].set(0.0)
    if ylocal is None:
        ylocal = _arc_emissions(y, sup)  # [B, T, S, K] f32
    from torchain_tpu.ops.num_scan import _interpret, _use_resident

    if _use_resident():
        from torchain_tpu.ops import num_resident

        rest = num_resident.e2e_forward_resident(
            ylocal, sup.in_src, sup.in_logw, interpret=_interpret()
        )
        aT = rest[-1]
        alphas = jnp.concatenate([a0[None], rest], axis=0)
    else:
        mask = sup.in_src >= 0
        warc = jnp.where(mask, sup.in_logw, 0.0)  # [B, S, K]
        # loop-invariant selection mask, built once outside the scan body
        hit = sup.in_src[..., None] == jnp.arange(S, dtype=sup.in_src.dtype)

        def step(alpha, yl):
            sel = jnp.max(
                jnp.where(hit, alpha[:, None, None, :], NEG_INF), axis=-1
            )
            vals = sel + warc + jnp.where(mask, yl, 0.0)
            nxt = jax.nn.logsumexp(vals, axis=-1)
            return nxt, nxt

        aT, alphas = jax.lax.scan(
            step, a0, jnp.swapaxes(ylocal, 0, 1), unroll=UNROLL
        )
        alphas = jnp.concatenate([a0[None], alphas], axis=0)
    log_p = jax.nn.logsumexp(aT + sup.final_logw, axis=-1)
    return log_p, alphas


def e2e_backward(
    y: jnp.ndarray,
    sup: DeviceE2eSupervision,
    log_p: jnp.ndarray,
    alphas: jnp.ndarray,
    ylocal: jnp.ndarray | None = None,  # [B, T, S, K] shared with forward
) -> jnp.ndarray:
    """Returns gamma [B, T, P] = d(log_prob)/dy; zero for non-finite
    sequences."""
    B, T, P = y.shape
    S = sup.max_states
    safe_logp = jnp.where(jnp.isfinite(log_p), log_p, 0.0)
    valid = jnp.isfinite(log_p)

    if ylocal is None:
        ylocal = _arc_emissions(y, sup)  # [B, T, S, K] f32
    mask = sup.in_src >= 0
    hit = sup.in_src[..., None] == jnp.arange(S, dtype=sup.in_src.dtype)

    def step(beta, inputs):
        # beta [B, S] at frame t+1; emit per-arc posteriors of frame step t
        yl, alpha_t = inputs
        w = jnp.where(mask, sup.in_logw + yl, NEG_INF) + beta[:, :, None]
        prev = jax.nn.logsumexp(
            jnp.where(hit, w[..., None], NEG_INF), axis=(1, 2)
        )
        sel_alpha = jnp.max(
            jnp.where(hit, alpha_t[:, None, None, :], NEG_INF), axis=-1
        )
        post = jnp.where(
            valid[:, None, None],
            jnp.exp(sel_alpha + w - safe_logp[:, None, None]),
            0.0,
        )  # [B, S, K]
        return prev, post

    from torchain_tpu.ops.num_scan import _interpret, _use_resident

    if _use_resident():
        from torchain_tpu.ops import num_resident

        post = num_resident.e2e_backward_resident(
            ylocal,
            alphas[:-1],
            sup.in_src,
            sup.in_logw,
            sup.final_logw,
            log_p,
            interpret=_interpret(),
        )  # [B, T, S, K]
    else:
        _, posts = jax.lax.scan(
            step,
            sup.final_logw,
            (jnp.swapaxes(ylocal, 0, 1), alphas[:-1]),
            reverse=True,
            unroll=UNROLL,
        )
        post = jnp.swapaxes(posts, 0, 1)  # [B, T, S, K]

    # reduce to vocabulary space and re-expand to pdf space: two matmuls,
    # no scatter
    oh_a = _arc_onehot(sup)  # [B, S, K, Pv]
    gamma_small = jnp.einsum(
        "btsk,bskv->btv", post, oh_a, precision=_SEL_PRECISION
    )  # [B, T, Pv]
    oh_v = _vocab_onehot(sup, P)  # [B, Pv, P]
    gamma = jnp.einsum(
        "btv,bvp->btp", gamma_small, oh_v, precision=_SEL_PRECISION
    )
    return gamma
