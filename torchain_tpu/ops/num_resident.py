"""Numerator steady-frame recursions as single Pallas kernels.

Behavioral reference: kaldi/src/chain/chain-numerator.cc
(`NumeratorComputation`) — same math as the `lax.scan` path in
ops/num_scan.py (log-semiring alpha/beta over the packed per-frame arc
tensors, comparison-mask selects, per-src-slot stabilization), different
execution strategy: the whole steady-frame T-loop runs INSIDE one kernel
(grid=(T-1,), sequential on TPU) with the alpha/beta carry in VMEM
scratch, so the ~10 us/frame of XLA while-loop dispatch that made the
numerator ~540 us/step at the trigram headline (BENCH_NOTES round 4
"TDNN-F remaining fat") disappears.

Layout: lanes = B (the batch is 128 at the headline), sublanes = states;
per-frame arc tables stream as [1, Kr, S, B] blocks (steady arc width
Kr ~ 12 « K), emissions as [1, W, B].  All selects are static python
loops over S (~20) and W (~16) — pure VPU comparison math on
[Kr, S, B] tiles, exactly the num_scan formulation with the batch moved
to the minor axis.  Frame 0 (the normalization FST's wide initial
fan-in) stays outside in XLA at full K, as before.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -jnp.inf


def _masked_lse(
    vals: jnp.ndarray, axes: tuple[int, ...], keepdims: bool = False
) -> jnp.ndarray:
    """logsumexp over `axes` tolerating all--inf slices (-> -inf, no nan).
    keepdims=True keeps results >= 2-D inside kernels (Mosaic is happiest
    when no intermediate collapses to rank 1)."""
    m = jnp.max(vals, axis=axes, keepdims=True)
    msafe = jnp.where(m == NEG_INF, 0.0, m)
    s = jnp.sum(jnp.exp(vals - msafe), axis=axes, keepdims=True)
    out = jnp.where(m == NEG_INF, NEG_INF, msafe + jnp.log(s))
    if not keepdims:
        out = out.reshape([d for i, d in enumerate(vals.shape) if i not in axes])
    return out


def _fwd_kernel(
    S: int,
    W: int,
    src_ref,  # [1, Kr, S, B] int32 (arc source state, -1 = pad)
    lpdf_ref,  # [1, Kr, S, B] int32 (index into the frame vocab)
    logw_ref,  # [1, Kr, S, B] f32 (arc log-weight)
    ysm_ref,  # [1, W, B] f32 (frame emission log-probs per vocab slot)
    alpha1_ref,  # [S, B] f32 (alpha after the wide frame-0 step)
    out_ref,  # [1, S, B] f32 out: alpha of frame t+1
    carry_ref,  # scratch [S, B] f32
):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        carry_ref[...] = alpha1_ref[...]

    alpha = carry_ref[...]  # [S, B]
    src = src_ref[0]  # [Kr, S, B]
    lpdf = lpdf_ref[0]
    logw = logw_ref[0]
    ysm = ysm_ref[0]  # [W, B]
    emit = jnp.zeros_like(logw)
    for w in range(W):
        emit += jnp.where(lpdf == w, ysm[w : w + 1][None], 0.0)
    sel = jnp.full_like(logw, NEG_INF)
    for sp in range(S):
        sel = jnp.where(src == sp, alpha[sp : sp + 1][None], sel)
    vals = jnp.where(src >= 0, sel + logw + emit, NEG_INF)  # [Kr, S, B]
    nxt = _masked_lse(vals, (0,))  # [S, B]
    out_ref[0] = nxt
    carry_ref[...] = nxt


def _bwd_kernel(
    S: int,
    W: int,
    src_ref,  # [1, Kr, S, B] int32 (REVERSED t: block i is frame T-1-i)
    lpdf_ref,  # [1, Kr, S, B] int32
    logw_ref,  # [1, Kr, S, B] f32
    ysm_ref,  # [1, W, B] f32
    alpha_ref,  # [1, S, B] f32: alpha of the SOURCE frame of this step
    final_ref,  # [S, B] f32: final log-weights (beta at frame T)
    logp_ref,  # [1, B] f32: per-sequence log-prob, +inf where invalid
    gsm_ref,  # [1, W, B] f32 out: vocab-space occupancies of this frame
    beta1_ref,  # [S, B] f32 out: beta after the last (earliest) step
    carry_ref,  # scratch [S, B] f32
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = final_ref[...]

    beta = carry_ref[...]  # [S, B] betas of this frame's DST states
    src = src_ref[0]
    lpdf = lpdf_ref[0]
    logw = logw_ref[0]
    ysm = ysm_ref[0]
    alpha = alpha_ref[0]  # [S, B]
    emit = jnp.zeros_like(logw)
    for w in range(W):
        emit += jnp.where(lpdf == w, ysm[w : w + 1][None], 0.0)
    arc_w = jnp.where(src >= 0, logw + emit, NEG_INF) + beta[None, :, :]
    logp2 = logp_ref[...][None]  # [1, 1, B]
    sel_alpha = jnp.full_like(logw, NEG_INF)
    prev_rows = []
    for sp in range(S):
        hit = src == sp
        sel_alpha = jnp.where(hit, alpha[sp : sp + 1][None], sel_alpha)
        prev_rows.append(
            _masked_lse(jnp.where(hit, arc_w, NEG_INF), (0, 1), keepdims=True)[0]
        )
    # per-arc occupancies; logp is +inf for invalid sequences, so the
    # exp() underflows to exactly 0 there (numeric-failure containment)
    post = jnp.exp(sel_alpha + arc_w - logp2)
    for w in range(W):
        gsm_ref[0, w : w + 1] = jnp.sum(
            jnp.where(lpdf == w, post, 0.0), axis=(0, 1), keepdims=False
        )[None]
    prev = jnp.concatenate(prev_rows, axis=0)  # [S, B]
    carry_ref[...] = prev
    beta1_ref[...] = prev


def steady_forward(
    alpha1: jnp.ndarray,  # [B, S] alpha after the frame-0 step
    src: jnp.ndarray,  # [B, T-1, S, Kr] (steady slice, any int dtype)
    lpdf: jnp.ndarray,  # [B, T-1, S, Kr]
    logw: jnp.ndarray,  # [B, T-1, S, Kr] f32
    ysm: jnp.ndarray,  # [B, T-1, W] f32
    interpret: bool = False,
    pre: "tuple | None" = None,  # kernel-layout (src, lpdf, logw) tables
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Replaces the forward lax.scan over frames 1..T-1.
    Returns (aT [B, S], alphas_rest [T-1, B, S]).

    `pre` supplies the [T-1, Kr, S, B] kernel-layout tables prepared at
    batch-placement time (DeviceSupervision.with_kernel_tables) so the
    in-step transposes vanish for replayed batches."""
    B, Tm1, S, Kr = src.shape
    W = ysm.shape[-1]
    if pre is not None:
        kl, pl_, wl = pre
    else:
        kl = jnp.transpose(src.astype(jnp.int32), (1, 3, 2, 0))  # [T-1,Kr,S,B]
        pl_ = jnp.transpose(lpdf.astype(jnp.int32), (1, 3, 2, 0))
        wl = jnp.transpose(logw, (1, 3, 2, 0))
    yl = jnp.transpose(ysm, (1, 2, 0))  # [T-1, W, B]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, S, W),
        grid=(Tm1,),
        in_specs=[
            pl.BlockSpec((1, Kr, S, B), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((1, Kr, S, B), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((1, Kr, S, B), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((1, W, B), lambda t: (t, 0, 0)),
            pl.BlockSpec((S, B), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, B), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Tm1, S, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, B), jnp.float32)],
        interpret=interpret,
    )(kl, pl_, wl, yl, jnp.transpose(alpha1, (1, 0)))
    alphas_rest = jnp.transpose(out, (0, 2, 1))  # [T-1, B, S]
    return alphas_rest[-1], alphas_rest


def steady_backward(
    src: jnp.ndarray,  # [B, T-1, S, Kr] steady slice (frames 1..T-1)
    lpdf: jnp.ndarray,
    logw: jnp.ndarray,
    ysm: jnp.ndarray,  # [B, T-1, W] emissions of frames 1..T-1
    alphas: jnp.ndarray,  # [T-1, B, S] alphas of frames 1..T-1 (sources)
    final_logw: jnp.ndarray,  # [B, S]
    log_p: jnp.ndarray,  # [B] (may be non-finite)
    interpret: bool = False,
    pre: "tuple | None" = None,  # kernel-layout (src, lpdf, logw) tables
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Replaces the reverse lax.scan over frames T-1..1.
    Returns (beta1 [B, S], gsm_rest [T-1, B, W])."""
    B, Tm1, S, Kr = src.shape
    W = ysm.shape[-1]
    # NO reversed copies: grid step i READS frame Tm1-1-i via the index
    # map (and writes gsm to the same frame), so the kernel-layout
    # transposes below are byte-identical to the forward's and CSE away
    # (or are skipped entirely when `pre` ships the placed tables)
    if pre is not None:
        kl, pl_, wl = pre
    else:
        kl = jnp.transpose(src.astype(jnp.int32), (1, 3, 2, 0))
        pl_ = jnp.transpose(lpdf.astype(jnp.int32), (1, 3, 2, 0))
        wl = jnp.transpose(logw, (1, 3, 2, 0))
    yl = jnp.transpose(ysm, (1, 2, 0))
    al = jnp.transpose(alphas, (0, 2, 1))  # [T-1, S, B]
    logp_adj = jnp.where(jnp.isfinite(log_p), log_p, jnp.inf)[None, :]
    r4 = lambda t: (Tm1 - 1 - t, 0, 0, 0)  # noqa: E731
    r3 = lambda t: (Tm1 - 1 - t, 0, 0)  # noqa: E731
    gsm_t, beta1 = pl.pallas_call(
        functools.partial(_bwd_kernel, S, W),
        grid=(Tm1,),
        in_specs=[
            pl.BlockSpec((1, Kr, S, B), r4),
            pl.BlockSpec((1, Kr, S, B), r4),
            pl.BlockSpec((1, Kr, S, B), r4),
            pl.BlockSpec((1, W, B), r3),
            pl.BlockSpec((1, S, B), r3),
            pl.BlockSpec((S, B), lambda t: (0, 0)),
            pl.BlockSpec((1, B), lambda t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, W, B), r3),
            pl.BlockSpec((S, B), lambda t: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tm1, W, B), jnp.float32),
            jax.ShapeDtypeStruct((S, B), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((S, B), jnp.float32)],
        interpret=interpret,
    )(kl, pl_, wl, yl, al, jnp.transpose(final_logw, (1, 0)), logp_adj)
    return jnp.transpose(beta1, (1, 0)), jnp.transpose(gsm_t, (0, 2, 1))


# ---------------------------------------------------------------------------
# e2e (flat-start) variants: cyclic graphs, tables CONSTANT over time —
# they stream once (index_map 0) and stay resident across all grid steps.
# Emissions arrive precomputed per arc (num_e2e._arc_emissions).
# ---------------------------------------------------------------------------


def _e2e_fwd_kernel(
    S: int,
    yl_ref,  # [1, K, S, B] f32 per-arc emission log-probs of frame t
    src_ref,  # [K, S, B] int32 (constant over t)
    logw_ref,  # [K, S, B] f32 (constant over t)
    out_ref,  # [1, S, B] f32 out: alpha of frame t+1
    carry_ref,  # scratch [S, B] f32
):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        # a0: state 0 = 0.0, others -inf
        iota = jax.lax.broadcasted_iota(
            jnp.int32, carry_ref.shape, dimension=0
        )
        carry_ref[...] = jnp.where(iota == 0, 0.0, NEG_INF)

    alpha = carry_ref[...]
    src = src_ref[...]
    logw = logw_ref[...]
    yl = yl_ref[0]
    sel = jnp.full_like(logw, NEG_INF)
    for sp in range(S):
        sel = jnp.where(src == sp, alpha[sp : sp + 1][None], sel)
    vals = jnp.where(src >= 0, sel + logw + yl, NEG_INF)  # [K, S, B]
    nxt = _masked_lse(vals, (0,))
    out_ref[0] = nxt
    carry_ref[...] = nxt


def _e2e_bwd_kernel(
    S: int,
    yl_ref,  # [1, K, S, B] f32 (REVERSED t)
    alpha_ref,  # [1, S, B] f32: alpha of this step's SOURCE frame (reversed)
    src_ref,  # [K, S, B] int32 (constant)
    logw_ref,  # [K, S, B] f32 (constant)
    final_ref,  # [S, B] f32
    logp_ref,  # [1, B] f32 (+inf where invalid)
    post_ref,  # [1, K, S, B] f32 out: per-arc posteriors (reversed t)
    carry_ref,  # scratch [S, B] f32
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = final_ref[...]

    beta = carry_ref[...]
    src = src_ref[...]
    logw = logw_ref[...]
    yl = yl_ref[0]
    alpha = alpha_ref[0]
    arc_w = jnp.where(src >= 0, logw + yl, NEG_INF) + beta[None, :, :]
    logp2 = logp_ref[...][None]  # [1, 1, B]
    sel_alpha = jnp.full_like(logw, NEG_INF)
    prev_rows = []
    for sp in range(S):
        hit = src == sp
        sel_alpha = jnp.where(hit, alpha[sp : sp + 1][None], sel_alpha)
        prev_rows.append(
            _masked_lse(jnp.where(hit, arc_w, NEG_INF), (0, 1), keepdims=True)[0]
        )
    post_ref[0] = jnp.exp(sel_alpha + arc_w - logp2)
    carry_ref[...] = jnp.concatenate(prev_rows, axis=0)


def e2e_forward_resident(
    ylocal: jnp.ndarray,  # [B, T, S, K] per-arc emission log-probs
    src: jnp.ndarray,  # [B, S, K]
    logw: jnp.ndarray,  # [B, S, K]
    interpret: bool = False,
) -> jnp.ndarray:
    """Replaces the e2e forward lax.scan.  Returns alphas [T, B, S]
    (alpha after steps 1..T; frame-0 init happens in-kernel)."""
    B, T, S, K = ylocal.shape
    yl = jnp.transpose(ylocal, (1, 3, 2, 0))  # [T, K, S, B]
    kl = jnp.transpose(src.astype(jnp.int32), (2, 1, 0))  # [K, S, B]
    wl = jnp.transpose(logw, (2, 1, 0))
    out = pl.pallas_call(
        functools.partial(_e2e_fwd_kernel, S),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, K, S, B), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((K, S, B), lambda t: (0, 0, 0)),
            pl.BlockSpec((K, S, B), lambda t: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, B), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, S, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, B), jnp.float32)],
        interpret=interpret,
    )(yl, kl, wl)
    return jnp.transpose(out, (0, 2, 1))  # [T, B, S]


def e2e_backward_resident(
    ylocal: jnp.ndarray,  # [B, T, S, K]
    alphas: jnp.ndarray,  # [T, B, S] alphas of frames 0..T-1 (sources)
    src: jnp.ndarray,  # [B, S, K]
    logw: jnp.ndarray,  # [B, S, K]
    final_logw: jnp.ndarray,  # [B, S]
    log_p: jnp.ndarray,  # [B] (may be non-finite)
    interpret: bool = False,
) -> jnp.ndarray:
    """Replaces the e2e reverse lax.scan.  Returns per-arc posteriors
    [B, T, S, K] (zero rows for invalid sequences)."""
    B, T, S, K = ylocal.shape
    # reversed iteration via the index map — no reversed copies, and the
    # yl transpose matches the forward's for CSE
    yl = jnp.transpose(ylocal, (1, 3, 2, 0))  # [T, K, S, B]
    al = jnp.transpose(alphas, (0, 2, 1))  # [T, S, B]
    kl = jnp.transpose(src.astype(jnp.int32), (2, 1, 0))
    wl = jnp.transpose(logw, (2, 1, 0))
    logp_adj = jnp.where(jnp.isfinite(log_p), log_p, jnp.inf)[None, :]
    r4 = lambda t: (T - 1 - t, 0, 0, 0)  # noqa: E731
    r3 = lambda t: (T - 1 - t, 0, 0)  # noqa: E731
    post_t = pl.pallas_call(
        functools.partial(_e2e_bwd_kernel, S),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, K, S, B), r4),
            pl.BlockSpec((1, S, B), r3),
            pl.BlockSpec((K, S, B), lambda t: (0, 0, 0)),
            pl.BlockSpec((K, S, B), lambda t: (0, 0, 0)),
            pl.BlockSpec((S, B), lambda t: (0, 0)),
            pl.BlockSpec((1, B), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, K, S, B), r4),
        out_shape=jax.ShapeDtypeStruct((T, K, S, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, B), jnp.float32)],
        interpret=interpret,
    )(yl, al, kl, wl, jnp.transpose(final_logw, (1, 0)), logp_adj)
    return jnp.transpose(post_t, (3, 0, 2, 1))  # [B, T, S, K]
