"""Numerator (supervision) forward-backward: log-semiring scan over the
packed per-frame arc tensors.

Behavioral reference: kaldi/src/chain/chain-numerator.cc
(`NumeratorComputation`): log-domain recursion over the time-sorted
supervision FST, gathering nnet log-probs by (frame, pdf), emitting
occupancy derivatives.

TPU re-design (round 2): profiling on the v5e showed that data-dependent
gather/scatter is the enemy — ~0.25 ms per op inside a scan regardless of
operand size (bf16 scatter-add is emulated and far worse), and even ONE
vectorized [B*T*S*K]-index gather over the [B, T, P] output costs ~15 ms
(~10 cycles/index).  This implementation therefore indexes y exactly once
per pass through a tiny per-frame pdf vocabulary and does everything else
with comparison masks (pure VPU math):

  * `DeviceSupervision.frame_vocab` [B, T, W] holds each row's distinct
    pdfs (W ~ 8-16 « P); `ysmall = take_along_axis(y, frame_vocab)` is a
    ~30x smaller gather than the naive per-arc one;
  * per-arc emissions select from `ysmall` by a one-hot comparison with
    `pdf_local` [B, T, S, K]; alpha/beta recursions select predecessor
    values by comparison masks + masked logsumexp (per-src-slot
    stabilization by construction — the ADVICE r1 fix);
  * the beta scan also emits per-arc posteriors reduced to vocabulary
    space [B, T, W]; gamma is ONE [B*T*W]-index scatter-add into
    [B, T, P], float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from torchain_tpu.ops.device_graphs import DeviceSupervision

#: scan unroll factor (env TORCHAIN_SCAN_UNROLL).  Unrolling amortizes
#: sequential-loop overhead but inflates the program; measured on TPU v5e,
#: unroll=1 wins at mini scale — revisit per config with
#: tools/profile_step.py before changing.
import os as _os

UNROLL = int(_os.environ.get("TORCHAIN_SCAN_UNROLL", "4"))


NEG_INF = -jnp.inf


def _use_pallas_vocab() -> bool:
    """Pallas vocab kernels run on TPU only: interpret mode (the CPU
    fallback) emulates the grid in Python and makes CPU test runs crawl.
    TORCHAIN_NUM_PALLAS=force enables interpret mode for equivalence
    tests; =0 disables the kernels everywhere."""
    mode = _os.environ.get("TORCHAIN_NUM_PALLAS", "1")
    if mode == "0":
        return False
    if mode == "force":
        return True
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _use_resident() -> bool:
    """Steady-frame recursions as single Pallas kernels (ops/num_resident):
    kills the per-frame XLA while-loop dispatch (~10 us/frame at the
    trigram headline).  TORCHAIN_NUM_RESIDENT=force enables interpret
    mode for equivalence tests; =0 disables.  Hardware-validated by
    tools/ab_num_resident: 5.602 -> 5.342 ms/step at the trigram B=128
    headline with exact first-step objf parity (BENCH_NOTES round 4).

    On a TPU: single-chip always; multi-chip only INSIDE the shard_map
    wrapper (ops/sharded.py), where this trace sees the per-shard batch
    and the kernel runs per chip.  Outside shard_map a multi-device jit
    would make GSPMD all-gather the sharded batch and replicate the
    custom call on every chip (see auto_den_graph's data_shards note),
    so the XLA scan path is used there."""
    mode = _os.environ.get("TORCHAIN_NUM_RESIDENT", "1")
    if mode == "0":
        return False
    if mode == "force":
        return True
    if jax.default_backend() != "tpu":
        return False
    if len(jax.devices()) == 1:
        return True
    from torchain_tpu.ops import sharded

    return sharded.in_sharded_region()


def _frames_per_program(T: int) -> int:
    """Frames handled by one grid step of the vocab kernels.  Each grid
    step costs ~1-2 us of dispatch around ~1 us of VPU math at production
    shapes, so batching frames amortizes the overhead (r4 device trace:
    the 1-frame gather grid was 129 us/step at T=50).  Must divide T (the
    blocks tile the time axis exactly)."""
    for tb in (8, 5, 4, 2):
        if T % tb == 0:
            return tb
    return 1


def _gather_vocab(y: jnp.ndarray, sup: DeviceSupervision) -> jnp.ndarray:
    """The one real gather: y [B, T, P] -> ysmall [B, T, W] float32.

    XLA lowers the [B*T*W]-index take_along_axis at ~10 cycles/index
    (~1 ms/step at production scale); the Pallas kernel instead streams
    [Tb, B, P] frame blocks and selects each of the W vocabulary
    entries with a one-hot lane comparison — pure VPU math, ~4x faster
    (BENCH_NOTES round 2)."""
    if not _use_pallas_vocab():
        return jnp.take_along_axis(
            y.astype(jnp.float32), sup.frame_vocab, axis=2
        )
    B, T, P = y.shape
    W = sup.frame_vocab.shape[-1]
    # Mosaic block constraint: the last two dims of a block must be
    # divisible by (8, 128) or cover the array — so stream time-major
    # [T, B, P] blocks of (Tb, B, P)
    Tb = _frames_per_program(T)
    yt = jnp.swapaxes(y, 0, 1)  # [T, B, P]
    vt = jnp.swapaxes(sup.frame_vocab, 0, 1)  # [T, B, W]

    def kern(y_ref, v_ref, o_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
        for tb in range(Tb):
            yb = y_ref[tb].astype(jnp.float32)  # [B, P]
            vv = v_ref[tb]  # [B, W]
            cols = []
            for w in range(W):
                hit = vv[:, w : w + 1] == iota  # [B, P]
                cols.append(
                    jnp.sum(jnp.where(hit, yb, 0.0), axis=1, keepdims=True)
                )
            o_ref[tb] = jnp.concatenate(cols, axis=1)

    out = pl.pallas_call(
        kern,
        grid=(T // Tb,),
        in_specs=[
            pl.BlockSpec((Tb, B, P), lambda t: (t, 0, 0)),
            pl.BlockSpec((Tb, B, W), lambda t: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((Tb, B, W), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, B, W), jnp.float32),
        interpret=_interpret(),
    )(yt, vt)
    return jnp.swapaxes(out, 0, 1)


def _scatter_vocab(
    gsm_t: jnp.ndarray,  # [T, B, W] f32 vocabulary-space occupancies
    sup: DeviceSupervision,
    P: int,
) -> jnp.ndarray:
    """Expand vocabulary-space gamma to pdf space: [T, B, W] -> [B, T, P].

    Pad vocabulary slots carry exactly 0.0 (no arc indexes them), so the
    one-hot accumulation over W is exact even where vocab rows repeat
    pdf 0 in their padding."""
    T, B, W = gsm_t.shape
    Tb = _frames_per_program(T)
    vt = jnp.swapaxes(sup.frame_vocab, 0, 1)  # [T, B, W]

    def kern(g_ref, v_ref, o_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
        for tb in range(Tb):
            g = g_ref[tb]  # [B, W]
            vv = v_ref[tb]  # [B, W]
            acc = jnp.zeros_like(o_ref[tb])
            for w in range(W):
                hit = vv[:, w : w + 1] == iota  # [B, P]
                acc = acc + jnp.where(hit, g[:, w : w + 1], 0.0)
            o_ref[tb] = acc

    gamma_t = pl.pallas_call(
        kern,
        grid=(T // Tb,),
        in_specs=[
            pl.BlockSpec((Tb, B, W), lambda t: (t, 0, 0)),
            pl.BlockSpec((Tb, B, W), lambda t: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((Tb, B, P), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, B, P), jnp.float32),
        interpret=_interpret(),
    )(gsm_t, vt)
    return jnp.swapaxes(gamma_t, 0, 1)


def _steady(sup: DeviceSupervision) -> int:
    """Arc-slot width of the steady (frames >= 1) triple."""
    return int(sup.in_src_r.shape[-1])


def _emit(ysm: jnp.ndarray, pdf_local: jnp.ndarray) -> jnp.ndarray:
    """ysm [B, W], pdf_local [B, S, K] -> emission log-probs [B, S, K].
    Gather-free: one-hot comparison against iota(W) (exactly one hit)."""
    W = ysm.shape[-1]
    hit = pdf_local[..., None] == jnp.arange(W, dtype=pdf_local.dtype)
    return jnp.sum(jnp.where(hit, ysm[:, None, None, :], 0.0), axis=-1)


def _select_src(x: jnp.ndarray, src: jnp.ndarray) -> jnp.ndarray:
    """x [B, S], src [B, S, K] (values in [0, S), -1 = pad) -> [B, S, K]
    with x[b, src[b, s, k]] (pad slots yield -inf)."""
    S = x.shape[1]
    hit = src[..., None] == jnp.arange(S, dtype=src.dtype)
    return jnp.max(jnp.where(hit, x[:, None, None, :], NEG_INF), axis=-1)


def num_forward(
    y: jnp.ndarray,  # [B, T, P]
    sup: DeviceSupervision,
    ysmall: jnp.ndarray | None = None,  # [B, T, W] to share with backward
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (log_prob [B], alphas [T+1, B, S])."""
    B, T, P = y.shape
    S = sup.max_states
    a0 = jnp.full((B, S), NEG_INF).at[:, 0].set(0.0)
    if ysmall is None:
        ysmall = _gather_vocab(y, sup)  # [B, T, W]

    def step(alpha, inputs):
        ysm, src, lpdf, logw = inputs
        vals = _select_src(alpha, src) + jnp.where(
            src >= 0, logw + _emit(ysm, lpdf), 0.0
        )
        nxt = jax.nn.logsumexp(vals, axis=-1)
        return nxt, nxt

    # frame 0 outside the scan at full K (it concentrates the
    # normalization FST's initial fan-in); frames >= 1 scan over the much
    # narrower steady-arc slice (arcs are left-packed, so this is exact)
    Kr = _steady(sup)
    alpha1, _ = step(
        a0,
        (ysmall[:, 0], sup.in_src0, sup.pdf_local0, sup.in_logw0),
    )
    if T > 1:
        if _use_resident():
            from torchain_tpu.ops import num_resident

            pre = (
                (sup.src_k, sup.pdf_local_k, sup.logw_k)
                if getattr(sup, "src_k", None) is not None
                else None
            )
            aT, rest = num_resident.steady_forward(
                alpha1,
                sup.in_src_r,
                sup.pdf_local_r,
                sup.in_logw_r,
                ysmall[:, 1:],
                interpret=_interpret(),
                pre=pre,
            )
        else:
            xs = (
                jnp.swapaxes(ysmall[:, 1:], 0, 1),  # [T-1, B, W]
                jnp.swapaxes(sup.in_src_r, 0, 1),  # [T-1, B, S, Kr]
                jnp.swapaxes(sup.pdf_local_r, 0, 1),
                jnp.swapaxes(sup.in_logw_r, 0, 1),
            )
            aT, rest = jax.lax.scan(step, alpha1, xs, unroll=UNROLL)
        alphas = jnp.concatenate([a0[None], alpha1[None], rest], axis=0)
    else:
        aT = alpha1
        alphas = jnp.concatenate([a0[None], alpha1[None]], axis=0)
    log_p = jax.nn.logsumexp(aT + sup.final_logw, axis=-1)
    return log_p, alphas


def num_backward(
    y: jnp.ndarray,  # [B, T, P]
    sup: DeviceSupervision,
    log_p: jnp.ndarray,  # [B]
    alphas: jnp.ndarray,  # [T+1, B, S]
    ysmall: jnp.ndarray | None = None,  # [B, T, W] shared with forward
) -> jnp.ndarray:
    """Returns gamma [B, T, P] = d(log_prob)/dy (numerator occupancies).
    Sequences with non-finite log_p yield zero gamma (the caller applies the
    numeric-failure policy).

    One reverse scan carries beta [B, S] and emits per-frame occupancies
    already reduced to vocabulary space [B, W]; the only scatter is the
    final [B*T*W]-index expansion to [B, T, P]."""
    B, T, P = y.shape
    S = sup.max_states
    W = sup.frame_vocab.shape[-1]
    safe_logp = jnp.where(jnp.isfinite(log_p), log_p, 0.0)
    valid = jnp.isfinite(log_p)

    if ysmall is None:
        ysmall = _gather_vocab(y, sup)  # [B, T, W]

    def step(beta, inputs):
        # beta: [B, S] log-betas of frame t+1 states; emit occupancies of
        # frame step t and pull beta back to frame t states
        ysm, src, lpdf, logw, alpha_t = inputs
        arc_w = jnp.where(src >= 0, logw + _emit(ysm, lpdf), NEG_INF) + beta[
            :, :, None
        ]  # [B, S, K]: arc weight + emission + beta(dst)
        hit_src = src[..., None] == jnp.arange(S, dtype=src.dtype)
        prev = jax.nn.logsumexp(
            jnp.where(hit_src, arc_w[..., None], NEG_INF), axis=(1, 2)
        )  # [B, S'] — per-src-slot stabilized pullback
        sel_alpha = jnp.max(
            jnp.where(hit_src, alpha_t[:, None, None, :], NEG_INF), axis=-1
        )
        post = jnp.where(
            valid[:, None, None],
            jnp.exp(sel_alpha + arc_w - safe_logp[:, None, None]),
            0.0,
        )  # [B, S, K] per-arc occupancies
        hit_w = (
            lpdf[..., None] == jnp.arange(W, dtype=lpdf.dtype)
        )  # [B, S, K, W]
        gsm = jnp.sum(jnp.where(hit_w, post[..., None], 0.0), axis=(1, 2))
        return prev, gsm  # gsm [B, W]

    # frames T-1..1 scan at the steady arc width; the wide frame-0 step
    # (normalization initial fan-in) runs once outside (mirrors num_forward)
    Kr = _steady(sup)
    if T > 1:
        if _use_resident():
            from torchain_tpu.ops import num_resident

            pre = (
                (sup.src_k, sup.pdf_local_k, sup.logw_k)
                if getattr(sup, "src_k", None) is not None
                else None
            )
            beta1, gsm_rest = num_resident.steady_backward(
                sup.in_src_r,
                sup.pdf_local_r,
                sup.in_logw_r,
                ysmall[:, 1:],
                alphas[1:-1],
                sup.final_logw,
                log_p,
                interpret=_interpret(),
                pre=pre,
            )
        else:
            xs = (
                jnp.swapaxes(ysmall[:, 1:], 0, 1),
                jnp.swapaxes(sup.in_src_r, 0, 1),
                jnp.swapaxes(sup.pdf_local_r, 0, 1),
                jnp.swapaxes(sup.in_logw_r, 0, 1),
                alphas[1:-1],
            )
            beta1, gsm_rest = jax.lax.scan(
                step, sup.final_logw, xs, reverse=True, unroll=UNROLL
            )
    else:
        beta1, gsm_rest = sup.final_logw, None
    _, gsm0 = step(
        beta1,
        (
            ysmall[:, 0],
            sup.in_src0,
            sup.pdf_local0,
            sup.in_logw0,
            alphas[0],
        ),
    )
    gsm = (
        jnp.concatenate([gsm0[None], gsm_rest], axis=0)
        if gsm_rest is not None
        else gsm0[None]
    )  # [T, B, W]

    if _use_pallas_vocab():
        return _scatter_vocab(gsm, sup, P)

    # XLA fallback: ONE flat scatter of provably-unique indices.
    # frame_vocab rows are strictly increasing over their valid prefix and
    # 0-padded after it, so a slot is valid iff it is slot 0 or exceeds its
    # predecessor; pad slots (whose gamma is exactly 0 — no arc indexes
    # them) are routed out of bounds and dropped, which lets XLA skip the
    # sort/dedup lowering of a colliding scatter-add.
    gamma_small = jnp.swapaxes(gsm, 0, 1)  # [B, T, W]
    vocab = sup.frame_vocab
    vocab_valid = jnp.concatenate(
        [
            jnp.ones(vocab.shape[:2] + (1,), dtype=bool),
            vocab[..., 1:] > vocab[..., :-1],
        ],
        axis=-1,
    )
    flat_idx = (
        (jnp.arange(B)[:, None, None] * T + jnp.arange(T)[None, :, None]) * P
        + vocab
    )
    flat_idx = jnp.where(vocab_valid, flat_idx, B * T * P).reshape(-1)
    gamma = (
        jnp.zeros((B * T * P,), dtype=jnp.float32)
        .at[flat_idx]
        .set(gamma_small.reshape(-1), mode="drop", unique_indices=True)
        .reshape(B, T, P)
    )
    return gamma
