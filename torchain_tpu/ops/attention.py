"""Fused multi-head self-attention with relative-position bias (Pallas).

The conformer's attention at chain shapes is TINY (T~50 output frames,
dh=64, H=4): the XLA lowering of the einsum formulation spends ~1.8 ms
of a 10 ms step on qkv slice/reshape/transpose layout copies and
softmax glue around ~0.1 ms of actual matmul work (round-3 device
trace, models/conformer.py:146-157 + 'copy' ops).

Kernel shape (v2): tiny per-head matmuls are PIPELINE-DRAIN bound on the
MXU (v1, one program per batch row looping 4 heads x 2 dots, measured
SLOWER than the einsum path: 3.0 vs 1.8 ms/step — each [50,64]x[64,50]
dot costs ~1 us of drain around ~0.1 us of math).  v2 stacks the heads
BLOCK-DIAGONALLY: per batch row the whole attention is TWO MXU ops —
  logits_full = Lq @ Lk^T        ([H*Tp, H*Tp]; off-diagonal blocks are
                                  cross-head garbage masked to -inf by
                                  the precomputed stacked-bias operand)
  att_full    = softmax(logits_full) @ Lv      ([H*Tp, dh])
— ~4x the useful FLOPs, 1/4 the op count, and the drain disappears.
Head blocks are staged into VMEM scratch at Tp = round_up(T, 16) row
strides (16-aligned sublane offsets; an in-kernel concatenate of
unaligned [T, dh] pieces does not lower).  Several rows share one
program (ROWS_PER_PROGRAM) to amortize launch; pad rows/cols are masked
by the stacked bias and their outputs never read.

Semantics (matching models/conformer.py ConformerBlock):
    out[b, t, h*dh:(h+1)*dh] = softmax(scale * q_h @ k_h^T + bias[h]) @ v_h
with q_h = qkv[b, :, h*dh + 0D], k_h = +1D, v_h = +2D slices.

All matmuls accumulate f32 on the MXU (preferred_element_type); softmax
runs in f32.  The custom VJP recomputes the softmax in-kernel instead of
storing [B, H, T, T] probabilities; the bias gradient accumulates across
the (sequential) TPU grid into its output block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: batch rows per kernel program (amortizes program launch; VMEM per row
#: is ~100 KB at conformer shapes so 16 rows stay far under budget)
ROWS_PER_PROGRAM = 16

#: sublane alignment of the per-head row stride in the stacked layout
_ALIGN = 16


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _softmax_f32(logits):
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _stage(scr, x, H: int, dh: int, T: int, Tp: int, base: int):
    """Write head blocks of x[:, base + h*dh] into scr at h*Tp rows.

    The scratch is ALWAYS f32: with bf16 scratch + an unrolled multi-row
    loop Mosaic miscompiles the store/dot sequence (wrong results at
    ROWS_PER_PROGRAM > 1 while single-row and f32 are exact — round-3
    debug table); f32 staging sidesteps it and the tiny dots are
    drain-bound, not rate-bound, so f32 MXU costs nothing here."""
    for h in range(H):
        scr[h * Tp : h * Tp + T] = x[
            :, base + h * dh : base + (h + 1) * dh
        ].astype(scr.dtype)


def _fwd_kernel(
    H: int, dh: int, T: int, Tp: int, scale: float,
    qkv_ref, sb_ref, out_ref, lq, lk, lv,
):
    D = H * dh
    if T != Tp:  # pad rows would otherwise carry stale data across r
        lk[...] = jnp.zeros_like(lk)
        lv[...] = jnp.zeros_like(lv)
    for r in range(qkv_ref.shape[0]):
        x = qkv_ref[r]  # [T, 3D]
        _stage(lq, x, H, dh, T, Tp, 0)
        _stage(lk, x, H, dh, T, Tp, D)
        _stage(lv, x, H, dh, T, Tp, 2 * D)
        logits = (
            jax.lax.dot_general(
                lq[...], lk[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
            + sb_ref[...]
        )
        p = _softmax_f32(logits)
        # write the STACKED [H*Tp, dh] result as one aligned store; the
        # head re-merge to [B, T, D] happens outside in XLA — per-head
        # lane-offset bf16 stores here were masked read-modify-writes
        out_ref[r] = jax.lax.dot_general(
            p, lv[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)  # [H*Tp, dh]


def _bwd_kernel(
    H: int, dh: int, T: int, Tp: int, scale: float,
    qkv_ref, sb_ref, g_ref, dqkv_ref, dsb_ref, lq, lk, lv, lg,
):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        dsb_ref[...] = jnp.zeros_like(dsb_ref)

    D = H * dh
    if T != Tp:
        lq[...] = jnp.zeros_like(lq)
        lk[...] = jnp.zeros_like(lk)
        lv[...] = jnp.zeros_like(lv)
        lg[...] = jnp.zeros_like(lg)
    dsb = jnp.zeros_like(dsb_ref)
    for r in range(qkv_ref.shape[0]):
        x = qkv_ref[r]
        _stage(lq, x, H, dh, T, Tp, 0)
        _stage(lk, x, H, dh, T, Tp, D)
        _stage(lv, x, H, dh, T, Tp, 2 * D)
        _stage(lg, g_ref[r], H, dh, T, Tp, 0)
        logits = (
            jax.lax.dot_general(
                lq[...], lk[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
            + sb_ref[...]
        )
        p = _softmax_f32(logits)  # f32, recomputed (never leaves VMEM)
        pb = p
        # dv = p^T @ g ; dp = g @ v^T ; dl = softmax vjp
        dv = jax.lax.dot_general(
            pb, lg[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            lg[...], lv[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsb = dsb + dl
        dlb = dl
        dq = jax.lax.dot_general(
            dlb, lk[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dk = jax.lax.dot_general(
            dlb, lq[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        # per-head stores into the [T, 3D] layout: stacked aligned
        # stores + an XLA un-stack measured WORSE here (9.94 vs 9.50
        # ms/step — the 5-D transpose of dqkv outweighs the masked
        # read-modify-writes it saves; the FORWARD's stacked output
        # wins because its un-stack is 3x smaller)
        for h in range(H):
            sl = slice(h * Tp, h * Tp + T)
            dqkv_ref[r, :, h * dh : (h + 1) * dh] = dq[sl].astype(dqkv_ref.dtype)
            dqkv_ref[r, :, D + h * dh : D + (h + 1) * dh] = dk[sl].astype(
                dqkv_ref.dtype
            )
            dqkv_ref[r, :, 2 * D + h * dh : 2 * D + (h + 1) * dh] = dv[sl].astype(
                dqkv_ref.dtype
            )
    dsb_ref[...] += dsb


def _stacked_bias(bias: jnp.ndarray, Tp: int) -> jnp.ndarray:
    """[H, T, T] -> block-diagonal [H*Tp, H*Tp] with -1e9 outside the
    per-head diagonal T x T blocks (masks cross-head quadrants AND the
    alignment-pad rows/cols of the stacked logits)."""
    H, T, _ = bias.shape
    sb = jnp.full((H * Tp, H * Tp), -1e9, jnp.float32)
    for h in range(H):
        sl = slice(h * Tp, h * Tp + T)
        sb = sb.at[sl, sl].set(bias[h].astype(jnp.float32))
    return sb


def _rows_per_program(B: int) -> int:
    r = min(ROWS_PER_PROGRAM, B)
    while B % r:
        r -= 1
    return r


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_relpos_attention(
    qkv: jnp.ndarray,  # [B, T, 3*D]
    bias: jnp.ndarray,  # [H, T, T]
    num_heads: int,
    scale: float,
) -> jnp.ndarray:  # [B, T, D]
    return _attention_fwd_impl(qkv, bias, num_heads, scale)


def _attention_fwd_impl(qkv, bias, num_heads, scale):
    B, T, D3 = qkv.shape
    D = D3 // 3
    dh = D // num_heads
    Tp = _round_up(T, _ALIGN)
    HT = num_heads * Tp
    Bc = _rows_per_program(B)
    kern = functools.partial(_fwd_kernel, num_heads, dh, T, Tp, float(scale))
    stacked = pl.pallas_call(
        kern,
        grid=(B // Bc,),
        in_specs=[
            pl.BlockSpec((Bc, T, D3), lambda b: (b, 0, 0)),
            pl.BlockSpec((HT, HT), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Bc, HT, dh), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, HT, dh), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((HT, dh), jnp.float32)] * 3,
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            # ROWS_PER_PROGRAM blocks above 16 exceed Mosaic's 16 MB
            # default scoped limit; the device budget is far higher
            # (ops/den_resident.vmem_budget)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(qkv, _stacked_bias(bias, Tp))
    # head re-merge in XLA: [B, H, Tp, dh] -> crop pad rows -> [B, T, D]
    return (
        stacked.reshape(B, num_heads, Tp, dh)[:, :, :T]
        .transpose(0, 2, 1, 3)
        .reshape(B, T, D)
    )


def _attention_fwd(qkv, bias, num_heads, scale):
    return _attention_fwd_impl(qkv, bias, num_heads, scale), (qkv, bias)


def _attention_bwd(num_heads, scale, residuals, g):
    qkv, bias = residuals
    B, T, D3 = qkv.shape
    D = D3 // 3
    dh = D // num_heads
    Tp = _round_up(T, _ALIGN)
    HT = num_heads * Tp
    Bc = _rows_per_program(B)
    kern = functools.partial(_bwd_kernel, num_heads, dh, T, Tp, float(scale))
    dqkv, dsb = pl.pallas_call(
        kern,
        grid=(B // Bc,),
        in_specs=[
            pl.BlockSpec((Bc, T, D3), lambda b: (b, 0, 0)),
            pl.BlockSpec((HT, HT), lambda b: (0, 0)),
            pl.BlockSpec((Bc, T, D), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((Bc, T, D3), lambda b: (b, 0, 0)),
            pl.BlockSpec((HT, HT), lambda b: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, D3), qkv.dtype),
            jax.ShapeDtypeStruct((HT, HT), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((HT, dh), jnp.float32)] * 4,
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            # ROWS_PER_PROGRAM blocks above 16 exceed Mosaic's 16 MB
            # default scoped limit; the device budget is far higher
            # (ops/den_resident.vmem_budget)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(qkv, _stacked_bias(bias, Tp), g)
    # bias grad = the diagonal blocks of the stacked-bias grad (off-diag
    # entries are exact zeros: dl = p * (...) and p vanishes off-block)
    dbias = jnp.stack(
        [
            dsb[h * Tp : h * Tp + T, h * Tp : h * Tp + T]
            for h in range(num_heads)
        ]
    )
    return dqkv, dbias.astype(bias.dtype)


fused_relpos_attention.defvjp(_attention_fwd, _attention_bwd)


def reference_relpos_attention(qkv, bias, num_heads, scale):
    """Pure-jnp reference (the einsum formulation the kernel replaces);
    used by tests and as a readable spec."""
    B, T, D3 = qkv.shape
    D = D3 // 3
    H, dh = num_heads, D // num_heads
    q = qkv[..., 0 * D : 1 * D].reshape(B, T, H, dh).transpose(0, 2, 1, 3)
    k = qkv[..., 1 * D : 2 * D].reshape(B, T, H, dh).transpose(0, 2, 1, 3)
    v = qkv[..., 2 * D : 3 * D].reshape(B, T, H, dh).transpose(0, 2, 1, 3)
    logits = (
        jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
        * scale
        + bias[None].astype(jnp.float32)
    )
    p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    att = jnp.einsum("bhts,bhsd->bhtd", p, v)
    return att.transpose(0, 2, 1, 3).reshape(B, T, D)
