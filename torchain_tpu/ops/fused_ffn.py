"""Fused conformer feed-forward module (Pallas): W1 -> swish -> W2 ->
half-step residual as ONE kernel pair whose hidden activations never
touch HBM.

Behavioral reference: the two FFN half-steps of each conformer block
(models/conformer.py, SURVEY.md section 2 config-4 model family), i.e.

    out = res + alpha * (swish(xn @ W1 + b1) @ W2 + b2)

with xn = the pre-norm LayerNorm output, alpha = 0.5.

STATUS: honestly-kept NEGATIVE result at conformer shapes (default OFF;
ConformerConfig.ffn_impl).  The hypothesis was that the XLA lowering
round-trips the [N, F] hidden tensor (~26 MB per FFN instance, 16
instances/step at the trigram headline) and a VMEM-resident
recompute-in-backward kernel would save it.  Device-measured (v5e,
B=128 trigram): full step 10.45 ms fused vs 9.09 ms dense, and in
isolation the backward kernel is ~60 us/instance SLOWER than autodiff —
XLA already fuses the swish chain into the matmuls and overlaps the
streams, while the kernel's dim0-contraction weight-grad dots (x^T @ dh,
h^T @ g) pay Mosaic transposes that outweigh the saved traffic.
Earlier iterations recorded in BENCH_NOTES r5: accumulating weight
grads through output refs (-1.6 ms, fixed with VMEM scratch), pad/slice
glue from non-divisor block rows (-0.5 ms, fixed with divisor blocks).

The kernel stays correct, parity-tested (tests/test_fused_ffn.py), and
selectable for larger-F experiments where the traffic/overhead balance
differs.  All matmuls accumulate f32 on the MXU; swish and its
derivative run in f32; tensors cross block boundaries in the trunk
dtype (bf16), matching the nn.Dense formulation within bf16 rounding."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: max token rows per kernel program.  Bigger blocks amortize program
#: launch and lift the matmul M dim; VMEM high-water at the cap with
#: D=256, F=1024 is ~26 MB in the backward (x, g, u/sig/dh f32 blocks,
#: h/dhb bf16, both weights, both weight-grad accumulators) — well under
#: the v5e budget (ops/den_resident.py VMEM probing).  The row count is
#: chosen as a DIVISOR of N when one exists so no pad/slice glue
#: surrounds the call (the first cut padded 6400 -> 6656 and lost
#: ~0.5 ms/step to pad/slice/copy ops around 16 kernel launches).
MAX_ROWS_PER_BLOCK = 1280


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def supported(d: int, f: int) -> bool:
    """MXU-clean shapes only; anything else takes the XLA reference."""
    return d % 128 == 0 and f % 128 == 0


def ffn_reference(xn, res, w1, b1, w2, b2, alpha: float):
    """Plain-XLA reference (differentiable by autodiff): numerically the
    nn.Dense formulation with f32 swish.  Used on CPU and for any
    non-MXU-aligned shape; the kernel is parity-tested against it."""
    dt = xn.dtype
    u = (
        jnp.dot(xn, w1.astype(dt), preferred_element_type=jnp.float32)
        + b1.astype(jnp.float32)
    )
    h = (u * jax.nn.sigmoid(u)).astype(dt)
    out = (
        jnp.dot(h, w2.astype(dt), preferred_element_type=jnp.float32)
        + b2.astype(jnp.float32)
    )
    return (res.astype(jnp.float32) + alpha * out).astype(dt)


def _fwd_kernel(alpha, xn_ref, res_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                out_ref):
    u = (
        jax.lax.dot_general(
            xn_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[...]
    )
    h = (u * jax.nn.sigmoid(u)).astype(xn_ref.dtype)
    out = (
        jax.lax.dot_general(
            h, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b2_ref[...]
    )
    out_ref[...] = (
        res_ref[...].astype(jnp.float32) + alpha * out
    ).astype(out_ref.dtype)


def _bwd_kernel(alpha, xn_ref, g_ref, w1_ref, b1_ref, w2_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                aw1, ab1, aw2, ab2):
    # weight grads accumulate in VMEM scratch across the (sequential)
    # grid and hit HBM exactly once at the last program — accumulating
    # through the output refs re-streamed the [D, F] f32 blocks every
    # grid step (~0.25 MB x 4 x programs x 16 FFN instances: the first
    # cut of this kernel LOST 1.6 ms/step to it)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        aw1[...] = jnp.zeros_like(aw1)
        ab1[...] = jnp.zeros_like(ab1)
        aw2[...] = jnp.zeros_like(aw2)
        ab2[...] = jnp.zeros_like(ab2)

    x = xn_ref[...]
    g = g_ref[...]
    u = (
        jax.lax.dot_general(
            x, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[...]
    )
    sig = jax.nn.sigmoid(u)
    h = (u * sig).astype(x.dtype)
    # dh = (alpha * g @ W2^T) * swish'(u); swish' = sig * (1 + u*(1-sig))
    dh = (
        jax.lax.dot_general(
            g, w2_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * alpha
        * (sig * (1.0 + u * (1.0 - sig)))
    )
    dhb = dh.astype(x.dtype)
    dx_ref[...] = jax.lax.dot_general(
        dhb, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)
    aw1[...] += jax.lax.dot_general(
        x, dhb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ab1[...] += jnp.sum(dh, axis=0, keepdims=True)
    aw2[...] += alpha * jax.lax.dot_general(
        h, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ab2[...] += alpha * jnp.sum(
        g.astype(jnp.float32), axis=0, keepdims=True
    )

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        dw1_ref[...] = aw1[...]
        db1_ref[...] = ab1[...]
        dw2_ref[...] = aw2[...]
        db2_ref[...] = ab2[...]


def _block_rows(n: int) -> tuple[int, int]:
    """(rows per block, padded N): the largest 16-multiple divisor of n
    up to the cap when one exists (zero padding), else the cap with
    round-up padding."""
    best = 0
    for bn in range(16, min(n, MAX_ROWS_PER_BLOCK) + 1, 16):
        if n % bn == 0:
            best = bn
    if best:
        return best, n
    bn = min(MAX_ROWS_PER_BLOCK, _round_up(n, 16))
    return bn, _round_up(n, bn)


def _pad_rows(x, n_pad):
    n = x.shape[0]
    if n == n_pad:
        return x
    return jnp.pad(x, ((0, n_pad - n), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _ffn_fused(xn, res, w1, b1, w2, b2, alpha: float, interpret: bool):
    out, _ = _ffn_fused_fwd(xn, res, w1, b1, w2, b2, alpha, interpret)
    return out


def _ffn_fused_fwd(xn, res, w1, b1, w2, b2, alpha, interpret):
    N, D = xn.shape
    F = w1.shape[1]
    dt = xn.dtype
    BN, n_pad = _block_rows(N)
    kern = functools.partial(_fwd_kernel, alpha)
    out = pl.pallas_call(
        kern,
        grid=(n_pad // BN,),
        in_specs=[
            pl.BlockSpec((BN, D), lambda i: (i, 0)),
            pl.BlockSpec((BN, D), lambda i: (i, 0)),
            pl.BlockSpec((D, F), lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec((F, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BN, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, D), dt),
        compiler_params=None if interpret else pltpu.CompilerParams(
            # the BN-capped blocks need ~11 MB (fwd) / ~26 MB (bwd) of
            # VMEM at conformer shapes — above Mosaic's 16 MB default
            # scoped limit, far under the probed device budget
            # (ops/den_resident.vmem_budget)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        _pad_rows(xn, n_pad),
        _pad_rows(res, n_pad),
        w1.astype(dt),
        b1.astype(jnp.float32)[None, :],
        w2.astype(dt),
        b2.astype(jnp.float32)[None, :],
    )
    return out[:N], (xn, w1, b1, w2)


def _ffn_fused_bwd(alpha, interpret, resids, g):
    xn, w1, b1, w2 = resids
    N, D = xn.shape
    F = w1.shape[1]
    dt = xn.dtype
    BN, n_pad = _block_rows(N)
    kern = functools.partial(_bwd_kernel, alpha)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        kern,
        grid=(n_pad // BN,),
        in_specs=[
            pl.BlockSpec((BN, D), lambda i: (i, 0)),
            pl.BlockSpec((BN, D), lambda i: (i, 0)),
            pl.BlockSpec((D, F), lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec((F, D), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((BN, D), lambda i: (i, 0)),
            pl.BlockSpec((D, F), lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec((F, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, D), dt),
            jax.ShapeDtypeStruct((D, F), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
            jax.ShapeDtypeStruct((F, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((D, F), jnp.float32),
            pltpu.VMEM((1, F), jnp.float32),
            pltpu.VMEM((F, D), jnp.float32),
            pltpu.VMEM((1, D), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            # the BN-capped blocks need ~11 MB (fwd) / ~26 MB (bwd) of
            # VMEM at conformer shapes — above Mosaic's 16 MB default
            # scoped limit, far under the probed device budget
            # (ops/den_resident.vmem_budget)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        _pad_rows(xn, n_pad),
        _pad_rows(g.astype(dt), n_pad),
        w1.astype(dt),
        b1.astype(jnp.float32)[None, :],
        w2.astype(dt),
    )
    # residual path: d(res) = g, in res's dtype
    return (dx[:N], g.astype(dt), dw1, db1[0], dw2, db2[0])


_ffn_fused.defvjp(_ffn_fused_fwd, _ffn_fused_bwd)


def ffn_apply(xn, res, w1, b1, w2, b2, alpha: float = 0.5):
    """res + alpha * (swish(xn @ W1 + b1) @ W2 + b2) over [..., D]
    operands; fused Pallas on TPU for MXU-aligned shapes, XLA reference
    otherwise (CPU included — interpret-mode Pallas is for tests)."""
    D = xn.shape[-1]
    F = w1.shape[1]
    lead = xn.shape[:-1]
    x2 = xn.reshape(-1, D)
    r2 = res.reshape(-1, D)
    if _interpret() or not supported(D, F):
        return ffn_reference(x2, r2, w1, b1, w2, b2, alpha).reshape(
            *lead, D
        )
    return _ffn_fused(x2, r2, w1, b1, w2, b2, float(alpha), False).reshape(
        *lead, D
    )
