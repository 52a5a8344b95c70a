"""Denominator forward-backward, v3: fused Pallas TPU kernels.

Motivation (measured, tools/profile_step.py): at chain-training scale the
per-frame matmuls are tiny, so the XLA `lax.scan` path is LATENCY-bound on
loop overhead, not FLOPs or bandwidth.  These kernels put the entire
T-loop inside ONE Pallas program with the graph matrices (V, E_mat) and
the whole emission block resident in VMEM — zero per-frame dispatch, MXU
matmuls back-to-back.

Same math and residual layout as den_dense.py (Moore factorization,
prob-space with per-frame renormalization, rank-1 leaky-HMM); den_dense
remains the reference and the fallback when the working set exceeds VMEM
(see `fits_vmem`).  The emission pre-gather (p @ P_mat) and the gamma
scatter (@ P_mat.T) stay in XLA where they batch over all T at once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchain_tpu.ops.device_graphs import DeviceDenseDenGraph

#: leave headroom below the ~16 MB/core VMEM for double buffering etc.
VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def fits_vmem(g: DeviceDenseDenGraph, B: int, T: int) -> bool:
    """Conservative working-set estimate for the fused kernels."""
    f = 4  # float32 bytes
    pe = T * B * g.num_exp * f
    mats = (g.num_orig * g.num_exp + g.num_exp * g.num_orig) * f
    sigmas = T * B * g.num_orig * f
    carry = 3 * B * max(g.num_exp, g.num_orig) * f
    return pe + mats + sigmas + carry < VMEM_BUDGET_BYTES


def _fwd_kernel(pe_ref, v_ref, e_ref, init_ref, logc_ref, sig_ref, leaky: float):
    """pe [T,B,E] -> logc [T,B], sigma_hats [T,B,S] (carry at frame entry)."""
    T, B, E = pe_ref.shape
    S = v_ref.shape[0]
    init = init_ref[0, :]  # [S]

    def body(t, sigma):
        sig_ref[t] = sigma
        if leaky > 0.0:
            tot = jnp.sum(sigma, axis=-1, keepdims=True)
            sigma = sigma + leaky * tot * init[None, :]
        h = jnp.dot(sigma, v_ref[:, :], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        alpha = h * pe_ref[t]
        c = jnp.sum(alpha, axis=-1, keepdims=True)
        alpha_hat = alpha / c
        logc_ref[t] = jnp.log(c[:, 0])
        return jnp.dot(alpha_hat, e_ref[:, :], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)

    sigma0 = jnp.broadcast_to(init[None, :], (B, S))
    jax.lax.fori_loop(0, T, body, sigma0)


def _bwd_kernel(
    pe_ref, v_ref, e_ref, init_ref, sig_ref, fscale_ref, ymax_ref, gout_ref,
    leaky: float,
):
    """Backward: emits per-frame gamma over EXPANDED states (gout [T,B,E]),
    scaled so that gamma_pdf = gout @ P_mat.T directly.
    fscale [T, B] = F_{t-1} + ymax_t - log_z; the beta carry's log scale G
    additionally accumulates ymax_t per frame (true emission includes the
    exp(ymax) factor removed from pe)."""
    T, B, E = pe_ref.shape
    S = v_ref.shape[0]
    init = init_ref[0, :]

    def body(i, carry):
        t = T - 1 - i
        bh, G = carry  # bh [B, E] normalized; log-scale G [B, 1]
        sigma = sig_ref[t]
        if leaky > 0.0:
            tot = jnp.sum(sigma, axis=-1, keepdims=True)
            sigma = sigma + leaky * tot * init[None, :]
        pe = pe_ref[t]
        ah = pe * jnp.dot(sigma, v_ref[:, :], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        scale = jnp.exp(fscale_ref[t][:, None] + G)  # [B, 1]
        gout_ref[t] = ah * bh * scale
        v = jnp.dot(pe * bh, v_ref[:, :].T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        if leaky > 0.0:
            v = v + leaky * jnp.sum(v * init[None, :], axis=-1, keepdims=True)
        nb = jnp.dot(v, e_ref[:, :].T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        d = jnp.max(nb, axis=-1, keepdims=True)
        d = jnp.where(d > 0, d, 1.0)
        return nb / d, G + ymax_ref[t][:, None] + jnp.log(d)

    bh0 = jnp.full((B, E), 1.0)
    G0 = jnp.full((B, 1), jnp.log1p(leaky) if leaky > 0.0 else 0.0)
    jax.lax.fori_loop(0, T, body, (bh0, G0))


def den_forward(
    y: jnp.ndarray,  # [B, T, P]
    g: DeviceDenseDenGraph,
    leaky: float = 0.0,
    interpret: bool = False,
) -> tuple[jnp.ndarray, dict]:
    """Drop-in replacement for den_dense.den_forward (same residuals)."""
    B, T, P = y.shape
    ymax = jax.lax.stop_gradient(jnp.max(y, axis=-1))
    p = jnp.exp(y - ymax[..., None])
    pe = jnp.einsum("btp,pe->tbe", p, g.P_mat)  # [T, B, E], batched on MXU

    logc, sig = pl.pallas_call(
        functools.partial(_fwd_kernel, leaky=leaky),
        out_shape=(
            jax.ShapeDtypeStruct((T, B), jnp.float32),
            jax.ShapeDtypeStruct((T, B, g.num_orig), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(pe, g.V, g.E_mat, g.init_orig[None, :])

    log_z = jnp.sum(logc, axis=0) + jnp.sum(ymax, axis=-1)
    if leaky > 0.0:
        log_z = log_z + jnp.log1p(leaky)
    res = dict(
        p=p, pe=pe, ymax=ymax, logc=logc, sigma_hats=sig, log_z=log_z
    )
    return log_z, res


def den_backward(
    g: DeviceDenseDenGraph,
    res: dict,
    leaky: float = 0.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for den_dense.den_backward."""
    p, pe, ymax = res["p"], res["pe"], res["ymax"]
    logc, sig, log_z = res["logc"], res["sigma_hats"], res["log_z"]
    B, T, P = p.shape
    F = jnp.cumsum(logc + ymax.T, axis=0)
    F_prev = jnp.concatenate([jnp.zeros((1, B)), F[:-1]], axis=0)
    fscale = F_prev + ymax.T - log_z[None, :]  # [T, B]

    gout = pl.pallas_call(
        functools.partial(_bwd_kernel, leaky=leaky),
        out_shape=jax.ShapeDtypeStruct((T, B, g.num_exp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pe, g.V, g.E_mat, g.init_orig[None, :], sig, fscale, ymax.T)

    gamma = jnp.einsum("tbe,pe->btp", gout, g.P_mat)
    return gamma
