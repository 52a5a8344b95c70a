"""Denominator forward-backward, v2: dense MXU matmul path.

The TPU-native replacement for Kaldi's per-arc CUDA kernels
(kaldi/src/chain/chain-kernels.cu): instead of gathering over irregular arc
lists, the graph is state-split into a Moore machine (see
graphs/den_graph.py `make_dense_den_graph`) so that one frame of the alpha
recursion is

    sigma   = alpha @ E_mat            [B,E] @ [E,S]  (segment-sum, one-hot)
    sigma'  = sigma + leaky * (sum sigma) * init      (rank-1 leak)
    h       = sigma' @ V               [B,S] @ [S,E]  (transition mass)
    alpha'  = h * (p_t @ P_mat)        emission as diagonal scale
    alpha'  = alpha' / sum(alpha')     per-frame renormalization
                                       (Kaldi's conditioning strategy,
                                        chain-denominator.h "arbitrary
                                        scale"), log-scale accumulated

— three dense matmuls per frame, all MXU-eligible, wrapped in one
`lax.scan`.  Probabilities are conditioned by subtracting the per-frame max
of y before exponentiation (added back to log Z), so overflow is impossible
regardless of network output scale.

The backward pass mirrors it transposed (V^T / E_mat^T / P_mat^T) and emits
pdf occupancies gamma = d(log Z)/dy directly via the occupancy identity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from torchain_tpu.ops.device_graphs import DeviceDenseDenGraph


#: scan unroll factor (env TORCHAIN_SCAN_UNROLL).  Unrolling amortizes
#: sequential-loop overhead but inflates the program; measured on TPU v5e,
#: unroll=1 wins at mini scale — revisit per config with
#: tools/profile_step.py before changing.
import os as _os

UNROLL = int(_os.environ.get("TORCHAIN_SCAN_UNROLL", "4"))


#: den matmul precision (env TORCHAIN_DEN_PRECISION = highest | default).
#: HIGHEST keeps gamma-sums-to-one exact to ~1e-6 and is free at small
#: graph scales (latency-bound).  At production graph scale (S ~ 3.5k,
#: 4-gram biphone) the dense matmuls become FLOP-bound and HIGHEST costs
#: ~3x; "default" (bf16 multiplicands) trades ~1e-3 occupancy error —
#: fine for training — for that speed.
_PRECISION = (
    jax.lax.Precision.HIGHEST
    if _os.environ.get("TORCHAIN_DEN_PRECISION", "highest") == "highest"
    else jax.lax.Precision.DEFAULT
)


def _mm(a, b):
    return jnp.dot(
        a, b, preferred_element_type=jnp.float32, precision=_PRECISION
    )


def den_forward(
    y: jnp.ndarray,  # [B, T, P]
    g: DeviceDenseDenGraph,
    leaky: float = 0.0,
) -> tuple[jnp.ndarray, dict]:
    """Returns (log_z [B], residuals for the backward pass)."""
    B, T, P = y.shape
    ymax = jax.lax.stop_gradient(jnp.max(y, axis=-1))  # [B, T]
    p = jnp.exp(y - ymax[..., None])  # [B, T, P], in (0, 1]
    init = g.init_orig  # [S]

    def leak_fn(sigma):  # [B, S]
        if leaky <= 0.0:
            return sigma
        return sigma + leaky * jnp.sum(sigma, axis=-1, keepdims=True) * init[None, :]

    sigma0 = jnp.broadcast_to(init, (B, g.num_orig))

    def step(sigma_hat, p_t):
        # sigma_hat: [B, S] normalized post-segment-sum alpha of prev frame
        h = _mm(leak_fn(sigma_hat), g.V)  # [B, E]
        alpha = h * _mm(p_t, g.P_mat)  # [B, E]
        c = jnp.sum(alpha, axis=-1, keepdims=True)  # [B, 1]
        alpha_hat = alpha / c
        sigma_next = _mm(alpha_hat, g.E_mat)  # [B, S]
        return sigma_next, (jnp.log(c[:, 0]), sigma_hat)

    _, (logc, sigma_hats) = jax.lax.scan(
        step, sigma0, jnp.swapaxes(p, 0, 1), unroll=UNROLL
    )  # logc [T, B]; sigma_hats [T, B, S] = carry at entry of each frame
    log_z = jnp.sum(logc, axis=0) + jnp.sum(ymax, axis=-1)
    if leaky > 0.0:
        log_z = log_z + jnp.log1p(leaky)
    res = dict(p=p, ymax=ymax, logc=logc, sigma_hats=sigma_hats, log_z=log_z)
    return log_z, res


def den_backward(
    g: DeviceDenseDenGraph,
    res: dict,
    leaky: float = 0.0,
) -> jnp.ndarray:
    """Returns gamma [B, T, P] = d(log Z)/dy.

    Scale bookkeeping: with alpha~_t(e) the true (unscaled) forward value,
    the forward stored sigma_hat_{t-1} (normalized), so

        alpha~_t = ah_t * exp(F_{t-1} + ymax_t),
        ah_t     = pe_t * ((L sigma_hat_{t-1}) @ V),
        F_t      = sum_{tau<=t} (log c_tau + ymax_tau).

    The backward carry is normalized bh_t with true beta~_t = bh_t *
    exp(G_t), G_T = 0.  Then

        gamma_t = P_mat_scatter(ah_t * bh_t) * exp(F_{t-1} + ymax_t + G_t
                                                   - log Z).

    Since F_{t-1} + log c_t + ymax_t = F_t and gamma rows sum to one, the
    exponent equals -(log d-normalizations ahead), always ~O(1): no
    overflow."""
    p, ymax, logc = res["p"], res["ymax"], res["logc"]
    sigma_hats, log_z = res["sigma_hats"], res["log_z"]
    B, T, P = p.shape
    init = g.init_orig

    def leak_fn(sigma):
        if leaky <= 0.0:
            return sigma
        return sigma + leaky * jnp.sum(sigma, axis=-1, keepdims=True) * init[None, :]

    def leak_t_fn(v):  # L^T v : v + leaky * (init . v) * ones
        if leaky <= 0.0:
            return v
        return v + leaky * jnp.sum(v * init[None, :], axis=-1, keepdims=True)

    # F_{t-1} + ymax_t for every t (log alpha scale at frame t, pre-renorm)
    F = jnp.cumsum(logc + ymax.T, axis=0)  # [T, B], F[t] = F_{t+1} in math
    F_prev = jnp.concatenate([jnp.zeros((1, B)), F[:-1]], axis=0)  # F_{t-1}

    bhT = jnp.ones((B, g.num_exp))
    GT = jnp.zeros((B,))
    if leaky > 0.0:
        # Z includes a final leak: beta~_T = L^T 1 = (1 + leaky) in exp space
        GT = GT + jnp.log1p(leaky)

    def step(carry, inputs):
        bh, G = carry  # bh [B, E] normalized; beta~_t = bh * exp(G)
        p_t, sh_prev, f_prev, ymax_t = inputs
        pe = _mm(p_t, g.P_mat)  # [B, E]
        ah = pe * _mm(leak_fn(sh_prev), g.V)  # [B, E]
        scale = jnp.exp(f_prev + ymax_t + G - log_z)  # [B]
        gamma_t = _mm(ah * bh, g.P_mat.T) * scale[:, None]  # [B, P]
        # pull beta back one frame: beta~_{t-1} over expanded states
        v = _mm(pe * bh, g.V.T)  # [B, S]
        v = leak_t_fn(v)
        nb = _mm(v, g.E_mat.T)  # [B, E] (broadcast orig -> expanded)
        d = jnp.max(nb, axis=-1, keepdims=True)
        d = jnp.where(d > 0, d, 1.0)
        return (nb / d, G + ymax_t + jnp.log(d[:, 0])), gamma_t

    ps = jnp.swapaxes(p, 0, 1)  # [T, B, P]
    (_, _), gammas = jax.lax.scan(
        step, (bhT, GT), (ps, sigma_hats, F_prev, ymax.T), reverse=True,
        unroll=UNROLL,
    )
    return jnp.swapaxes(gammas, 0, 1)  # [B, T, P]
