"""Semi-orthogonal constraint for TDNN-F factored layers.

Behavioral reference: Kaldi's `ConstrainOrthonormal` (nnet-utils.cc), the
periodic projection step from Povey et al. 2018 "Semi-Orthogonal Low-Rank
Matrix Factorization for Deep Neural Networks": for a wide matrix M
[rows <= cols], drive M M^T toward alpha I (alpha floating) with the
quartic-converging update

    P     = M M^T
    alpha = sqrt(trace(P P^T) / trace(P))          (floating scale)
    M    <- M - (nu / alpha) (P - alpha I) M       (nu = 0.25)

applied OUTSIDE the gradient every few optimizer steps — a plain matmul
step, exactly the shape TPUs like.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def semi_orthogonal_step(M: jnp.ndarray, nu: float = 0.5) -> jnp.ndarray:
    """One constraint update on M [rows, cols] (applied along the smaller
    dimension; transposes internally if rows > cols).

    alpha = trace(P P^T)/trace(P) is the floating scale (for MM^T = aI,
    alpha == a); when the matrix is far from orthonormal
    (trace(PP^T) rows / trace(P)^2 >> 1) the update speed is reduced,
    mirroring Kaldi's safeguard in ConstrainOrthonormal."""
    transpose = M.shape[0] > M.shape[1]
    W = M.T if transpose else M
    rows = W.shape[0]
    P = jnp.dot(W, W.T, preferred_element_type=jnp.float32)
    trace_p = jnp.maximum(jnp.trace(P), 1e-20)
    trace_pp = jnp.sum(jnp.square(P))
    alpha = jnp.maximum(trace_pp / trace_p, 1e-20)
    ratio = trace_pp * rows / jnp.square(trace_p)
    speed = jnp.where(ratio > 1.1, nu * 0.25, nu)
    Q = P - alpha * jnp.eye(P.shape[0], dtype=P.dtype)
    W = W - (speed / alpha) * jnp.dot(Q, W, preferred_element_type=jnp.float32)
    return W.T if transpose else W


def orthogonality_error(M: jnp.ndarray) -> jnp.ndarray:
    """||M M^T / alpha - I||_F / rows — diagnostic for tests/metrics."""
    W = M.T if M.shape[0] > M.shape[1] else M
    P = jnp.dot(W, W.T, preferred_element_type=jnp.float32)
    alpha = jnp.sum(jnp.square(P)) / jnp.maximum(jnp.trace(P), 1e-20)
    I = jnp.eye(P.shape[0], dtype=P.dtype)
    return jnp.linalg.norm(P / alpha - I) / P.shape[0]


def constrain_semi_orthogonal(params, nu: float = 0.25):
    """Apply the constraint step to every parameter whose path contains
    'linear_pre' (the factored bottleneck kernels in TDNNF).  Pure function
    of the param pytree; call every N train steps."""

    def maybe(path, x):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if any("linear_pre" in str(n) for n in names) and x.ndim >= 2:
            # conv kernels are [k, in, out]: constrain the flattened
            # (k*in) -> out linear map, Kaldi ConstrainOrthonormal semantics
            flat = x.reshape(-1, x.shape[-1])
            return semi_orthogonal_step(flat, nu).reshape(x.shape)
        return x

    return jax.tree_util.tree_map_with_path(maybe, params)
