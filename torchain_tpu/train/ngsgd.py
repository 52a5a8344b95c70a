"""Online natural-gradient preconditioning (Kaldi NG-SGD role).

Behavioral reference: Kaldi's ``OnlineNaturalGradient``
(``[K] kaldi/src/nnet3/natural-gradient-online.{h,cc}``) used by every
``NaturalGradientAffineComponent`` in the nnet3 chain recipes, described
in Povey, Zhang & Khudanpur (2015), "Parallel training of DNNs with
natural gradient and parameter averaging".  Kaldi preconditions each
affine layer's gradient on BOTH sides by a damped online estimate of
that side's Fisher factor,

    G' = (F_out + b_out I)^-1  G  (F_in + b_in I)^-1 ,

with the damping chosen as ``alpha * tr(F)/dim`` (``alpha = 4``) so the
preconditioner is invariant to the gradient's overall scale, and the
result rescaled so that ``||G'||_F == ||G||_F`` — the step SIZE is left
to the learning-rate schedule; NG only rotates/re-weights directions.

TPU-native redesign (not a translation): Kaldi maintains rank-limited
(R <= 80) factor updates with an incremental subspace iteration because
2015-era GPU memory and per-minibatch CPU-GPU sync made full covariances
impractical.  On TPU the per-side covariances of every practical layer
(dims up to ~1-2k) are small dense matrices: a full-covariance EMA plus
a periodic exact damped inverse (one small ``linalg.solve`` on the MXU
every ``inverse_period`` steps, under ``lax.cond``) is simpler, exact at
every rank, and jit-friendly (static shapes, no data-dependent control
flow).  Sides wider than ``max_dim`` pass through un-preconditioned
(the Frobenius rescale keeps one-sided preconditioning well-scaled);
1-D parameters (biases, norm scales) pass through, since Kaldi folds
the bias into the affine matrix and gains nothing extra for them.

Exposed as an optax ``GradientTransformation`` so it composes with the
existing clip / LR-decay / MultiSteps machinery:

    tx = optax.chain(natural_gradient(), optax.sgd(lr, momentum=0.0))
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class _Side(NamedTuple):
    """Online Fisher-factor estimate for one side of a 2-D gradient."""

    cov: jnp.ndarray  # [D, D] EMA of the scatter matrix, f32
    inv: jnp.ndarray  # [D, D] damped inverse, refreshed periodically


class NGState(NamedTuple):
    count: jnp.ndarray  # scalar int32 step counter
    sides: Any  # params-shaped pytree of (row _Side | None, col _Side | None)


@dataclasses.dataclass(frozen=True)
class NGOptions:
    #: damping: F_damped = F + alpha * (tr(F)/D) * I  (Kaldi's alpha)
    alpha: float = 4.0
    #: EMA forgetting factor for the Fisher estimate (Kaldi expresses the
    #: same thing as num_samples_history; 0.95 ~ a few hundred minibatches)
    ema: float = 0.95
    #: recompute the damped inverses every N optimizer steps (the EMA
    #: moves slowly; Kaldi's update_period=4 plays the same role)
    inverse_period: int = 4
    #: sides with dim > max_dim are passed through (memory/compute cap;
    #: Kaldi instead caps the RANK at 20-80 — same tradeoff, different axis)
    max_dim: int = 1024


def _as_matrix(g: jnp.ndarray) -> jnp.ndarray:
    """View an N-D kernel as 2-D [receptive_field * in, out].

    Flax stores conv/dense kernels as [..., in, out]; collapsing the
    leading dims mirrors Kaldi's spliced-input affine view of a TDNN
    layer (the affine acts on the concatenated context window).
    """
    return g.reshape(-1, g.shape[-1])


def _eligible(shape, max_dim: int):
    """(row_dim | None, col_dim | None) for a param shape (static)."""
    if len(shape) < 2 or min(shape) < 2:
        return None, None
    rows = 1
    for s in shape[:-1]:
        rows *= s
    cols = shape[-1]
    row = rows if rows <= max_dim else None
    col = cols if cols <= max_dim else None
    return row, col


def _damped_inverse(cov: jnp.ndarray, alpha: float) -> jnp.ndarray:
    d = cov.shape[0]
    damp = alpha * (jnp.trace(cov) / d) + 1e-30
    f = cov + damp * jnp.eye(d, dtype=cov.dtype)
    return jnp.linalg.solve(f, jnp.eye(d, dtype=cov.dtype))


def natural_gradient(opts: NGOptions = NGOptions()) -> optax.GradientTransformation:
    """Two-sided online natural-gradient preconditioner (see module doc)."""

    def init_fn(params):
        def leaf_state(p):
            row, col = _eligible(p.shape, opts.max_dim)

            def side(d: Optional[int]):
                if d is None:
                    return None
                # two distinct buffers: the train step donates its state,
                # and aliased leaves trip XLA's double-donation check
                return _Side(
                    cov=jnp.eye(d, dtype=jnp.float32),
                    inv=jnp.eye(d, dtype=jnp.float32),
                )

            return (side(row), side(col))

        return NGState(
            count=jnp.zeros((), jnp.int32),
            sides=jax.tree.map(
                leaf_state, params, is_leaf=lambda x: hasattr(x, "shape")
            ),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        refresh = (count % opts.inverse_period) == 0

        def leaf_update(g, sides):
            row_side, col_side = sides
            if row_side is None and col_side is None:
                return g, sides
            m = _as_matrix(g).astype(jnp.float32)
            r, c = m.shape

            def upd_side(side: Optional[_Side], scatter) -> Optional[_Side]:
                if side is None:
                    return None
                cov = opts.ema * side.cov + (1.0 - opts.ema) * scatter()
                inv = jax.lax.cond(
                    refresh,
                    lambda cv: _damped_inverse(cv, opts.alpha),
                    lambda cv: side.inv,
                    cov,
                )
                return _Side(cov=cov, inv=inv)

            new_row = upd_side(row_side, lambda: (m @ m.T) / c)
            new_col = upd_side(col_side, lambda: (m.T @ m) / r)
            out = m
            if new_row is not None:
                out = new_row.inv @ out
            if new_col is not None:
                out = out @ new_col.inv
            # Kaldi: rescale so the preconditioned gradient keeps the raw
            # gradient's Frobenius norm — NG chooses direction, LR chooses size
            nrm_in = jnp.sqrt(jnp.sum(m * m))
            nrm_out = jnp.sqrt(jnp.sum(out * out))
            out = out * (nrm_in / jnp.maximum(nrm_out, 1e-30))
            return out.reshape(g.shape).astype(g.dtype), (new_row, new_col)

        flat_g, treedef = jax.tree.flatten(updates)
        flat_s = treedef.flatten_up_to(state.sides)
        new_g, new_s = [], []
        for g, s in zip(flat_g, flat_s):
            ng, ns = leaf_update(g, s)
            new_g.append(ng)
            new_s.append(ns)
        return (
            jax.tree.unflatten(treedef, new_g),
            NGState(count=count, sides=jax.tree.unflatten(treedef, new_s)),
        )

    return optax.GradientTransformation(init_fn, update_fn)
