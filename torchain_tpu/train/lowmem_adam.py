"""Adam with bf16-resident moments: the optimizer-traffic lever.

BENCH_NOTES r3 attributed 0.62 ms/step of the conformer trigram headline
to adam state movement: both moments live in f32, so each step streams
6 full parameter-sized f32 tensors for the update math (m, v in+out,
param in+out) plus the gradient.  Storing BOTH moments in bf16 halves
the moment traffic; all arithmetic stays f32 (moments are decoded,
updated, re-encoded per step), so only the STORAGE rounds.

Numerics: bf16 has ~8 mantissa bits.  For the first moment (a smoothed
gradient) this is ordinary mixed-precision practice.  For the second
moment, the quantity consumed is 1/(sqrt(v)+eps): a bf16 relative error
of ~0.4% in v becomes ~0.2% in the step size — far below the run-to-run
trajectory noise of chain training (tools/ab_lowmem_adam.py A/Bs the
objf trajectory; BENCH_NOTES r5).  Kaldi's own optimizer keeps NO
moments at all (NG-SGD), so parity is not at stake.

Use via TrainerConfig(optimizer="adam-lowmem") or
`scale_by_adam_lowmem()` directly in an optax chain.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class ScaleByAdamLowmemState(NamedTuple):
    count: jnp.ndarray  # int32 scalar
    mu: optax.Updates  # bf16 pytree
    nu: optax.Updates  # bf16 pytree


def scale_by_adam_lowmem(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    state_dtype=jnp.bfloat16,
) -> optax.GradientTransformation:
    """optax.scale_by_adam with both moments STORED in `state_dtype`
    (f32 math, storage-only rounding)."""

    def init_fn(params):
        mu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=state_dtype), params
        )
        nu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=state_dtype), params
        )
        return ScaleByAdamLowmemState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1**c
        bc2 = 1.0 - b2**c

        def upd(g, m, v):
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
            v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * jnp.square(g32)
            step = (m32 / bc1) / (jnp.sqrt(v32 / bc2) + eps)
            return step.astype(g.dtype), m32.astype(state_dtype), v32.astype(
                state_dtype
            )

        flat_u, treedef = jax.tree.flatten(updates)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_v = treedef.flatten_up_to(state.nu)
        out = [upd(g, m, v) for g, m, v in zip(flat_u, flat_m, flat_v)]
        new_updates = treedef.unflatten([o[0] for o in out])
        new_mu = treedef.unflatten([o[1] for o in out])
        new_nu = treedef.unflatten([o[2] for o in out])
        return new_updates, ScaleByAdamLowmemState(count, new_mu, new_nu)

    return optax.GradientTransformation(init_fn, update_fn)


def adam_lowmem(
    learning_rate, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    return optax.chain(
        scale_by_adam_lowmem(b1=b1, b2=b2, eps=eps),
        optax.scale_by_learning_rate(learning_rate),
    )
