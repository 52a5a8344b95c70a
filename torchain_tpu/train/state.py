"""Train state: params + batchnorm stats + optimizer state."""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class ChainTrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt,
        )


def create_train_state(
    model,
    example_feats,
    tx: optax.GradientTransformation,
    rng=None,
) -> ChainTrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = model.init(rng, example_feats, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return ChainTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )
