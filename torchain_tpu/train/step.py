"""The jitted chain training step.

Call-stack parity with the reference hot path (SURVEY.md section 3.3):
model forward (two heads) -> fused chain loss (custom VJP fwd-bwd) ->
grads -> optimizer update, all inside ONE jit so XLA fuses the whole
minibatch into a single device program (the reference crossed
Python->C->CUDA per step; here the boundary is crossed once at jit time).

Under a (data, model) mesh with sharded inputs, jit/GSPMD inserts the
gradient psum over ICI automatically — loss statistics are global sums,
so objf/weight semantics match the single-chip run exactly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from torchain_tpu.ops import ChainLossOptions, chain_loss
from torchain_tpu.ops.device_graphs import DeviceSupervision
from torchain_tpu.train.state import ChainTrainState


def make_train_step(
    loss_opts: ChainLossOptions,
    use_xent: bool = True,
    donate: bool = True,
    dropout: bool = False,
    mesh=None,
):
    """Returns jitted (state, feats, den, sup) -> (state, metrics).

    By default the train state is donated: params/opt-state buffers are
    updated in place (training loops rebind `state = step(state, ...)`),
    halving the peak parameter-side HBM footprint.  Pass donate=False for
    callers that deliberately replay the same state object (timing
    probes).  CPU backends ignore donation.

    With dropout=True the step takes two extra positional args
    (dropout_rate: traced f32 scalar, dropout_rng: PRNG key) and threads
    them into the model — the Kaldi --trainer.dropout-schedule path; the
    scheduled rate changes per step WITHOUT recompiling because
    continuous dropout is an identity at rate 0 (models/tdnn.py)."""

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(
        state: ChainTrainState,
        feats: jnp.ndarray,  # [B, T_in, F]
        den,
        sup: DeviceSupervision,
        dropout_rate=None,
        dropout_rng=None,
    ):
        def loss_fn(params):
            variables = {"params": params}
            apply_kw = {}
            if dropout and dropout_rng is not None:
                apply_kw = dict(
                    dropout_rate=dropout_rate, rngs={"dropout": dropout_rng}
                )
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                (chain_out, xent_out), updates = state.apply_fn(
                    variables,
                    feats,
                    train=True,
                    mutable=["batch_stats"],
                    **apply_kw,
                )
                new_stats = updates["batch_stats"]
            else:
                chain_out, xent_out = state.apply_fn(
                    variables, feats, train=True, **apply_kw
                )
                new_stats = state.batch_stats
            loss, aux = chain_loss(
                chain_out, xent_out if use_xent else None, den, sup, loss_opts,
                mesh=mesh,
            )
            return loss, (aux, new_stats)

        (loss, (aux, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, new_stats)
        metrics = dict(aux)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_eval_step(loss_opts: ChainLossOptions, mesh=None):
    """Returns jitted (state, feats, den, sup) -> metrics (no update)."""

    @jax.jit
    def eval_step(state: ChainTrainState, feats, den, sup):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        chain_out, xent_out = state.apply_fn(variables, feats, train=False)
        _, aux = chain_loss(chain_out, xent_out, den, sup, loss_opts, mesh=mesh)
        return aux

    return eval_step


def make_forward_fn(model):
    """Posterior export path (SURVEY.md section 3.4): jitted inference
    forward returning raw chain-head outputs — chain models decode the raw
    output as pseudo-loglikes with acoustic scale 1.0 and no prior division
    (latgen-faster-mapped usage in chain recipes)."""

    @jax.jit
    def forward(variables, feats):
        chain_out, _ = model.apply(variables, feats, train=False)
        return chain_out

    return forward


def make_backstitch_step(
    loss_opts: ChainLossOptions,
    alpha: float,
    use_xent: bool = True,
    donate: bool = True,
    mesh=None,
):
    """Backstitch training step (Kaldi --trainer.backstitch-training-scale,
    [K] nnet-training.cc NnetTrainer::TrainInternalBackstitch; Wang et
    al. 2017): first a NEGATIVE update scaled -alpha from the current
    params, then a positive update scaled (1+alpha) from the moved point,
    both on the same minibatch — a cheap second-order bias correction the
    LSTM/TDNN-F chain recipes enable at scale ~0.3.

    Realized exactly as Kaldi does, by scaling the effective step of the
    inner optimizer: updates from tx are multiplied by -alpha / (1+alpha)
    AFTER the optimizer transform, so clipping thresholds keep their
    meaning.  The optimizer state advances twice per step (both passes
    see a gradient); use with sgd/ngsgd (momentum 0) for strict recipe
    semantics.  batch_stats keep the SECOND pass's update."""

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def backstitch_step(
        state: ChainTrainState,
        feats: jnp.ndarray,
        den,
        sup: DeviceSupervision,
    ):
        def loss_fn(params, batch_stats):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
                (chain_out, xent_out), updates = state.apply_fn(
                    variables, feats, train=True, mutable=["batch_stats"]
                )
                new_stats = updates["batch_stats"]
            else:
                chain_out, xent_out = state.apply_fn(
                    variables, feats, train=True
                )
                new_stats = batch_stats
            loss, aux = chain_loss(
                chain_out, xent_out if use_xent else None, den, sup, loss_opts,
                mesh=mesh,
            )
            return loss, (aux, new_stats)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        # pass 1: negative step, scale -alpha
        (_, (_, _)), g1 = grad_fn(state.params, state.batch_stats)
        u1, opt1 = state.tx.update(g1, state.opt_state, state.params)
        u1 = jax.tree.map(lambda u: -alpha * u, u1)
        p1 = optax.apply_updates(state.params, u1)

        # pass 2: positive step, scale (1 + alpha), from the moved params
        (loss, (aux, new_stats)), g2 = grad_fn(p1, state.batch_stats)
        u2, opt2 = state.tx.update(g2, opt1, p1)
        u2 = jax.tree.map(lambda u: (1.0 + alpha) * u, u2)
        p2 = optax.apply_updates(p1, u2)

        new_state = state.replace(
            step=state.step + 1,
            params=p2,
            batch_stats=new_stats,
            opt_state=opt2,
        )
        metrics = dict(aux)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(g2)
        return new_state, metrics

    return backstitch_step
