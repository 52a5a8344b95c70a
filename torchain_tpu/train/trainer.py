"""Trainer: the end-to-end chain training driver.

Parity target: the torchain example recipe's training stage ([R]
example/train.py — argparse, per-iteration ChainResults printing, periodic
checkpoints; SURVEY.md sections 2.1 and 5), rebuilt with: device-mesh
sharding, optax optimizers, periodic semi-orthogonal constraint (TDNN-F),
structured JSONL metrics, and orbax checkpointing with full train-state
(model + optimizer + loader position) restore.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from torchain_tpu.data.loader import ChainBatch, ChainDataset
from torchain_tpu.data.prefetch import Prefetcher
from torchain_tpu.models import constrain_semi_orthogonal
from torchain_tpu.ops import ChainLossOptions, ChainResults
from torchain_tpu.ops.device_graphs import DeviceSupervision
from torchain_tpu.parallel import (
    MeshConfig,
    batch_sharding,
    global_batch_from_local,
    make_mesh,
    replicated,
)
from torchain_tpu.train.state import create_train_state
from torchain_tpu.train.step import make_eval_step, make_train_step


@dataclasses.dataclass
class TrainerConfig:
    lr: float = 1e-3
    #: Kaldi-recipe exponential LR decay: when set (> 0) the learning rate
    #: decays from `lr` to `lr_final` over `lr_decay_steps` optimizer
    #: steps (lr(t) = lr * (lr_final/lr)^(t/steps), the nnet3 train.py
    #: schedule), then holds at lr_final
    lr_final: float = 0.0
    lr_decay_steps: int = 0
    momentum: float = 0.9
    optimizer: str = "adam"  # adam | sgd | ngsgd (Kaldi natural-gradient SGD)
    grad_clip: float = 5.0
    #: accumulate gradients over N micro-batches before each optimizer
    #: update (optax.MultiSteps); the effective batch is N * batch_size
    #: with the same per-step device memory
    grad_accum_steps: int = 1
    loss: ChainLossOptions = dataclasses.field(default_factory=ChainLossOptions)
    batch_size: int = 16
    num_epochs: int = 2
    #: apply the semi-orthogonal constraint every N steps (0 = never)
    semi_ortho_every: int = 4
    #: cycle the loader's input frame shift through 0..fsf-1 across epochs
    #: (Kaldi's frame-shift egs augmentation; off reproduces round-1 runs)
    frame_shift_cycle: bool = False
    #: Kaldi --trainer.dropout-schedule, e.g. "0,0@0.20,0.5@0.50,0":
    #: comma-separated value[@data_fraction] knots, piecewise-linear in the
    #: fraction of training processed; "" disables dropout entirely
    dropout_schedule: str = ""
    #: Kaldi max-change: cap each component's parameter delta (post-LR) at
    #: this 2-norm (recipe default 0.75; 0 = off)
    max_change_per_component: float = 0.0
    #: Kaldi --trainer.max-param-change: cap the global update 2-norm
    #: (recipe default 2.0; 0 = off)
    max_param_change: float = 0.0
    #: Kaldi --trainer.backstitch-training-scale (0 = off): two-pass
    #: updates, -scale then +(1+scale), on every `backstitch_interval`-th
    #: step (see train/step.py make_backstitch_step)
    backstitch_scale: float = 0.0
    backstitch_interval: int = 1
    log_every: int = 20
    #: thread-pool width for host-side batch assembly
    #: (ChainDataset.batches num_threads).  Default 0 = serial: on this
    #: 4-core host the pool measured strictly slower (12.6 -> 26 ms/batch
    #: at 4 threads, production scale) — pad/stack is memory-bandwidth
    #: bound and the pool fights the prefetch + device-dispatch threads.
    #: Raise only on many-core hosts after measuring.
    loader_threads: int = 0
    checkpoint_dir: str | None = None
    checkpoint_every: int = 500
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    use_xent: bool = True


def make_optimizer(cfg: TrainerConfig) -> optax.GradientTransformation:
    lr = cfg.lr
    if cfg.lr_final > 0.0 and cfg.lr_decay_steps > 0:
        lr = optax.exponential_decay(
            init_value=cfg.lr,
            transition_steps=cfg.lr_decay_steps,
            decay_rate=cfg.lr_final / cfg.lr,
            end_value=cfg.lr_final,
        )
    if cfg.optimizer == "adam":
        opt = optax.adam(lr)
    elif cfg.optimizer == "adam-lowmem":
        # bf16-resident moments: halves optimizer HBM traffic
        # (train/lowmem_adam.py; the conformer headline's optimizer term)
        from torchain_tpu.train.lowmem_adam import adam_lowmem

        opt = adam_lowmem(lr)
    elif cfg.optimizer == "sgd":
        opt = optax.sgd(lr, momentum=cfg.momentum)
    elif cfg.optimizer == "ngsgd":
        # Kaldi chain-recipe parity: natural-gradient preconditioning in
        # front of plain (momentum) SGD — see train/ngsgd.py
        from torchain_tpu.train.ngsgd import natural_gradient

        opt = optax.chain(
            natural_gradient(), optax.sgd(lr, momentum=cfg.momentum)
        )
    else:
        raise ValueError(cfg.optimizer)
    if cfg.grad_clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)
    if cfg.max_change_per_component > 0 or cfg.max_param_change > 0:
        # LAST in the chain: max-change bounds the post-LR parameter
        # motion, not the gradient
        opt = optax.chain(
            opt,
            max_change(cfg.max_change_per_component, cfg.max_param_change),
        )
    if cfg.grad_accum_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=cfg.grad_accum_steps)
    return opt


def max_change(per_component: float = 0.75, global_change: float = 2.0):
    """Kaldi max-change update clipping as a terminal optax transform.

    Behavioral reference: every chain recipe trains with per-component
    max-change=0.75 and --trainer.max-param-change=2.0 ([K]
    nnet-utils.cc ScaleBatchnormStats/UpdatableComponent max_change_ +
    steps/libs/nnet3/train): each component's parameter DELTA (post-LR)
    is rescaled to 2-norm <= per_component, then the whole update is
    rescaled so the global 2-norm <= global_change.  Unlike gradient
    clipping this bounds the actual parameter motion per step, which is
    what keeps early chain training from diverging at recipe LRs.
    Place LAST in the optax chain (after the LR is applied)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        if per_component > 0:
            def clip_leaf(u):
                n = jnp.sqrt(jnp.sum(jnp.square(u.astype(jnp.float32))))
                scale = jnp.minimum(1.0, per_component / jnp.maximum(n, 1e-30))
                return (u.astype(jnp.float32) * scale).astype(u.dtype)

            updates = jax.tree.map(clip_leaf, updates)
        if global_change > 0:
            g = optax.global_norm(updates)
            scale = jnp.minimum(1.0, global_change / jnp.maximum(g, 1e-30))
            updates = jax.tree.map(
                lambda u: (u.astype(jnp.float32) * scale).astype(u.dtype),
                updates,
            )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def parse_dropout_schedule(schedule: str):
    """Kaldi dropout-schedule string -> callable(progress in [0,1]) -> rate.

    Format ([K] steps/libs/nnet3/train/common.py, self-described in
    TrainerConfig): comma-separated ``value`` or ``value@fraction`` knots;
    an omitted fraction pins the first knot to 0.0 and the last to 1.0,
    intermediate knots must carry fractions; linear interpolation between
    knots."""
    parts = [p.strip() for p in schedule.split(",") if p.strip()]
    if not parts:
        return lambda progress: 0.0
    knots: list[tuple[float, float]] = []
    for i, p in enumerate(parts):
        if "@" in p:
            v, f = p.split("@")
            knots.append((float(f), float(v)))
        elif i == 0:
            knots.append((0.0, float(p)))
        elif i == len(parts) - 1:
            knots.append((1.0, float(p)))
        else:
            raise ValueError(
                f"dropout-schedule knot {p!r} needs an @fraction "
                f"(only first/last may omit it): {schedule!r}"
            )
    if knots[0][0] > 0.0:
        knots.insert(0, (0.0, knots[0][1]))
    if knots[-1][0] < 1.0:
        knots.append((1.0, knots[-1][1]))
    fr = np.asarray([k[0] for k in knots])
    if (np.diff(fr) < 0).any():
        raise ValueError(f"dropout-schedule fractions must be sorted: {schedule!r}")
    val = np.asarray([k[1] for k in knots])

    def rate(progress: float) -> float:
        return float(np.interp(np.clip(progress, 0.0, 1.0), fr, val))

    return rate


def den_fingerprint(den_device) -> str:
    """Content hash of a device denominator graph (arrays + static meta).
    A resumed run whose den graph changed would silently optimize a
    different objective; checkpoints record this and refuse such resumes."""
    import hashlib

    h = hashlib.sha256()
    for leaf in jax.tree.leaves(den_device):
        h.update(np.asarray(leaf).tobytes())
    h.update(repr(jax.tree.structure(den_device)).encode())
    return h.hexdigest()[:16]


def tree_fingerprint(tree) -> str:
    """Content hash of a pdf map (ContextTree params or TiedTree table)."""
    import hashlib

    if hasattr(tree, "pdf_map"):
        return hashlib.sha256(np.asarray(tree.pdf_map).tobytes()).hexdigest()[:16]
    return (
        f"ContextTree({tree.num_phones},{tree.context_width},"
        f"{getattr(tree, 'tie_self_loops', True)})"
    )


def _config_to_jsonable(cfg) -> dict:
    out = dataclasses.asdict(cfg)

    def clean(x):
        if isinstance(x, dict):
            return {k: clean(v) for k, v in x.items()}
        if isinstance(x, (np.floating, np.integer)):
            return x.item()
        return x

    return clean(out)


class Trainer:
    def __init__(self, model, den_device, cfg: TrainerConfig, example_feats, tree=None):
        self.cfg = cfg
        self.model = model
        self.den = den_device
        self.fingerprints = dict(
            den=den_fingerprint(den_device),
            tree=tree_fingerprint(tree) if tree is not None else None,
            model=type(model).__name__,
        )
        self.mesh = make_mesh(cfg.mesh)
        self.tx = make_optimizer(cfg)
        self.state = create_train_state(model, jnp.asarray(example_feats), self.tx)
        self._dropout_fn = (
            parse_dropout_schedule(cfg.dropout_schedule)
            if cfg.dropout_schedule
            else None
        )
        # a data axis > 1 routes the loss fwd-bwd through shard_map so
        # every chip runs the single-chip resident kernels on its own
        # batch shard (ops/sharded.py)
        self.loss_mesh = self.mesh if self.mesh.shape["data"] > 1 else None
        self.train_step = make_train_step(
            cfg.loss, use_xent=cfg.use_xent,
            dropout=self._dropout_fn is not None, mesh=self.loss_mesh,
        )
        self.backstitch_step = None
        if cfg.backstitch_scale > 0:
            if self._dropout_fn is not None:
                raise ValueError(
                    "backstitch_scale and dropout_schedule are mutually "
                    "exclusive (the backstitch step carries no dropout rng)"
                )
            from torchain_tpu.train.step import make_backstitch_step

            self.backstitch_step = make_backstitch_step(
                cfg.loss, cfg.backstitch_scale, use_xent=cfg.use_xent,
                mesh=self.loss_mesh,
            )
        # per-step dropout noise derived by fold_in(step): deterministic
        # under resume, identical across hosts (same global step)
        self._dropout_base_rng = jax.random.PRNGKey(0)
        self._batches_per_epoch: int | None = None
        self.results = ChainResults()
        self.metrics_log: list[dict] = []
        self.start_epoch = 0
        self.current_epoch = 0
        self.batch_in_epoch = 0
        self.skip_batches = 0
        self._sup_caps = None
        self._ckpt_mgr = None
        if cfg.checkpoint_dir:
            import orbax.checkpoint as ocp

            path = pathlib.Path(cfg.checkpoint_dir).absolute()
            path.mkdir(parents=True, exist_ok=True)
            self._ckpt_mgr = ocp.CheckpointManager(
                path, options=ocp.CheckpointManagerOptions(max_to_keep=3)
            )

    # -- sharding ---------------------------------------------------------

    def _put_batch(self, batch: ChainBatch):
        from torchain_tpu.data.materialize import PlacedBatch
        from torchain_tpu.graphs.e2e import E2eSupervision
        from torchain_tpu.ops.num_e2e import DeviceE2eSupervision

        if isinstance(batch, PlacedBatch):
            # device-materialized batch: arrays are already resident
            return batch.feats, batch.sup
        if isinstance(batch.sup, E2eSupervision):
            sup_host = DeviceE2eSupervision.from_host(batch.sup)
        else:
            sup_host = DeviceSupervision.from_host(batch.sup)
        if jax.process_count() > 1:
            # multi-host: batch rows are process-local shards of the global
            # batch; assemble global jax.Arrays spanning all hosts
            out = global_batch_from_local(
                self.mesh, (jnp.asarray(batch.feats), sup_host)
            )
            return out
        # batch axis must divide the data-mesh size to shard; fall back to
        # replicated placement otherwise (tiny/tail batches)
        if batch.feats.shape[0] % self.mesh.shape["data"] == 0:
            bsh = lambda x: jax.device_put(x, batch_sharding(self.mesh, np.ndim(x)))
        else:
            bsh = lambda x: jax.device_put(x, replicated(self.mesh))
        feats = bsh(jnp.asarray(batch.feats))
        sup = jax.tree.map(bsh, sup_host)
        return feats, sup

    # -- checkpointing ----------------------------------------------------

    def _run_config_path(self) -> pathlib.Path:
        return pathlib.Path(self.cfg.checkpoint_dir).absolute() / "run_config.json"

    def save_run_config(self):
        """Serialize the run config + den/tree fingerprints next to the
        checkpoints (SURVEY.md section 5 config row: configs serialized
        into checkpoints; resume verifies them)."""
        payload = dict(
            config=_config_to_jsonable(self.cfg),
            fingerprints=self.fingerprints,
        )
        self._run_config_path().write_text(json.dumps(payload, indent=2))

    @staticmethod
    def load_run_config(checkpoint_dir: str) -> dict | None:
        p = pathlib.Path(checkpoint_dir).absolute() / "run_config.json"
        if not p.exists():
            return None
        return json.loads(p.read_text())

    def save_checkpoint(self):
        if self._ckpt_mgr is None:
            return
        if not self._run_config_path().exists():
            self.save_run_config()
        import orbax.checkpoint as ocp

        payload = dict(
            params=self.state.params,
            batch_stats=self.state.batch_stats,
            opt_state=self.state.opt_state,
            step=self.state.step,
            epoch=np.asarray(self.current_epoch, np.int32),
            batch_in_epoch=np.asarray(self.batch_in_epoch, np.int32),
        )
        self._ckpt_mgr.save(
            int(self.state.step), args=ocp.args.StandardSave(payload)
        )
        self._ckpt_mgr.wait_until_finished()

    def restore_checkpoint(self) -> bool:
        if self._ckpt_mgr is None or self._ckpt_mgr.latest_step() is None:
            return False
        saved = self.load_run_config(self.cfg.checkpoint_dir)
        if saved is not None:
            for key in ("den", "tree"):
                old = saved.get("fingerprints", {}).get(key)
                new = self.fingerprints.get(key)
                if old is not None and new is not None and old != new:
                    raise ValueError(
                        f"refusing to resume: {key} fingerprint changed "
                        f"({old} -> {new}); the checkpoint was trained "
                        "against a different graph/tree — restart from "
                        "scratch or restore the original data prep"
                    )
        import orbax.checkpoint as ocp

        target = dict(
            params=self.state.params,
            batch_stats=self.state.batch_stats,
            opt_state=self.state.opt_state,
            step=self.state.step,
            epoch=np.asarray(0, np.int32),
            batch_in_epoch=np.asarray(0, np.int32),
        )
        restored = self._ckpt_mgr.restore(
            self._ckpt_mgr.latest_step(),
            args=ocp.args.StandardRestore(target),
        )
        # exact resume: same epoch, skipping already-consumed batches —
        # shuffling is a pure function of (seed, epoch), so the skipped
        # prefix is identical to the original run's
        self.start_epoch = int(restored.pop("epoch"))
        self.skip_batches = int(restored.pop("batch_in_epoch"))
        self.current_epoch = self.start_epoch
        # orbax restores onto a single device; re-place on the mesh
        restored = jax.device_put(restored, replicated(self.mesh))
        self.state = self.state.replace(**restored)
        return True

    # -- main loop --------------------------------------------------------

    def _flush_metrics(self, pending: list) -> dict | None:
        """Materialize buffered device metrics to host (ONE sync for the
        whole buffer) and feed ChainResults; returns the last step's host
        dict.  Keeping per-step aux on-device lets step N+1 dispatch while
        step N's transfer is in flight (ADVICE r1: float(v) per step forced
        a device sync that serialized host prep with device compute)."""
        if not pending:
            return None
        if jax.process_count() > 1:
            # replicated metrics span non-addressable devices; read the
            # locally-addressable replica of each scalar
            host_all = [
                {
                    k: np.asarray(v.addressable_data(0))
                    if isinstance(v, jax.Array)
                    else v
                    for k, v in m.items()
                }
                for _, _, m in pending
            ]
        else:
            host_all = jax.device_get([m for _, _, m in pending])
        last = None
        for (step, epoch, _), m in zip(pending, host_all):
            host = {k: float(v) for k, v in m.items()}
            self.results.add(host)
            last = (step, epoch, host)
        pending.clear()
        step, epoch, host = last
        host["step"] = step
        host["epoch"] = epoch
        return host

    def fit(self, dataset: ChainDataset, log_fn=print) -> ChainResults:
        cfg = self.cfg
        t_start = time.time()
        frames_done = 0
        # one sync at loop entry; train_step increments by exactly 1
        step = int(self.state.step)
        pending: list = []
        with self.mesh:
            for epoch in range(self.start_epoch, cfg.num_epochs):
                self.current_epoch = epoch
                self.batch_in_epoch = 0
                if cfg.frame_shift_cycle and hasattr(dataset, "frame_shift"):
                    # Kaldi frame-shift augmentation (nnet3-chain-copy-egs
                    # --frame-shift=epoch%fsf in steps/nnet3/chain/train.py):
                    # each epoch samples a different input phase of the
                    # subsampled output grid; deterministic in epoch, so
                    # mid-epoch resume reproduces it
                    dataset.frame_shift = epoch % dataset.fsf
                # fixed supervision padding for BOTH single- and multi-host
                # runs: per-batch-derived static shapes (incl. steady_arcs)
                # would force a fresh XLA compile whenever a batch lands in
                # a different bucket — minutes each through the TPU relay
                if self._sup_caps is None and hasattr(dataset, "estimate_sup_caps"):
                    self._sup_caps = dataset.estimate_sup_caps()
                if jax.process_count() > 1:
                    batch_iter = dataset.batches(
                        cfg.batch_size,
                        epoch=epoch,
                        process_index=jax.process_index(),
                        process_count=jax.process_count(),
                        sup_caps=self._sup_caps,
                        num_threads=cfg.loader_threads,
                    )
                elif self._sup_caps is not None:
                    batch_iter = dataset.batches(
                        cfg.batch_size,
                        epoch=epoch,
                        sup_caps=self._sup_caps,
                        num_threads=cfg.loader_threads,
                    )
                else:  # e.g. E2eChainDataset (no caps estimation/param)
                    batch_iter = dataset.batches(
                        cfg.batch_size, epoch=epoch, num_threads=cfg.loader_threads
                    )
                def _put_iter(it, skip_until: int):
                    # device placement (DeviceSupervision.from_host + H2D
                    # copies) runs on the prefetch thread too, overlapping
                    # with the device step — jnp.asarray/device_put are
                    # thread-safe and async
                    for i, b in enumerate(it):
                        yield b, (None if i < skip_until else self._put_batch(b))

                skip_until = (
                    self.skip_batches if epoch == self.start_epoch else 0
                )
                for bi, (batch, placed) in enumerate(
                    Prefetcher(_put_iter(batch_iter, skip_until))
                ):
                    if placed is None:
                        continue
                    self.batch_in_epoch = bi + 1
                    feats, sup = placed
                    if self._dropout_fn is not None:
                        # progress = fraction of training data processed
                        # (Kaldi schedules on the same quantity); within-
                        # epoch fraction needs the epoch's batch count,
                        # known after the first epoch
                        frac = (
                            bi / self._batches_per_epoch
                            if self._batches_per_epoch
                            else 0.0
                        )
                        progress = (epoch + frac) / max(cfg.num_epochs, 1)
                        rate = jnp.asarray(
                            self._dropout_fn(progress), jnp.float32
                        )
                        rng = jax.random.fold_in(self._dropout_base_rng, step)
                        self.state, metrics = self.train_step(
                            self.state, feats, self.den, sup, rate, rng
                        )
                    elif self.backstitch_step is not None and (
                        step % max(cfg.backstitch_interval, 1) == 0
                    ):
                        self.state, metrics = self.backstitch_step(
                            self.state, feats, self.den, sup
                        )
                    else:
                        self.state, metrics = self.train_step(
                            self.state, feats, self.den, sup
                        )
                    step += 1
                    if cfg.semi_ortho_every and step % cfg.semi_ortho_every == 0:
                        self.state = self.state.replace(
                            params=constrain_semi_orthogonal(self.state.params)
                        )
                    pending.append((step, epoch, metrics))
                    frames_done += batch.feats.shape[0] * batch.sup.num_frames
                    if step % cfg.log_every == 0:
                        host = self._flush_metrics(pending)
                        host["wall_s"] = time.time() - t_start
                        host["frames_per_s"] = frames_done / host["wall_s"]
                        self.metrics_log.append(host)
                        log_fn(
                            f"step {step} epoch {epoch}: "
                            f"objf={host['objf']:.4f} loss={host['loss']:.4f} "
                            f"grad={host['grad_norm']:.3f}"
                        )
                    if (
                        self._ckpt_mgr is not None
                        and step % cfg.checkpoint_every == 0
                    ):
                        self.save_checkpoint()
                if self._batches_per_epoch is None and self.batch_in_epoch:
                    self._batches_per_epoch = self.batch_in_epoch
            if hasattr(dataset, "frame_shift"):
                dataset.frame_shift = 0  # leave the loader eval-clean
            self._flush_metrics(pending)
            if self._ckpt_mgr is not None:
                self.save_checkpoint()
        return self.results

    def combine(self, last_n: int = 3) -> int:
        """Kaldi 'combine' stage (steps/nnet3/chain/train.py final-model
        combination role): average the parameters of the last `last_n`
        checkpoints into the live state.  Kaldi searches convex weights
        over the last iterations' models to maximize train objf; uniform
        averaging is the modern equivalent (checkpoint averaging), and the
        caller can evaluate() the result against the pre-combine model.
        Returns the number of checkpoints combined."""
        if self._ckpt_mgr is None:
            return 0
        import orbax.checkpoint as ocp

        steps = sorted(self._ckpt_mgr.all_steps())[-max(1, last_n):]
        if len(steps) < 2:
            return len(steps)
        target = dict(
            params=self.state.params,
            batch_stats=self.state.batch_stats,
            opt_state=self.state.opt_state,
            step=self.state.step,
            epoch=np.asarray(0, np.int32),
            batch_in_epoch=np.asarray(0, np.int32),
        )
        acc = None
        for s in steps:
            restored = self._ckpt_mgr.restore(
                s, args=ocp.args.StandardRestore(target)
            )
            p = restored["params"]
            acc = p if acc is None else jax.tree.map(jnp.add, acc, p)
        avg = jax.tree.map(lambda x: x / len(steps), acc)
        avg = jax.device_put(avg, replicated(self.mesh))
        self.state = self.state.replace(params=avg)
        return len(steps)

    def evaluate(self, dataset: ChainDataset, max_batches: int = 0) -> ChainResults:
        """Validation pass (nnet3-chain-compute-prob parity): objf over a
        held-out dataset, no parameter updates."""
        if not hasattr(self, "_eval_step"):
            self._eval_step = make_eval_step(self.cfg.loss, mesh=self.loss_mesh)
        results = ChainResults()
        with self.mesh:
            for i, batch in enumerate(
                dataset.batches(self.cfg.batch_size, shuffle=False, drop_last=False)
            ):
                if max_batches and i >= max_batches:
                    break
                feats, sup = self._put_batch(batch)
                aux = self._eval_step(self.state, feats, self.den, sup)
                results.add({k: float(v) for k, v in aux.items()})
        return results

    def dump_metrics(self, path: str):
        with open(path, "w") as f:
            for m in self.metrics_log:
                f.write(json.dumps(m) + "\n")
