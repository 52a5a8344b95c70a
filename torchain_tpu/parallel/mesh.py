"""Device mesh + sharding rules (GSPMD).

Design (scaling-book recipe, SURVEY.md section 2.3 rebuild plan):

  * mesh axes ("data", "model"); data-parallel batch axis over "data",
    tensor-parallel weight sharding over "model" for encoder layers that
    exceed one chip (conformer FFN/attention).
  * denominator-graph tensors and small params are replicated per chip —
    they are a few MB (SURVEY.md section 5 "Distributed communication").
  * everything runs through jit on global arrays: XLA inserts the psum /
    all-gather collectives; there is no hand-written communication.

On multi-host pods, call `jax.distributed.initialize()` before building the
mesh (train.cli does this when JAX_COORDINATOR is set); the same code then
spans hosts with DCN between slices.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    #: -1 = all remaining devices
    data: int = -1
    model: int = 1


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = max(1, cfg.model)
    data = cfg.data if cfg.data > 0 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def param_sharding_rules(
    mesh: Mesh, params, min_shard_size: int = 2**18
) -> "jax.tree_util.PyTreeDef":
    """NamedSharding tree for a parameter pytree: 2-D+ kernels whose largest
    dim is divisible by the model-axis size and whose size exceeds
    `min_shard_size` get sharded along that dim over "model"; everything
    else is replicated.  A simple, explicit GSPMD policy — XLA propagates
    activation shardings from it."""
    m = mesh.shape["model"]

    def rule(x):
        if m == 1 or x.ndim < 2 or x.size < min_shard_size:
            return replicated(mesh)
        axis = int(np.argmax(x.shape))
        if x.shape[axis] % m != 0:
            return replicated(mesh)
        spec = [None] * x.ndim
        spec[axis] = "model"
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(rule, params)


def shard_params(mesh: Mesh, params, min_shard_size: int = 2**18):
    return jax.device_put(params, param_sharding_rules(mesh, params, min_shard_size))


def shard_batch(mesh: Mesh, batch_pytree):
    """Device-put a batch pytree with the leading axis sharded over data."""

    def put(x):
        return jax.device_put(
            x, NamedSharding(mesh, P("data", *([None] * (np.ndim(x) - 1))))
        )

    return jax.tree.map(put, batch_pytree)


def global_batch_from_local(mesh: Mesh, local_pytree):
    """Assemble GLOBAL arrays from per-process LOCAL batch shards.

    Multi-host data parallelism (SURVEY.md section 2.3 rebuild plan): each
    process loads only its rows (ChainDataset.batches with process_index/
    process_count); this stitches them into global jax.Arrays sharded
    ("data", None, ...) over the whole mesh via
    jax.make_array_from_process_local_data, so the jitted train step sees
    one logical batch spanning hosts.  Single-process meshes degenerate to
    a plain sharded device_put."""
    if jax.process_count() == 1:
        return shard_batch(mesh, local_pytree)

    def put(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(put, local_pytree)
