"""parallel — mesh construction and sharding rules.

The reference has NO distributed machinery (SURVEY.md section 2.3: single
GPU, no NCCL/MPI); this layer is the TPU-native scaling story built in its
place: a (data, model) `jax.sharding.Mesh`, NamedSharding rules for batches
and parameters, and jit-compiled global-array semantics where XLA inserts
psum/all-gather collectives over ICI/DCN automatically (GSPMD).
"""

from torchain_tpu.parallel.mesh import (
    MeshConfig,
    batch_sharding,
    global_batch_from_local,
    make_mesh,
    param_sharding_rules,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    "MeshConfig",
    "batch_sharding",
    "global_batch_from_local",
    "make_mesh",
    "param_sharding_rules",
    "replicated",
    "shard_batch",
    "shard_params",
]
