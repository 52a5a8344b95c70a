"""Data-parallel composition of the chain-loss kernels via shard_map.

SURVEY.md §2.3 rebuild plan: the denominator/numerator fwd-bwd runs
per-chip over the batch shard of the `data` mesh axis, with the loss
statistics combined by the plain XLA reductions the caller already does
(sequences are independent in both recursions, so the kernels need no
cross-chip communication at all — the only collectives are the grad /
stat psums GSPMD inserts outside).

Why shard_map instead of plain GSPMD: the VMEM-resident Pallas kernels
(ops/den_resident.py, ops/num_resident.py) are custom calls XLA has no
partitioning rule for — under a data-sharded jit GSPMD would all-gather
the batch and replicate the whole kernel on every chip (DESIGN.md §6).
`shard_map` makes the partitioning explicit: the kernel body is traced
once per shard with LOCAL shapes (B/data_shards sequences), graph
tensors replicated, so each chip runs exactly the single-chip fast path
on its own rows.  The r4 gates that forced multi-device runs onto the
3-10x-slower dense/scan fallbacks are lifted when execution goes through
this wrapper.

`in_sharded_region()` is how the per-shard kernels know they are inside
the wrapper: dispatch gates that would otherwise check
`len(jax.devices()) == 1` (num_scan._use_resident) consult it at trace
time — the context var is set exactly while the shard_map body traces.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

_IN_SHARD = contextvars.ContextVar("torchain_in_shard_map", default=False)


def in_sharded_region() -> bool:
    """True while the shard_map body of chain_logprobs_sharded traces —
    i.e. the current trace sees per-shard (single-chip-like) shapes."""
    return _IN_SHARD.get()


@contextlib.contextmanager
def sharded_region():
    tok = _IN_SHARD.set(True)
    try:
        yield
    finally:
        _IN_SHARD.reset(tok)


def _batch_spec(x):
    return P("data", *([None] * (np.ndim(x) - 1)))


def _sup_specs(sup):
    """Per-field shard specs for a supervision pytree.  Most fields lead
    with the batch axis; the optional kernel-layout tables (`src_k` etc.,
    [T-1, Kr, S, B]) carry it LAST."""
    import dataclasses

    if not dataclasses.is_dataclass(sup):
        return jax.tree.map(_batch_spec, sup)
    specs = {}
    for f in dataclasses.fields(sup):
        v = getattr(sup, f.name)
        if v is None or not hasattr(v, "ndim"):
            continue
        if f.name.endswith("_k"):
            specs[f.name] = P(*([None] * (v.ndim - 1)), "data")
        else:
            specs[f.name] = _batch_spec(v)
    return dataclasses.replace(
        sup, **{k: v for k, v in specs.items()}
    )


def shardable(mesh, batch: int) -> bool:
    """Whether chain_logprobs can run per-shard on this mesh: a real
    `data` axis and a batch it divides evenly (tail batches fall back to
    the replicated GSPMD path)."""
    if mesh is None:
        return False
    data = dict(mesh.shape).get("data", 1)
    return data > 1 and batch % data == 0


def chain_logprobs_sharded(y, den, sup, leaky, mesh):
    """chain_logprobs with the batch axis explicitly sharded over the
    mesh's `data` axis: y [B, T, P] and every supervision tensor split on
    axis 0, den-graph tensors replicated; returns the same global
    (num_logprob [B], den_logprob [B], gamma_num [B, T, P]) triple.

    Per-row math is identical to the unsharded call (each sequence's
    recursion touches only its own rows), so sharded == unsharded holds
    exactly; tests/test_shard_map.py asserts it against the resident
    Pallas kernels in interpret mode."""
    from torchain_tpu.ops.chain_loss import chain_logprobs

    in_specs = (
        P("data", None, None),
        jax.tree.map(lambda _: P(), den),
        _sup_specs(sup),
    )
    out_specs = (P("data"), P("data"), P("data", None, None))

    def inner(y_l, den_l, sup_l):
        with sharded_region():
            return chain_logprobs(y_l, den_l, sup_l, leaky)

    return jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )(y, den, sup)
