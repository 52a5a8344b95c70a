"""ops — device-side chain-loss computation.

  oracle.py        exact NumPy reference fwd-bwd (float64, log-space) — the
                   ground truth every kernel is tested against
  device_graphs.py jnp pytree containers for packed graphs
  den_scan.py      v1 JAX log-semiring denominator scan (sparse arc gather)
  den_dense.py     v2 MXU dense-matmul denominator (Moore factorization)
  den_debruijn.py  v3 gather-free de Bruijn lift (dense n-gram recursion)
  den_resident.py  v4 VMEM-resident Pallas kernel (production fast path)
  num_scan.py      numerator scoring over packed supervision tensors
  chain_loss.py    the user-facing fused objective with jax.custom_vjp
"""

from torchain_tpu.ops.chain_loss import ChainLossOptions, ChainResults, chain_loss
from torchain_tpu.ops.den_debruijn import DeviceDeBruijnDenGraph
from torchain_tpu.ops.den_resident import DeviceResidentDenGraph
from torchain_tpu.ops.device_graphs import (
    DeviceDenGraph,
    DeviceDenseDenGraph,
    DeviceSupervision,
    auto_den_graph,
)

__all__ = [
    "ChainLossOptions",
    "ChainResults",
    "chain_loss",
    "DeviceDenGraph",
    "DeviceDeBruijnDenGraph",
    "DeviceResidentDenGraph",
    "auto_den_graph",
    "DeviceDenseDenGraph",
    "DeviceSupervision",
]
