"""torchain_tpu — a TPU-native lattice-free MMI ("chain") training framework.

A from-scratch rebuild of the capabilities of `nttcslab-sp/torchain` (a
PyTorch<->Kaldi chain-loss FFI binding; see SURVEY.md for the structural
analysis of the reference, whose algorithmic substance lives in Kaldi's
`src/chain/` library).  Nothing here is a port: the compute path is
JAX/XLA/Pallas, the parallelism story is `jax.sharding` over device meshes,
and the data path is a sharded chunk loader instead of Kaldi egs archives.

Layering (bottom-up), mirroring SURVEY.md section 7:

  fstkit/    minimal acceptor-FST library (no OpenFst)
  graphs/    phone-LM estimator, topology, denominator-graph + supervision
             compilers producing packed jnp arrays
  ops/       chain loss: log-semiring scan + dense-matmul + Pallas kernels
             under jax.custom_vjp
  data/      fbank/MFCC feature extraction, CMVN, chunk loader
  models/    flax TDNN / TDNN-F / conformer encoders with chain+xent heads
  parallel/  mesh construction and sharding rules
  train/     jit-compiled training step, metrics, checkpointing
  eval/      posterior export, Viterbi decoding, WER scoring
  cli/       recipe drivers
"""

__version__ = "0.1.0"

# convenience top-level API (the names a torchain user reaches for first)
from torchain_tpu.ops import (  # noqa: E402
    ChainLossOptions,
    ChainResults,
    auto_den_graph,
    chain_loss,
)

__all__ = ["ChainLossOptions", "ChainResults", "auto_den_graph", "chain_loss"]
