"""graphs — host-side compilers from linguistic structure to packed arrays.

Replaces the offline graph machinery torchain consumed from Kaldi
(SURVEY.md sections 2.2 and 3.5): HMM topology + context tree
(kaldi/src/hmm/), the phone-LM estimator (kaldi/src/chain/language-model.cc),
the denominator-graph compiler (kaldi/src/chain/chain-den-graph.cc), and the
supervision compiler (kaldi/src/chain/chain-supervision.cc).  Everything here
runs on host CPU at setup/data-loading time and emits packed numpy/jnp arrays
for the device kernels in `torchain_tpu.ops`.
"""

from torchain_tpu.graphs.topology import ChainTopology, ContextTree
from torchain_tpu.graphs.transition_model import (
    HmmTopology,
    TransitionModel,
    chain_transition_model,
    read_ali_ark,
    read_transition_model,
    write_ali_ark,
    write_transition_model,
)
from torchain_tpu.graphs.nnet3 import (
    AmNnet,
    Nnet,
    read_am_nnet,
    write_am_nnet,
)
from torchain_tpu.graphs.tied_tree import (
    TiedTree,
    TreeStats,
    accumulate_tree_stats,
    build_tied_tree,
    read_kaldi_tree,
    write_kaldi_tree,
)
from torchain_tpu.graphs.phone_lm import PhoneLmOptions, estimate_phone_lm
from torchain_tpu.graphs.hclg import Lexicon, make_hclg
from torchain_tpu.graphs.debruijn import (
    DeBruijnDenGraph,
    make_debruijn_den_graph,
    materialize_lift_fst,
)
from torchain_tpu.graphs.den_graph import (
    DenGraph,
    DenseDenGraph,
    compile_den_graph,
    make_den_fst,
    make_dense_den_graph,
    make_normalization_fst,
)
from torchain_tpu.graphs.e2e import (
    E2eSupervision,
    compile_e2e_supervision,
    make_e2e_supervision_fst,
    pad_and_stack_e2e,
    transcript_to_e2e_fst,
)
from torchain_tpu.graphs.lattice_supervision import (
    PhoneLattice,
    lattice_to_supervision_fst,
)
from torchain_tpu.graphs.supervision import (
    Supervision,
    SupervisionOptions,
    alignment_to_supervision_fst,
    compile_supervision,
    split_alignment_into_chunks,
)

__all__ = [
    "ChainTopology",
    "ContextTree",
    "HmmTopology",
    "TransitionModel",
    "chain_transition_model",
    "read_ali_ark",
    "read_transition_model",
    "write_ali_ark",
    "write_transition_model",
    "AmNnet",
    "Nnet",
    "read_am_nnet",
    "write_am_nnet",
    "TiedTree",
    "TreeStats",
    "accumulate_tree_stats",
    "build_tied_tree",
    "read_kaldi_tree",
    "write_kaldi_tree",
    "PhoneLmOptions",
    "estimate_phone_lm",
    "DenGraph",
    "DenseDenGraph",
    "compile_den_graph",
    "make_den_fst",
    "make_dense_den_graph",
    "make_normalization_fst",
    "E2eSupervision",
    "compile_e2e_supervision",
    "make_e2e_supervision_fst",
    "pad_and_stack_e2e",
    "transcript_to_e2e_fst",
    "PhoneLattice",
    "lattice_to_supervision_fst",
    "Supervision",
    "SupervisionOptions",
    "alignment_to_supervision_fst",
    "compile_supervision",
    "split_alignment_into_chunks",
]
