"""Token-passing Viterbi decoder over the phone-level decoding graph.

Behavioral reference: Kaldi's latgen-faster-mapped as used by chain recipes
(SURVEY.md section 3.4): beam decoding over HCLG with acoustic scale 1.0
and no prior division, reading the best path's output labels.  Scope per
SURVEY.md section 7 hard-part 4: best-path decoding (no lattices yet) over
the lexicon-free phone graph (words == phones for the current corpora);
vectorized numpy host implementation with per-frame beam pruning.
A C++ drop-in for large graphs lives in csrc/ (same packed format).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from torchain_tpu.fstkit import Fst
from torchain_tpu.fstkit.fst import NEG_INF
from torchain_tpu.graphs.den_graph import expand_lm_to_hmm
from torchain_tpu.graphs.topology import ChainTopology, ContextTree


@dataclasses.dataclass
class DecodingGraph:
    """Packed arc tensors, sorted by dst (for per-frame segment max)."""

    num_states: int
    num_pdfs: int
    src: np.ndarray  # int32 [A]
    dst: np.ndarray  # int32 [A]
    pdf: np.ndarray  # int32 [A]
    weight: np.ndarray  # float32 [A] graph score (LM + transition)
    olabel: np.ndarray  # int32 [A] phone emitted on entry arcs (0 = none)
    final_logw: np.ndarray  # float32 [S] (-inf = non-final)
    dst_offsets: np.ndarray  # int32 [S+1] segment offsets into arc arrays


def pack_decoding_graph(
    fst: Fst,
    olabels: list[int],
    num_pdfs: int,
    weight_scale: float = 1.0,
) -> DecodingGraph:
    """Pack an epsilon-free HMM acceptor over (pdf_id + 1) labels with
    aligned per-arc output labels into the dst-sorted arc tensors the
    decoders consume."""
    arcs = []
    for i, (s, a) in enumerate(fst.all_arcs()):
        arcs.append((s, a.dst, a.label - 1, a.weight * weight_scale, olabels[i]))
    arr = np.array(arcs, dtype=np.float64)
    order = np.lexsort((arr[:, 0], arr[:, 1]))  # sort by dst, then src
    arr = arr[order]
    S = fst.num_states
    dst = arr[:, 1].astype(np.int32)
    offsets = np.zeros(S + 1, dtype=np.int32)
    np.add.at(offsets, dst + 1, 1)
    offsets = np.cumsum(offsets).astype(np.int32)
    final = np.full(S, NEG_INF, dtype=np.float32)
    for s in range(S):
        if fst.is_final(s):
            final[s] = fst.final(s) * weight_scale
    return DecodingGraph(
        num_states=S,
        num_pdfs=num_pdfs,
        src=arr[:, 0].astype(np.int32),
        dst=dst,
        pdf=arr[:, 2].astype(np.int32),
        weight=arr[:, 3].astype(np.float32),
        olabel=arr[:, 4].astype(np.int32),
        final_logw=final,
        dst_offsets=offsets,
    )


def make_decoding_graph(
    phone_lm: Fst,
    tree: ContextTree,
    topo: ChainTopology = ChainTopology(),
    lm_scale: float = 1.0,
) -> DecodingGraph:
    """Phone-level HCLG-equivalent: decoding LM expanded through context +
    topology, with phone output labels on entry arcs."""
    fst, olabels = expand_lm_to_hmm(phone_lm, tree, topo)
    return pack_decoding_graph(fst, olabels, tree.num_pdfs, weight_scale=lm_scale)


def make_word_decoding_graph(
    word_lm: Fst,
    lexicon,
    tree: ContextTree,
    topo: ChainTopology = ChainTopology(),
    lm_scale: float = 1.0,
) -> DecodingGraph:
    """Word-level HCLG (latgen-faster-mapped graph role, SURVEY section 3.4):
    grammar + lexicon + tree + chain topology compiled epsilon-free by
    graphs.hclg.make_hclg; output labels are WORD ids, so viterbi_decode /
    lattice_decode / lattice_nbest produce word sequences directly."""
    from torchain_tpu.graphs.hclg import make_hclg

    fst, olabels = make_hclg(word_lm, lexicon, tree, topo, lm_scale=lm_scale)
    return pack_decoding_graph(fst, olabels, tree.num_pdfs)


def viterbi_decode(
    graph: DecodingGraph,
    loglikes: np.ndarray,  # [T, P] chain-head outputs (acoustic scale 1.0)
    beam: float = 16.0,
    use_final: bool = True,
    backend: str = "auto",  # auto | native | numpy
    phone_bonus: float = 0.0,
    max_active: int = 7000,
) -> tuple[list[int], float]:
    """Best-path decode; returns (phone_sequence, path_score).

    backend="auto" uses the C++ active-token core (csrc/decoder.cc, built
    on demand; only states alive within the beam are expanded, `max_active`
    caps the frontier exactly as latgen-faster-mapped's --max-active) and
    falls back to this vectorized numpy token-passing implementation,
    which remains the tested reference: each frame scores every arc, takes
    a segment max per destination state (argmax kept as backpointer), then
    prunes tokens outside `beam` of the frame-best.

    `phone_bonus` is added to every phone-emitting arc (the word-insertion
    -penalty knob of Kaldi scoring, negated): positive values counteract
    deletion-dominated error patterns.
    """
    if phone_bonus != 0.0:
        graph = dataclasses.replace(
            graph,
            weight=(graph.weight + phone_bonus * (graph.olabel > 0)).astype(
                np.float32
            ),
        )
    if backend in ("auto", "native"):
        from torchain_tpu.eval.native import native_viterbi, native_viterbi_active

        out = native_viterbi_active(
            graph, np.asarray(loglikes, np.float32), beam, max_active, use_final
        )
        if out is None:
            out = native_viterbi(
                graph, np.asarray(loglikes, np.float32), beam, use_final
            )
        if out is not None:
            return out
        if backend == "native":
            raise RuntimeError("native decoder unavailable (csrc build failed)")
    T, P = loglikes.shape
    if P != graph.num_pdfs:
        raise ValueError("pdf dim mismatch")
    S = graph.num_states
    A = graph.src.shape[0]
    off = graph.dst_offsets
    seg_valid = np.diff(off) > 0  # states with in-arcs

    tokens = np.full(S, NEG_INF, dtype=np.float64)
    tokens[0] = 0.0
    backptr = np.zeros((T, S), dtype=np.int32)
    arange_a = np.arange(A)

    for t in range(T):
        scores = tokens[graph.src] + graph.weight + loglikes[t, graph.pdf]
        # segment max + argmax by dst
        seg_max = np.full(S, NEG_INF)
        np.maximum.at(seg_max, graph.dst, scores)
        is_best = scores == seg_max[graph.dst]
        # first best arc per segment
        cand = np.where(is_best, arange_a, A)
        seg_arg = np.full(S, A, dtype=np.int64)
        np.minimum.at(seg_arg, graph.dst, cand)
        new_tokens = seg_max
        # beam prune
        best = new_tokens.max()
        new_tokens = np.where(new_tokens >= best - beam, new_tokens, NEG_INF)
        backptr[t] = np.where(seg_arg < A, seg_arg, 0).astype(np.int32)
        tokens = new_tokens

    final_scores = tokens + (graph.final_logw if use_final else 0.0)
    if not np.isfinite(final_scores.max()):
        final_scores = tokens  # no reachable final: fall back
    state = int(np.argmax(final_scores))
    score = float(final_scores[state])
    phones_rev: list[int] = []
    for t in range(T - 1, -1, -1):
        arc = int(backptr[t, state])
        if graph.olabel[arc] > 0:
            phones_rev.append(int(graph.olabel[arc]))
        state = int(graph.src[arc])
    return phones_rev[::-1], score
