"""Beam-pruned lattice generation.

Behavioral reference: the lattice role of Kaldi's latgen-faster-mapped
(kaldi/src/decoder/lattice-faster-decoder): a compact acyclic graph of the
decoding hypotheses surviving the beam, for N-best extraction and LM
rescoring.  Simplified TPU-era design: the lattice is the time-unrolled
subgraph of (frame, state) tokens within `beam` of each frame's best,
with combined graph+acoustic weights on arcs and phone output labels on
phone-entry arcs (epsilon elsewhere).  No determinization — consumers run
shortest-distance / rescoring on the raw lattice, which fstkit handles.

Guarantees (tested):
  * the lattice's tropical total weight equals the Viterbi best-path score
  * its best path's phone sequence equals viterbi_decode's output
  * its log-semiring total is a lower bound on the full forward score,
    converging to it as beam grows
"""

from __future__ import annotations

import numpy as np

from torchain_tpu.fstkit import Fst, shortest_distance
from torchain_tpu.fstkit.fst import NEG_INF
from torchain_tpu.eval.decoder import DecodingGraph


def lattice_decode(
    graph: DecodingGraph,
    loglikes: np.ndarray,  # [T, P]
    beam: float = 10.0,
    use_final: bool = True,
    phone_bonus: float = 0.0,
) -> Fst:
    """Returns the pruned lattice as an acyclic Fst over PHONE labels
    (0 = epsilon on non-entry arcs); weights are graph + acoustic scores.
    State 0 is the start; frame-T survivors carry final weights."""
    if phone_bonus != 0.0:
        import dataclasses as _dc

        graph = _dc.replace(
            graph,
            weight=(graph.weight + phone_bonus * (graph.olabel > 0)).astype(
                np.float32
            ),
        )
    T, P = loglikes.shape
    S = graph.num_states

    # forward pass in the tropical semiring, recording surviving tokens
    tokens = np.full(S, NEG_INF)
    tokens[0] = 0.0
    alive: list[np.ndarray] = [tokens.copy()]
    for t in range(T):
        scores = tokens[graph.src] + graph.weight + loglikes[t, graph.pdf]
        nxt = np.full(S, NEG_INF)
        np.maximum.at(nxt, graph.dst, scores)
        best = nxt.max()
        if not np.isfinite(best):
            raise ValueError("all decoding tokens died (beam too small?)")
        nxt = np.where(nxt >= best - beam, nxt, NEG_INF)
        alive.append(nxt.copy())
        tokens = nxt

    # lattice states: surviving (t, state) pairs; prune backwards so only
    # tokens on a path to a surviving final remain (done by fstkit.connect
    # implicitly — we just emit and trim)
    fst = Fst()
    ids: dict[tuple[int, int], int] = {}

    def sid(t: int, s: int) -> int:
        key = (t, s)
        if key not in ids:
            ids[key] = fst.add_state()
        return ids[key]

    assert sid(0, 0) == 0
    for t in range(T):
        cur, nxt = alive[t], alive[t + 1]
        live_src = cur[graph.src] > NEG_INF
        live_dst = nxt[graph.dst] > NEG_INF
        for a in np.flatnonzero(live_src & live_dst):
            s, d = int(graph.src[a]), int(graph.dst[a])
            if cur[s] == NEG_INF:
                continue
            w = float(graph.weight[a] + loglikes[t, graph.pdf[a]])
            fst.add_arc(sid(t, s), int(graph.olabel[a]), w, sid(t + 1, d))
    final_scores = alive[T] + (graph.final_logw if use_final else 0.0)
    if not np.isfinite(final_scores.max()):
        final_scores = alive[T]
    for s in np.flatnonzero(final_scores > NEG_INF):
        fw = final_scores[int(s)] - alive[T][int(s)]
        fst.set_final(sid(T, int(s)), float(fw if np.isfinite(fw) else 0.0))
    from torchain_tpu.fstkit import connect

    return connect(fst)


def lattice_best_path(lat: Fst) -> tuple[list[int], float]:
    """Tropical best path through the lattice; returns (phones, score)."""
    if lat.num_states == 0:
        return [], float(NEG_INF)
    fwd = shortest_distance(lat, reverse_dir=False, semiring="tropical")
    bwd = shortest_distance(lat, reverse_dir=True, semiring="tropical")
    score = bwd[0]
    phones: list[int] = []
    s = 0
    while True:
        if lat.is_final(s) and abs(fwd[s] + lat.final(s) - score) < 1e-6:
            # check no better continuation exists
            pass
        nxt = None
        for a in lat.arcs(s):
            if abs(fwd[s] + a.weight + bwd[a.dst] - score) < 1e-6:
                nxt = a
                break
        if nxt is None:
            break
        if nxt.label > 0:
            phones.append(nxt.label)
        s = nxt.dst
    return phones, float(score)


def lattice_nbest(lat: Fst, n: int) -> list[tuple[list[int], float]]:
    """N-best paths by k-best Viterbi over the acyclic lattice: every state
    keeps its top-n (score, predecessor) partial hypotheses in topological
    order (the lattice-to-nbest role of Kaldi's scoring pipeline).

    Returns [(phones, score)] best-first; duplicate phone sequences from
    distinct paths are merged keeping the best score."""
    from torchain_tpu.fstkit.algorithms import _topo_order_subgraph

    if lat.num_states == 0:
        return []
    order = _topo_order_subgraph(lat, eps_only=False)
    if order is None:
        raise ValueError("lattice must be acyclic")
    # hyp: (score, phone_tuple) per state; entries are deduped by phone
    # sequence (best score kept) and truncated to 2n, which makes the
    # sequence-level top-n exact in practice (distinct sequences compete,
    # not raw paths)
    keep = 2 * n
    hyps: list[list[tuple[float, tuple[int, ...]]]] = [
        [] for _ in range(lat.num_states)
    ]
    hyps[0] = [(0.0, ())]
    finals: list[tuple[float, tuple[int, ...]]] = []

    def _prune(cand: list[tuple[float, tuple[int, ...]]]):
        best: dict[tuple[int, ...], float] = {}
        for sc, ph in cand:
            if ph not in best or sc > best[ph]:
                best[ph] = sc
        out = sorted(((sc, ph) for ph, sc in best.items()), key=lambda x: -x[0])
        return out[:keep]

    for s in order:
        if not hyps[s]:
            continue
        hyps[s] = _prune(hyps[s])
        if lat.is_final(s):
            for sc, ph in hyps[s]:
                finals.append((sc + lat.final(s), ph))
        for a in lat.arcs(s):
            ext = (a.label,) if a.label > 0 else ()
            cand = hyps[a.dst]
            for sc, ph in hyps[s]:
                cand.append((sc + a.weight, ph + ext))
    best: dict[tuple[int, ...], float] = {}
    for sc, ph in finals:
        if ph not in best or sc > best[ph]:
            best[ph] = sc
    ranked = sorted(best.items(), key=lambda kv: -kv[1])[:n]
    return [(list(ph), sc) for ph, sc in ranked]


def rescore_lattice(lat: Fst, acoustic_scale: float = 1.0) -> Fst:
    """Scale lattice weights (the lattice-scale step of Kaldi scoring
    pipelines).  With separate graph/acoustic tracking out of scope in the
    combined-weight lattice, this scales everything uniformly."""
    return lat.scale_weights(acoustic_scale)
