"""Beam-pruned lattice generation.

Behavioral reference: the lattice role of Kaldi's latgen-faster-mapped
(kaldi/src/decoder/lattice-faster-decoder): a compact acyclic graph of the
decoding hypotheses surviving the beam, for N-best extraction and LM
rescoring.  Simplified TPU-era design: the lattice is the time-unrolled
subgraph of (frame, state) tokens within `beam` of each frame's best,
with combined graph+acoustic weights on arcs and phone output labels on
phone-entry arcs (epsilon elsewhere).  `determinize_lattice` collapses it
to one best-scored path per label sequence (Kaldi's
determinize-lattice-pruned role), making sequence-level N-best exact.

Guarantees (tested):
  * the lattice's tropical total weight equals the Viterbi best-path score
  * its best path's phone sequence equals viterbi_decode's output
  * its log-semiring total is a lower bound on the full forward score,
    converging to it as beam grows
"""

from __future__ import annotations

import dataclasses as _dc_module
from typing import Any

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
    max_active: int = 0,
    backend: str = "auto",  # auto | native | numpy
) -> Fst:
    """Returns the pruned lattice as an acyclic Fst over PHONE labels
    (0 = epsilon on non-entry arcs); weights are graph + acoustic scores.
    State 0 is the start; frame-T survivors carry final weights.

    `backend="auto"` uses the native active-token generator
    (csrc/decoder.cc tt_lattice_decode — latgen-faster-mapped's defining
    behavior, lattices at decode speed) and falls back to this numpy
    reference when the toolchain is unavailable.  `max_active` caps the
    per-frame frontier Kaldi-style (native path only; 0 = unlimited —
    the numpy path predates it and stays the equal-beam reference)."""
    if backend not in ("auto", "native", "numpy"):
        raise ValueError(
            f"unknown backend {backend!r}: expected 'auto', 'native', or 'numpy'"
        )
    if backend in ("auto", "native"):
        from torchain_tpu.eval.native import native_lattice

        lat = native_lattice(
            graph,
            np.asarray(loglikes, np.float32),
            beam=beam,
            max_active=max_active,
            use_final=use_final,
            phone_bonus=phone_bonus,
        )
        if lat is not None:
            return lat
        if backend == "native":
            raise RuntimeError("native decoder library unavailable")
    if max_active:
        raise ValueError("max_active requires the native backend")
    if phone_bonus != 0.0:
        import dataclasses as _dc

        graph = _dc.replace(
            graph,
            weight=(graph.weight + phone_bonus * (graph.olabel > 0)).astype(
                np.float32
            ),
            eps_weight=(
                graph.eps_weight + phone_bonus * (graph.eps_olabel > 0)
            ).astype(np.float32),
        )
    if getattr(graph, "num_eps", 0):
        return _lattice_decode_eps(graph, loglikes, beam, use_final)
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
            # Kaldi LatticeWeight split [K lat/kaldi-lattice.h]: weight is
            # the combined score the pruning/best-path ranking uses,
            # weight2 the acoustic part alone — so scoring can re-weigh
            # graph vs acoustic (LMWT sweep) without re-decoding
            am = float(loglikes[t, graph.pdf[a]])
            w = float(graph.weight[a]) + am
            fst.add_arc(sid(t, s), int(graph.olabel[a]), w, sid(t + 1, d), am)
    final_scores = alive[T] + (graph.final_logw if use_final else 0.0)
    if not np.isfinite(final_scores.max()):
        final_scores = alive[T]
    for s in np.flatnonzero(final_scores > NEG_INF):
        fw = final_scores[int(s)] - alive[T][int(s)]
        fst.set_final(sid(T, int(s)), float(fw if np.isfinite(fw) else 0.0))
    from torchain_tpu.fstkit import connect

    return connect(fst)


def _lattice_decode_eps(
    graph: DecodingGraph,
    loglikes: np.ndarray,
    beam: float,
    use_final: bool,
) -> Fst:
    """Numpy lattice generation over a graph WITH input-epsilon arcs (real
    Kaldi HCLGs: word-boundary / LM-backoff arcs).  Same semantics as the
    eps-free path plus, at every frame boundary, the surviving eps arcs as
    zero-acoustic lattice arcs between same-boundary states (Kaldi's
    ProcessNonemitting step, [K decoder/lattice-faster-decoder.cc]).  The
    result is no longer one-arc-per-frame time-synchronous, so the lattice
    carries `state_times` (frame index per lattice state; remapped through
    the trim) for the CTM walk."""
    from torchain_tpu.eval.decoder import _relax_eps

    T, P = loglikes.shape
    S = graph.num_states

    tokens = np.full(S, NEG_INF)
    tokens[0] = 0.0
    _relax_eps(graph, tokens)  # initial closure from the start state
    alive: list[np.ndarray] = [tokens.copy()]
    for t in range(T):
        scores = tokens[graph.src] + graph.weight + loglikes[t, graph.pdf]
        nxt = np.full(S, NEG_INF)
        np.maximum.at(nxt, graph.dst, scores)
        _relax_eps(graph, nxt)  # relax BEFORE pruning, as viterbi_decode does
        best = nxt.max()
        if not np.isfinite(best):
            raise ValueError("all decoding tokens died (beam too small?)")
        nxt = np.where(nxt >= best - beam, nxt, NEG_INF)
        alive.append(nxt.copy())
        tokens = nxt

    fst = Fst()
    ids: dict[tuple[int, int], int] = {}
    times: list[int] = []

    def sid(t: int, s: int) -> int:
        key = (t, s)
        if key not in ids:
            ids[key] = fst.add_state()
            times.append(t)
        return ids[key]

    assert sid(0, 0) == 0
    for t in range(T + 1):
        cur = alive[t]
        if graph.num_eps:
            live_src = cur[graph.eps_src] > NEG_INF
            live_dst = cur[graph.eps_dst] > NEG_INF
            for e in np.flatnonzero(live_src & live_dst):
                s, d = int(graph.eps_src[e]), int(graph.eps_dst[e])
                fst.add_arc(
                    sid(t, s),
                    int(graph.eps_olabel[e]),
                    float(graph.eps_weight[e]),
                    sid(t, d),
                    0.0,
                )
        if t == T:
            break
        nxt = alive[t + 1]
        live_src = cur[graph.src] > NEG_INF
        live_dst = nxt[graph.dst] > NEG_INF
        for a in np.flatnonzero(live_src & live_dst):
            s, d = int(graph.src[a]), int(graph.dst[a])
            am = float(loglikes[t, graph.pdf[a]])
            w = float(graph.weight[a]) + am
            fst.add_arc(sid(t, s), int(graph.olabel[a]), w, sid(t + 1, d), am)

    final_scores = alive[T] + (graph.final_logw if use_final else 0.0)
    if not np.isfinite(final_scores.max()):
        final_scores = alive[T]
    for s in np.flatnonzero(final_scores > NEG_INF):
        fw = final_scores[int(s)] - alive[T][int(s)]
        fst.set_final(sid(T, int(s)), float(fw if np.isfinite(fw) else 0.0))

    from torchain_tpu.fstkit import connect

    out, keep = connect(fst, return_map=True)
    out.state_times = [times[old] for old in keep]
    return out


def _best_path_arrays(lat: Fst, arrays) -> tuple[list[int], float]:
    """Vectorized best path over the native decoder's raw lattice arrays
    (eps-free lattices only): the states are numbered in frame-boundary
    order and every arc crosses exactly one boundary, so the tropical DP
    batches per boundary with numpy — ~10x the pure-Python
    shortest_distance walk at real-HCLG lattice sizes."""
    src, dst, ol, w, fin_s, fin_w, times = arrays
    L = lat.num_states
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    w64 = np.asarray(w, np.float64)
    bt = np.asarray(times, np.int64)[src]  # arc's source boundary
    order = np.argsort(bt, kind="stable")
    src_o, dst_o, w_o = src[order], dst[order], w64[order]
    bounds = np.searchsorted(bt[order], np.arange(bt.max() + 2))
    fwd = np.full(L, NEG_INF)
    fwd[0] = 0.0
    for b in range(len(bounds) - 1):
        sl = slice(bounds[b], bounds[b + 1])
        np.maximum.at(fwd, dst_o[sl], fwd[src_o[sl]] + w_o[sl])
    bwd = np.full(L, NEG_INF)
    bwd[np.asarray(fin_s, np.int64)] = np.asarray(fin_w, np.float64)
    for b in range(len(bounds) - 2, -1, -1):
        sl = slice(bounds[b], bounds[b + 1])
        np.maximum.at(bwd, src_o[sl], bwd[dst_o[sl]] + w_o[sl])
    score = float(bwd[0])
    # arc groups by source state for the walk (src is boundary-ordered,
    # hence nondecreasing up to within-boundary interleave: sort once)
    so = np.argsort(src, kind="stable")
    starts = np.searchsorted(src[so], np.arange(L + 1))
    finals = dict(zip(fin_s.tolist(), np.asarray(fin_w, np.float64).tolist()))
    phones: list[int] = []
    s, steps = 0, 0
    while True:
        lo, hi = starts[s], starts[s + 1]
        best_r, ai = np.inf, -1
        if hi > lo:
            idx = so[lo:hi]
            r = np.abs(fwd[s] + w64[idx] + bwd[dst[idx]] - score)
            k = int(np.argmin(r))
            best_r, ai = float(r[k]), int(idx[k])
        fin = (
            abs(fwd[s] + finals[s] - score) if s in finals else np.inf
        )
        if fin <= best_r:
            break
        if ai < 0 or steps > L:
            raise RuntimeError(
                f"best-path walk stranded at state {s}: no outgoing arc "
                "or final weight lies on the best-path score"
            )
        if int(ol[ai]) > 0:
            phones.append(int(ol[ai]))
        s = int(dst[ai])
        steps += 1
    return phones, score


def lattice_best_path(lat: Fst) -> tuple[list[int], float]:
    """Tropical best path through the lattice; returns (phones, score).

    Follows, from the start state, any arc lying on a globally optimal
    path (fwd[s] + w + bwd[dst] == best score); stops when none does,
    which on an acyclic trimmed lattice can only happen at a final state
    whose stopping score is optimal."""
    if lat.num_states == 0:
        return [], float(NEG_INF)
    arrays = getattr(lat, "_lattice_arrays", None)
    if arrays is not None and len(arrays[0]):
        from torchain_tpu.eval.native import native_lattice_best_path

        out = native_lattice_best_path(lat)
        if out is not None:
            return out
        if not getattr(lat, "_eps_arrays", False):
            # numpy boundary-batched DP: valid only when every arc
            # crosses a frame boundary (eps lattices fall through to the
            # generic walk below)
            return _best_path_arrays(lat, arrays)
    fwd = shortest_distance(lat, reverse_dir=False, semiring="tropical")
    bwd = shortest_distance(lat, reverse_dir=True, semiring="tropical")
    score = bwd[0]
    phones: list[int] = []
    s, steps = 0, 0
    while True:
        # argmin residual, not a fixed tolerance — see best_path_ctm
        nxt, best = None, np.inf
        for a in lat.arcs(s):
            r = abs(fwd[s] + a.weight + bwd[a.dst] - score)
            if r < best:
                nxt, best = a, r
        fin = abs(fwd[s] + lat.final(s) - score) if lat.is_final(s) else np.inf
        if fin <= best:
            break
        if nxt is None or steps > lat.num_states:
            raise RuntimeError(
                f"best-path walk stranded at state {s}: no outgoing arc or "
                "final weight lies on the best-path score"
            )
        if nxt.label > 0:
            phones.append(nxt.label)
        s = nxt.dst
        steps += 1
    return phones, float(score)


@_dc_module.dataclass
class CtmEntry:
    """One CTM row (NIST time-marked conversation format, the output of
    Kaldi's lattice-align-words | nbest-to-ctm scoring pipeline)."""

    word: int
    start_s: float
    dur_s: float
    conf: float = 1.0


def best_path_ctm(
    lat: Fst,
    frame_shift_s: float = 0.03,
    offset_s: float = 0.0,
    with_confidence: bool = True,
) -> list[CtmEntry]:
    """Word time alignments of the lattice best path (lattice-align-words
    + nbest-to-ctm role, [K latbin/lattice-align-words.cc,
    nbest-to-ctm.cc]).

    Works on RAW decode lattices (lattice_decode output), whose arcs are
    time-synchronous — the i-th arc of any path consumes output frame i —
    so word boundaries are exact: a word spans from the frame after the
    previous word's emitting arc through its own emitting arc (our HCLG
    emits each word on its pronunciation's last required arc).
    Determinized lattices lose the time-unrolled property; pass the raw
    lattice.  `frame_shift_s` is the OUTPUT frame period (input shift x
    frame_subsampling_factor; Kaldi chain default 0.03).

    With `with_confidence`, each entry carries the posterior of its
    emitting arc under the lattice (lattice-to-post role) — apply
    rescore_lattice first to choose the LMWT, as score.sh does."""
    if lat.num_states == 0:
        return []
    fwd = shortest_distance(lat, reverse_dir=False, semiring="tropical")
    bwd = shortest_distance(lat, reverse_dir=True, semiring="tropical")
    score = bwd[0]
    if with_confidence:
        # log-semiring forward-backward for arc posteriors, computed
        # directly at the traversed arc (lattice_arc_posteriors formula)
        lfwd = shortest_distance(lat, reverse_dir=False, semiring="log")
        lbwd = shortest_distance(lat, reverse_dir=True, semiring="log")
        total = lbwd[0]
    # eps lattices (real Kaldi HCLGs) are not one-arc-per-frame; they carry
    # state_times (frame index per state) instead, set by lattice_decode
    times = getattr(lat, "state_times", None)
    out: list[CtmEntry] = []
    s, t, seg_start, steps = 0, 0, 0, 0
    while True:
        # the on-path arc is the argmin of |fwd + w + bwd - score| rather
        # than a fixed absolute tolerance — robust to accumulated float
        # error on long utterances; stopping at a final state wins only
        # when its residual beats every outgoing arc's
        nxt, best = None, np.inf
        for a in lat.arcs(s):
            r = abs(fwd[s] + a.weight + bwd[a.dst] - score)
            if r < best:
                nxt, best = a, r
        fin = abs(fwd[s] + lat.final(s) - score) if lat.is_final(s) else np.inf
        if fin <= best:
            break
        if nxt is None or steps > lat.num_states:
            raise RuntimeError(
                f"best-path walk stranded at state {s} (frame {t}): no "
                "outgoing arc or final weight lies on the best-path score"
            )
        t_end = times[nxt.dst] if times is not None else t + 1
        if nxt.label > 0:
            conf = 1.0
            if with_confidence:
                conf = float(
                    np.exp(lfwd[s] + nxt.weight + lbwd[nxt.dst] - total)
                )
            out.append(
                CtmEntry(
                    word=int(nxt.label),
                    start_s=offset_s + seg_start * frame_shift_s,
                    dur_s=(t_end - seg_start) * frame_shift_s,
                    conf=conf,
                )
            )
            seg_start = t_end
        s = nxt.dst
        t = t_end
        steps += 1
    return out


def write_ctm(
    path: str,
    entries_by_utt: dict[str, list[CtmEntry]],
    words_txt: dict[int, str] | None = None,
    channel: str = "1",
) -> None:
    """Write NIST CTM: `utt channel start dur word [conf]` per row, sorted
    by utterance then start time — the file every Kaldi scoring pipeline
    (sclite, score.sh ctm mode) consumes.  `words_txt` (id -> symbol) maps
    ids to symbols; absent, integer ids are written."""
    with open(path, "w") as f:
        for utt in sorted(entries_by_utt):
            for e in entries_by_utt[utt]:
                w = words_txt.get(e.word, str(e.word)) if words_txt else str(e.word)
                f.write(
                    f"{utt} {channel} {e.start_s:.2f} {e.dur_s:.2f} {w}"
                    f" {e.conf:.2f}\n"
                )


def read_ctm(path: str) -> dict[str, list[CtmEntry]]:
    """Parse a CTM file back into per-utterance entries (symbols must be
    integer ids or `w<N>`-style; foreign symbols raise)."""
    out: dict[str, list[CtmEntry]] = {}
    for line in open(path):
        parts = line.split()
        if not parts:
            continue
        if len(parts) not in (5, 6):
            raise ValueError(f"malformed CTM line: {line!r}")
        utt, _ch, start, dur, word = parts[:5]
        conf = float(parts[5]) if len(parts) == 6 else 1.0
        wid = int(word[1:]) if word.startswith("w") else int(word)
        out.setdefault(utt, []).append(
            CtmEntry(word=wid, start_s=float(start), dur_s=float(dur), conf=conf)
        )
    return out


def determinize_lattice(lat: Fst, max_states: int = 200_000) -> Fst:
    """Weighted tropical determinization over label sequences with epsilon
    removal — the lattice-determinization step of Kaldi's pipeline
    (kaldi/src/lat/determinize-lattice-pruned, SURVEY.md section 3.4): the
    result has exactly ONE path per distinct label sequence, carrying that
    sequence's BEST combined score.

    Subset construction with residual weights: a det state is a set of
    (lattice state, residual) pairs reached by some label sequence, with
    residuals normalized so the best is 0 and the normalizer pushed onto
    the incoming det arc.  Residuals are (total, acoustic) PAIRS — the
    LatticeWeight semiring [K lat/kaldi-lattice.h], where plus picks the
    best total and times adds componentwise — so the determinized lattice
    preserves each sequence's graph/acoustic split exactly (needed by the
    LMWT scoring sweep).  Terminates on acyclic lattices; `max_states`
    guards pathological blowup."""
    if lat.num_states == 0:
        return Fst()

    def eps_closure(
        pairs: dict[int, tuple[float, float]]
    ) -> dict[int, tuple[float, float]]:
        # tropical (best-total) closure over epsilon arcs (acyclic: plain
        # relaxation); the acoustic part rides along with the winner
        out = dict(pairs)
        stack = list(pairs)
        while stack:
            s = stack.pop()
            w, w2 = out[s]
            for a in lat.arcs(s):
                if a.label == 0:
                    nw = w + a.weight
                    if nw > out.get(a.dst, (NEG_INF, 0.0))[0] + 1e-12:
                        out[a.dst] = (nw, w2 + a.weight2)
                        stack.append(a.dst)
        return out

    def normalize(pairs: dict[int, tuple[float, float]]) -> tuple[
        float, float, tuple
    ]:
        # push the best pair's components onto the incoming arc ("divide"
        # by the max-total element, Kaldi's subset normalization)
        m, m2 = max(pairs.values(), key=lambda p: p[0])
        key = tuple(
            sorted(
                (s, round(w - m, 9), round(w2 - m2, 9))
                for s, (w, w2) in pairs.items()
            )
        )
        return m, m2, key

    out = Fst()
    # the start subset keeps its raw closure weights (no normalization), so
    # no residual needs folding into start-out arcs even if some later
    # label sequence happens to reach an identical subset
    start = eps_closure({0: (0.0, 0.0)})
    key0 = tuple(
        sorted((s, round(w, 9), round(w2, 9)) for s, (w, w2) in start.items())
    )
    det_of: dict[tuple, int] = {key0: out.add_state()}
    subset_of = {key0: dict(start)}
    stack = [key0]
    done = set()
    while stack:
        key = stack.pop()
        if key in done:
            continue
        done.add(key)
        src = det_of[key]
        subset = subset_of[key]
        # final weight: best stop score in the subset
        fins = [
            (w + lat.final(s), w2 + lat.final2(s))
            for s, (w, w2) in subset.items()
            if lat.is_final(s)
        ]
        if fins:
            fw, fw2 = max(fins, key=lambda p: p[0])
            out.set_final(src, fw, fw2)
        # group successors by label
        by_label: dict[int, dict[int, tuple[float, float]]] = {}
        for s, (w, w2) in subset.items():
            for a in lat.arcs(s):
                if a.label == 0:
                    continue
                d = by_label.setdefault(a.label, {})
                nw = w + a.weight
                if nw > d.get(a.dst, (NEG_INF, 0.0))[0]:
                    d[a.dst] = (nw, w2 + a.weight2)
        for label, pairs in sorted(by_label.items()):
            closed = eps_closure(pairs)
            m, m2, nkey = normalize(closed)
            if nkey not in det_of:
                if len(det_of) >= max_states:
                    raise ValueError(
                        "lattice determinization exceeded max_states"
                    )
                det_of[nkey] = out.add_state()
                subset_of[nkey] = {
                    s: (w - m, w2 - m2) for s, (w, w2) in closed.items()
                }
                stack.append(nkey)
            out.add_arc(src, label, m, det_of[nkey], m2)
    return out


def lattice_nbest(
    lat: Fst, n: int, determinize: bool = False, return_components: bool = False
):
    """N-best paths by k-best Viterbi over the acyclic lattice: every state
    keeps its top-n (score, predecessor) partial hypotheses in topological
    order (the lattice-to-nbest role of Kaldi's scoring pipeline).

    Returns [(phones, score)] best-first; duplicate phone sequences from
    distinct paths are merged keeping the best score.  With
    `determinize=True` the lattice is first determinized so paths and
    label sequences coincide and the sequence-level top-n is EXACT (the
    default per-state 2n truncation is exact in practice but can in
    principle drop a sequence whose prefixes rank below 2n everywhere).
    With `return_components=True`, entries are (phones, score, acoustic)
    — the acoustic part of the winning path (Kaldi nbest-to-linear's
    am/lm split, for downstream LM rescoring)."""
    if determinize:
        lat = determinize_lattice(lat)
    from torchain_tpu.fstkit.algorithms import _topo_order_subgraph

    if lat.num_states == 0:
        return []
    order = _topo_order_subgraph(lat, eps_only=False)
    if order is None:
        raise ValueError("lattice must be acyclic")
    # hyp: (score, acoustic, phone_tuple) per state; entries are deduped by
    # phone sequence (best score kept) and truncated to 2n, which makes the
    # sequence-level top-n exact in practice (distinct sequences compete,
    # not raw paths)
    keep = 2 * n
    hyps: list[list[tuple[float, float, tuple[int, ...]]]] = [
        [] for _ in range(lat.num_states)
    ]
    hyps[0] = [(0.0, 0.0, ())]
    finals: list[tuple[float, float, tuple[int, ...]]] = []

    def _prune(cand: list[tuple[float, float, tuple[int, ...]]]):
        best: dict[tuple[int, ...], tuple[float, float]] = {}
        for sc, am, ph in cand:
            if ph not in best or sc > best[ph][0]:
                best[ph] = (sc, am)
        out = sorted(
            ((sc, am, ph) for ph, (sc, am) in best.items()), key=lambda x: -x[0]
        )
        return out[:keep]

    for s in order:
        if not hyps[s]:
            continue
        hyps[s] = _prune(hyps[s])
        if lat.is_final(s):
            for sc, am, ph in hyps[s]:
                finals.append((sc + lat.final(s), am + lat.final2(s), ph))
        for a in lat.arcs(s):
            ext = (a.label,) if a.label > 0 else ()
            cand = hyps[a.dst]
            for sc, am, ph in hyps[s]:
                cand.append((sc + a.weight, am + a.weight2, ph + ext))
    best: dict[tuple[int, ...], tuple[float, float]] = {}
    for sc, am, ph in finals:
        if ph not in best or sc > best[ph][0]:
            best[ph] = (sc, am)
    ranked = sorted(best.items(), key=lambda kv: -kv[1][0])[:n]
    if return_components:
        return [(list(ph), sc, am) for ph, (sc, am) in ranked]
    return [(list(ph), sc) for ph, (sc, am) in ranked]


def rescore_lattice(
    lat: Fst, acoustic_scale: float = 1.0, lm_scale: float = 1.0
) -> Fst:
    """Re-weigh the lattice's graph vs acoustic components (the
    lattice-scale step of Kaldi scoring pipelines: `lattice-scale
    --inv-acoustic-scale=LMWT`, [K latbin/lattice-scale.cc]).

    Arcs carry `weight = graph + acoustic` and `weight2 = acoustic`
    (see lattice_decode); the rescored arc total is
    `lm_scale*graph + acoustic_scale*acoustic`, with the acoustic
    component re-tracked so rescoring composes."""
    out = Fst()
    out.add_states(lat.num_states)
    for s, a in lat.all_arcs():
        g = a.weight - a.weight2
        am = acoustic_scale * a.weight2
        out.add_arc(s, a.label, lm_scale * g + am, a.dst, am)
    for s in range(lat.num_states):
        if lat.is_final(s):
            g = lat.final(s) - lat.final2(s)
            am = acoustic_scale * lat.final2(s)
            out.set_final(s, lm_scale * g + am, am)
    return out


def _add_label_penalty(lat: Fst, penalty: float) -> Fst:
    """Per-output-label cost (graph-side), Kaldi's --word-ins-penalty."""
    out = Fst()
    out.add_states(lat.num_states)
    for s, a in lat.all_arcs():
        w = a.weight - (penalty if a.label > 0 else 0.0)
        out.add_arc(s, a.label, w, a.dst, a.weight2)
    for s in range(lat.num_states):
        if lat.is_final(s):
            out.set_final(s, lat.final(s), lat.final2(s))
    return out


def score_sweep(
    lats: list[Fst],
    refs: list[list[int]],
    lmwt_range=range(5, 18),
    word_insertion_penalty: float = 0.0,
) -> tuple[int, dict, list[list[int]], dict[int, float]]:
    """Kaldi `score.sh` role: best-path every lattice at every LM weight in
    `lmwt_range` (graph component scaled by LMWT, equivalently acoustic by
    1/LMWT; chain decoding runs at acoustic-scale 1.0 so LMWT is relative),
    score the corpus against `refs` at each weight, and pick the best —
    one shared LMWT for the whole test set, as score.sh's wer_LMWT files do.

    `word_insertion_penalty` adds a per-output-label graph cost before
    best-pathing (the --word-ins-penalty sweep axis; negative = bonus).

    Returns (best_lmwt, best_wer_dict, best_hyps, wer_by_lmwt)."""
    from torchain_tpu.eval.wer import wer

    if len(lats) != len(refs):
        raise ValueError("lats/refs length mismatch")
    best = None
    wer_by_lmwt: dict[int, float] = {}
    for lmwt in lmwt_range:
        hyps = []
        for lat in lats:
            scaled = rescore_lattice(
                lat, acoustic_scale=1.0, lm_scale=float(lmwt)
            )
            if word_insertion_penalty != 0.0:
                scaled = _add_label_penalty(scaled, word_insertion_penalty)
            hyp, _ = lattice_best_path(scaled)
            hyps.append(hyp)
        res = wer([list(r) for r in refs], hyps)
        wer_by_lmwt[int(lmwt)] = res["wer"]
        if best is None or res["wer"] < best[1]["wer"]:
            best = (int(lmwt), res, hyps)
    assert best is not None, "empty lmwt_range"
    return best[0], best[1], best[2], wer_by_lmwt


# ---------------------------------------------------------------------------
# Lattice posteriors, LM rescoring, MBR / confusion networks
# ---------------------------------------------------------------------------


def lattice_arc_posteriors(lat: Fst) -> tuple[list[tuple[int, Any, float]], float]:
    """Per-arc posteriors by log-semiring forward-backward — the
    lattice-to-post role ([K latbin/lattice-to-post.cc]): the posterior of
    arc a:(s -> d) is exp(alpha[s] + w(a) + beta[d] - total), the fraction
    of accepting-path probability routed through a.  Weights are used as
    they sit on the lattice (apply rescore_lattice first to choose
    acoustic/LM scales, as Kaldi pipes lattice-scale before -to-post).

    Returns (posts, total_logprob) where posts lists (src, arc, posterior)
    in `lat.all_arcs()` order.  Any frame-synchronized cut of the lattice's
    arcs has posteriors summing to 1 (tested)."""
    if lat.num_states == 0:
        return [], float(NEG_INF)
    fwd = shortest_distance(lat, reverse_dir=False, semiring="log")
    bwd = shortest_distance(lat, reverse_dir=True, semiring="log")
    total = bwd[0]
    posts = [
        (s, a, float(np.exp(fwd[s] + a.weight + bwd[a.dst] - total)))
        for s, a in lat.all_arcs()
    ]
    return posts, float(total)


def prune_lattice(lat: Fst, beam: float) -> Fst:
    """Posterior-style beam pruning of an existing lattice — the
    lattice-prune role ([K latbin/lattice-prune.cc]): keep exactly the
    arcs (and final weights) lying on some complete path whose score is
    within `beam` of the lattice best path, then trim.  Weights are used
    as they sit on the lattice; apply rescore_lattice first to choose the
    acoustic/LM scales, as Kaldi pipes lattice-scale before -prune.

    `weight2` (acoustic) components ride through unchanged, so the pruned
    lattice rescoring-composes like the original."""
    from torchain_tpu.fstkit import connect

    if lat.num_states == 0:
        return Fst()
    fwd = shortest_distance(lat, reverse_dir=False, semiring="tropical")
    bwd = shortest_distance(lat, reverse_dir=True, semiring="tropical")
    best = bwd[0]
    if best == NEG_INF:  # no accepting path at all
        return Fst()
    cutoff = best - beam
    out = Fst()
    out.add_states(lat.num_states)
    for s, a in lat.all_arcs():
        if fwd[s] + a.weight + bwd[a.dst] >= cutoff:
            out.add_arc(s, a.label, a.weight, a.dst, a.weight2)
    for s in range(lat.num_states):
        if lat.is_final(s) and fwd[s] + lat.final(s) >= cutoff:
            out.set_final(s, lat.final(s), lat.final2(s))
    return connect(out)


def lmrescore_lattice(lat: Fst, g: Fst, lm_scale: float = 1.0) -> Fst:
    """Compose the (word/phone-label) lattice with acceptor grammar `g`,
    adding `lm_scale * g_weight` to the GRAPH component of matching arcs —
    the lattice-lmrescore role ([K latbin/lattice-lmrescore.cc]).  The
    Kaldi two-step LM swap is `lmrescore_lattice(lat, g_old, -1.0)` to
    subtract the decoding LM, then `lmrescore_lattice(., g_new, +1.0)`.

    Product construction over (lattice state, grammar state): epsilon
    lattice arcs advance the lattice side alone; labeled arcs must match a
    `g` arc with the same label (log-prob weights).  Paths whose label
    sequence `g` does not accept are dropped, as in Kaldi composition.
    Acoustic components (weight2) ride through unchanged."""
    from torchain_tpu.fstkit import connect

    if lat.num_states == 0 or g.num_states == 0:
        return Fst()
    g_arcs: list[dict[int, list[tuple[float, int]]]] = [
        {} for _ in range(g.num_states)
    ]
    for gs, ga in g.all_arcs():
        g_arcs[gs].setdefault(ga.label, []).append((ga.weight, ga.dst))
    out = Fst()
    ids: dict[tuple[int, int], int] = {(0, 0): out.add_state()}
    stack = [(0, 0)]
    while stack:
        ls, gs = stack.pop()
        src = ids[(ls, gs)]
        if lat.is_final(ls) and g.is_final(gs):
            out.set_final(
                src,
                lat.final(ls) + lm_scale * g.final(gs),
                lat.final2(ls),
            )
        for a in lat.arcs(ls):
            if a.label == 0:
                succ = [(0.0, gs)]
            else:
                succ = g_arcs[gs].get(a.label, [])
            for gw, gd in succ:
                key = (a.dst, gd)
                if key not in ids:
                    ids[key] = out.add_state()
                    stack.append(key)
                out.add_arc(
                    src, a.label, a.weight + lm_scale * gw, ids[key], a.weight2
                )
    return connect(out)


@_dc_module.dataclass
class MbrResult:
    """Output of mbr_decode (the lattice-mbr-decode / sausage role)."""

    #: MBR word sequence (epsilon slots stripped)
    words: list[int]
    #: expected edit distance of `words` under the lattice posterior
    risk: float
    #: expected edit distance of the MAP (best-path) hypothesis, for
    #: comparison — risk <= map_risk by construction of the iteration
    map_risk: float
    #: confusion network: one dict per alignment slot mapping word id
    #: (0 = epsilon) -> posterior; each slot sums to 1
    bins: list[dict[int, float]]
    #: per-word posterior of the winning word in its slot (confidence),
    #: aligned with `words`
    confidences: list[float]
    #: the epsilon-interleaved alignment hypothesis, aligned with `bins`
    #: (`words` is `slots` with the 0 entries stripped)
    slots: list[int] = _dc_module.field(default_factory=list)


def _mbr_acc_stats(
    order: list[int],
    in_arcs: list[list[tuple[int, int, float]]],
    alpha: np.ndarray,
    finals: list[tuple[int, float]],
    total: float,
    R: list[int],
) -> tuple[float, list[dict[int, float]]]:
    """One forward-backward pass of the expected-edit-distance recursion
    (Xu/Povey/Mangu/Zhu 2011, the algorithm behind Kaldi's
    [K lat/sausages.cc] MinimumBayesRisk::AccStats).

    Forward: alpha_dash[n][q] = posterior-weighted expected minimum edit
    distance between R[:q] and the word sequences of paths start -> n.
    Per arc (s -> n, word w) the slot recursion is
        arc[q] = min( alpha_dash[s][q-1] + l(R[q], w),   # sub / correct
                      alpha_dash[s][q]   + l(eps,  w),   # w inserted
                      arc[q-1]           + l(R[q], eps)) # R[q] deleted
    with l(a, b) = 0 if a == b else 1 (epsilon matches epsilon free), and
    alpha_dash[n] the arc-posterior-weighted mean over incoming arcs.

    Backward: unit mass enters at the final slot Q and flows back through
    each arc's argmin choices; substitution/correct mass lands in
    gamma[q][w], deletion mass in gamma[q][eps].  Insertion mass carries
    no slot of R and is deliberately unassigned — R is epsilon-interleaved
    by mbr_decode precisely so that, on the next iteration, an inserted
    word can claim an epsilon slot as a substitution.  Each path consumes
    every slot exactly once, so every gamma[q] sums to 1.

    Returns (expected edit distance of R, gamma)."""
    Q = len(R)
    Rv = np.array(R, dtype=np.int64)
    S = len(in_arcs)
    NEG = np.float64(NEG_INF)
    alpha_dash = np.zeros((S, Q + 1), dtype=np.float64)
    # start: R[:q] against the empty sequence — delete every non-eps slot
    del_cost = np.concatenate(([0.0], np.cumsum(Rv != 0).astype(np.float64)))
    alpha_dash[0] = del_cost
    reached = np.zeros(S, dtype=bool)
    reached[0] = True

    def arc_recursion(s: int, w: int) -> tuple[np.ndarray, np.ndarray]:
        # vectorized over q except the running-min deletion scan
        base = alpha_dash[s]
        sub = base[:-1] + (Rv != w)  # choice 1 at slots 1..Q
        ins = base + (0.0 if w == 0 else 1.0)  # choice 2 at slots 0..Q
        arc = np.empty(Q + 1, dtype=np.float64)
        choice = np.zeros(Q + 1, dtype=np.int8)
        arc[0] = ins[0]
        choice[0] = 2
        dcost = (Rv != 0).astype(np.float64)  # choice 3 cost per slot
        for q in range(1, Q + 1):
            c1, c2, c3 = sub[q - 1], ins[q], arc[q - 1] + dcost[q - 1]
            if c1 <= c2 and c1 <= c3:
                arc[q], choice[q] = c1, 1
            elif c3 <= c2:
                arc[q], choice[q] = c3, 3
            else:
                arc[q], choice[q] = c2, 2
        return arc, choice

    for n in order:
        if n == 0 or not in_arcs[n]:
            continue
        acc = np.zeros(Q + 1, dtype=np.float64)
        got = False
        for s, w, wt in in_arcs[n]:
            if not reached[s] or alpha[s] <= NEG:
                continue
            frac = np.exp(alpha[s] + wt - alpha[n])
            arc, _ = arc_recursion(s, w)
            acc += frac * arc
            got = True
        if got:
            alpha_dash[n] = acc
            reached[n] = True

    # expected edit distance of R: posterior-weighted over final states
    risk = 0.0
    beta_dash = np.zeros((S, Q + 1), dtype=np.float64)
    for s, fw in finals:
        if not reached[s]:
            continue
        p = np.exp(alpha[s] + fw - total)
        risk += p * alpha_dash[s][Q]
        beta_dash[s][Q] += p

    gamma: list[dict[int, float]] = [{} for _ in range(Q)]
    for n in reversed(order):
        if n == 0 or not np.any(beta_dash[n]):
            continue
        for s, w, wt in in_arcs[n]:
            if not reached[s] or alpha[s] <= NEG:
                continue
            frac = np.exp(alpha[s] + wt - alpha[n])
            _, choice = arc_recursion(s, w)
            mass = beta_dash[n] * frac
            for q in range(Q, -1, -1):
                m = mass[q]
                if m <= 0.0:
                    continue
                c = choice[q]
                if c == 1:  # sub/correct: w fills slot q
                    g = gamma[q - 1]
                    g[w] = g.get(w, 0.0) + m
                    beta_dash[s][q - 1] += m
                elif c == 3:  # deletion: slot q goes to epsilon
                    g = gamma[q - 1]
                    g[0] = g.get(0, 0.0) + m
                    mass[q - 1] += m
                else:  # insertion: w floats (no slot of R consumed)
                    beta_dash[s][q] += m
    # initial deletions: mass reaching the start state with q slots still
    # pending was aligned against the empty path prefix (alpha_dash[0] is
    # the cumulative deletion cost) — those slots all resolved to epsilon
    for q in range(1, Q + 1):
        m = beta_dash[0][q]
        if m > 0.0:
            for qq in range(q):
                gamma[qq][0] = gamma[qq].get(0, 0.0) + m
    return float(risk), gamma


def mbr_decode(lat: Fst, max_iters: int = 20) -> MbrResult:
    """Minimum-Bayes-risk decoding with confusion-network (sausage) output
    — the lattice-mbr-decode role ([K latbin/lattice-mbr-decode.cc],
    [K lat/sausages.cc]; Xu et al. 2011).  Minimizes EXPECTED edit
    distance under the lattice posterior instead of picking the MAP path:
    starting from the best path (epsilon-interleaved so insertions can
    claim slots), each iteration aligns the whole lattice against the
    current hypothesis R, accumulates per-slot word posteriors gamma, and
    re-picks R[q] = argmax_w gamma[q][w] until fixed point.  The risk is
    non-increasing across iterations.

    Weights are taken as they sit on the lattice; apply rescore_lattice
    first for LMWT scaling, as Kaldi pipes lattice-scale before
    lattice-mbr-decode.  Slot times are not tracked (determinized lattices
    here carry no frame identity)."""
    if lat.num_states == 0:
        return MbrResult([], 0.0, 0.0, [], [], [])
    from torchain_tpu.fstkit.algorithms import _topo_order_subgraph

    order = _topo_order_subgraph(lat, eps_only=False)
    if order is None:
        raise ValueError("mbr_decode requires an acyclic lattice")
    S = lat.num_states
    in_arcs: list[list[tuple[int, int, float]]] = [[] for _ in range(S)]
    for s, a in lat.all_arcs():
        in_arcs[a.dst].append((s, a.label, a.weight))
    alpha = np.array(
        shortest_distance(lat, reverse_dir=False, semiring="log"),
        dtype=np.float64,
    )
    bwd = shortest_distance(lat, reverse_dir=True, semiring="log")
    total = float(bwd[0])
    finals = [
        (s, lat.final(s)) for s in range(S) if lat.is_final(s)
    ]

    best, _ = lattice_best_path(lat)

    def interleave(words: list[int]) -> list[int]:
        R = [0]
        for w in words:
            R.extend((w, 0))
        return R

    R = interleave(best)
    risk, gamma = _mbr_acc_stats(order, in_arcs, alpha, finals, total, R)
    map_risk = risk
    for _ in range(max_iters):
        newR = [max(g.items(), key=lambda kv: kv[1])[0] if g else 0 for g in gamma]
        # re-interleave so adjacent words keep an insertion slot between them
        newR = interleave([w for w in newR if w != 0])
        if newR == R:
            break
        new_risk, new_gamma = _mbr_acc_stats(
            order, in_arcs, alpha, finals, total, newR
        )
        if new_risk > risk + 1e-9:  # safety: never accept a worse hypothesis
            break
        R, risk, gamma = newR, new_risk, new_gamma
    words = [w for w in R if w != 0]
    confidences = [
        gamma[q][R[q]] for q in range(len(R)) if R[q] != 0
    ]
    return MbrResult(words, risk, map_risk, gamma, confidences, R)


def lattice_oracle(lat: Fst, ref: list[int]) -> tuple[list[int], int]:
    """Oracle (minimum-achievable) edit distance of the lattice against a
    reference — the lattice-oracle role ([K latbin/lattice-oracle.cc],
    steps' oracle WER diagnostic): how good the best path IN the lattice
    is, regardless of scores.  Dynamic program over (lattice state, ref
    position) in the edit-distance tropical semiring; label arcs may match
    (0), substitute (1), or be insertions (1); ref symbols may be deleted
    (1); epsilon arcs are free.

    Returns (oracle_hypothesis, oracle_edit_distance)."""
    if lat.num_states == 0:
        return [], len(ref)
    from torchain_tpu.fstkit.algorithms import _topo_order_subgraph

    order = _topo_order_subgraph(lat, eps_only=False)
    if order is None:
        raise ValueError("lattice_oracle requires an acyclic lattice")
    Q = len(ref)
    INF = 1 << 30
    S = lat.num_states
    # cost[s][q] = min edits aligning ref[:q] with some path start -> s;
    # back[(s, q)] = (prev_state, prev_q, emitted_label_or_None)
    cost = np.full((S, Q + 1), INF, dtype=np.int64)
    back: dict[tuple[int, int], tuple[int, int, int | None]] = {}
    cost[0][0] = 0
    for s in order:
        # settle the deletion chain at s BEFORE expanding its out-arcs
        # (topological order guarantees all in-arc contributions arrived)
        for q in range(1, Q + 1):
            if cost[s][q - 1] + 1 < cost[s][q]:
                cost[s][q] = cost[s][q - 1] + 1
                back[(s, q)] = (s, q - 1, None)
        for a in lat.arcs(s):
            for q in range(Q + 1):
                c = int(cost[s][q])
                if c >= INF:
                    continue
                if a.label == 0:
                    if c < cost[a.dst][q]:  # free epsilon traversal
                        cost[a.dst][q] = c
                        back[(a.dst, q)] = (s, q, None)
                else:
                    if c + 1 < cost[a.dst][q]:  # insertion
                        cost[a.dst][q] = c + 1
                        back[(a.dst, q)] = (s, q, a.label)
                    if q < Q:  # match / substitution
                        step = 0 if a.label == ref[q] else 1
                        if c + step < cost[a.dst][q + 1]:
                            cost[a.dst][q + 1] = c + step
                            back[(a.dst, q + 1)] = (s, q, a.label)
    finals = [(int(cost[s][Q]), s) for s in range(S) if lat.is_final(s)]
    best_cost, best_s = min(finals)
    if best_cost >= INF:
        raise ValueError("no accepting path aligns with the reference")
    # traceback of the oracle path's emitted labels
    hyp_rev: list[int] = []
    s, q = best_s, Q
    while (s, q) != (0, 0):
        ps, pq, lab = back[(s, q)]
        if lab is not None:
            hyp_rev.append(lab)
        s, q = ps, pq
    return hyp_rev[::-1], int(best_cost)


# ---------------------------------------------------------------------------
# Kaldi lattice text interchange (lattice-copy ark,t: role)
# ---------------------------------------------------------------------------


def lattice_to_text(lat: Fst, utt_id: str) -> str:
    """Kaldi text-form Lattice record ([K latbin/lattice-copy.cc] with
    `ark,t:`): an utterance-id line, one line per arc
    `src dst ilabel olabel graph_cost,acoustic_cost`, final lines
    `state graph_cost,acoustic_cost`, then a blank separator line.

    Kaldi LatticeWeight stores COSTS (negated log-probs); this repo's
    lattices carry log-probs with `weight = graph + acoustic` and
    `weight2 = acoustic`, so the written pair is
    `(-(weight - weight2), -weight2)`.  Acceptor lattices write
    ilabel == olabel (phone/word ids; 0 = epsilon)."""
    lines = [utt_id]
    for s in range(lat.num_states):
        for a in lat.arcs(s):
            g = -(a.weight - a.weight2)
            am = -a.weight2
            lines.append(f"{s} {a.dst} {a.label} {a.label} {g:.7g},{am:.7g}")
        if lat.is_final(s):
            g = -(lat.final(s) - lat.final2(s))
            am = -lat.final2(s)
            lines.append(f"{s} {g:.7g},{am:.7g}")
    return "\n".join(lines) + "\n\n"


def write_lattice_ark(path: str, lats: dict[str, Fst]) -> None:
    """Write a text archive of lattices (`ark,t:` of Kaldi Lattice)."""
    with open(path, "w") as f:
        for utt, lat in lats.items():
            f.write(lattice_to_text(lat, utt))


def _parse_weight_pair(tok: str) -> tuple[float, float]:
    if "," in tok:
        parts = tok.split(",")
        g, am = float(parts[0]), float(parts[1])
        # CompactLattice text carries a third field (transition-id string,
        # comma-joined); ignore anything past the two costs
    else:
        g, am = float(tok), 0.0
    return g, am


def _is_int_token(tok: str) -> bool:
    try:
        int(tok)
    except ValueError:
        return False
    return True


def read_lattice_ark(path_or_text: str) -> dict[str, Fst]:
    """Read a Kaldi text lattice archive back into component-weighted Fsts
    (inverse of write_lattice_ark; also accepts raw archive text — anything
    containing a newline; a newline-free argument must be an existing file).

    Costs are negated back into log-probs: arc weight = -(g + am),
    weight2 = -am.  Kaldi Lattice arcs are transducers (transition-id :
    word); the OUTPUT label is kept, since scoring wants words.  Handled
    line forms, matching Kaldi's Weight::One omission rules:
      `src dst il ol g,am`  — weighted transducer (5 tokens)
      `src dst il ol`       — weightless transducer (4 tokens, last is int)
      `src dst lbl g,am`    — weighted acceptor (4 tokens, last has , or .)
      `src dst lbl`         — weightless acceptor (3 tokens)
      `state g,am` / `state` — finals; CompactLattice weight triples accept
      (trailing transition-id string ignored)."""
    import os

    text = path_or_text
    if "\n" not in path_or_text:
        if not os.path.exists(path_or_text):
            raise FileNotFoundError(path_or_text)
        with open(path_or_text) as f:
            text = f.read()
    out: dict[str, Fst] = {}
    cur: Fst | None = None

    def ensure(fst: Fst, state: int) -> None:
        while fst.num_states <= state:
            fst.add_state()

    pending_arcs: list[tuple] = []

    def flush():
        nonlocal pending_arcs
        if cur is not None:
            for src, dst, label, w, w2 in pending_arcs:
                cur.add_arc(src, label, w, dst, w2)
        pending_arcs = []

    for raw in text.splitlines():
        line = raw.strip()
        if not line:
            flush()
            cur = None
            continue
        parts = line.split()
        if cur is None:
            if len(parts) != 1:
                raise ValueError(f"expected utterance id line, got {line!r}")
            cur = Fst()
            out[parts[0]] = cur
            continue
        if len(parts) == 1:  # final state with zero weight
            ensure(cur, int(parts[0]))
            cur.set_final(int(parts[0]), 0.0, 0.0)
        elif len(parts) == 2:  # final: state g,am
            g, am = _parse_weight_pair(parts[1])
            ensure(cur, int(parts[0]))
            cur.set_final(int(parts[0]), -(g + am), -am)
        elif len(parts) == 5:  # src dst ilabel olabel weight
            src, dst = int(parts[0]), int(parts[1])
            label = int(parts[3])  # olabel: words, what scoring consumes
            g, am = _parse_weight_pair(parts[4])
            ensure(cur, max(src, dst))
            pending_arcs.append((src, dst, label, -(g + am), -am))
        elif len(parts) == 4:
            src, dst = int(parts[0]), int(parts[1])
            if _is_int_token(parts[3]):
                # weightless transducer (Kaldi omits Weight::One)
                label, g, am = int(parts[3]), 0.0, 0.0
            else:
                label = int(parts[2])
                g, am = _parse_weight_pair(parts[3])
            ensure(cur, max(src, dst))
            pending_arcs.append((src, dst, label, -(g + am), -am))
        elif len(parts) == 3:  # weightless acceptor arc
            src, dst, label = int(parts[0]), int(parts[1]), int(parts[2])
            ensure(cur, max(src, dst))
            pending_arcs.append((src, dst, label, 0.0, 0.0))
        else:
            raise ValueError(f"unparseable lattice line {line!r}")
    flush()
    return out

# ---------------------------------------------------------------------------
# Kaldi BINARY lattice interchange (lattice-copy default ark: role)
# ---------------------------------------------------------------------------
#
# A real Kaldi decode dir ships lat.N.gz as BINARY CompactLattice archives:
# records of `key ' ' \x00B <OpenFst binary>` with arc type compactlattice44
# (CompactLatticeWeight = (graph_cost, acoustic_cost) + an int32 transition-id
# alignment string) or lattice4 for non-compact Lattices
# (kaldi/src/lat/kaldi-lattice.cc WriteCompactLattice/ReadCompactLattice).
# The fstkit mapping mirrors lattice_to_text: weight = -(graph + acoustic)
# log-prob, weight2 = -acoustic; alignment strings are not modeled by this
# repo's lattices and are written empty / dropped on read (Kaldi scoring
# ignores them; lattice-align-words would need them).


def write_lattice_ark_binary(
    path: str, lats: "dict[str, Fst]", compact: bool = True
) -> None:
    """Write a binary Kaldi lattice archive (CompactLattice by default, the
    `lattice-copy ark:` output form; compact=False writes Lattice/lattice4).

    This repo's lattices are acceptors over word ids, so ilabel == olabel
    is written — the CompactLattice convention exactly (words on both
    sides), and for Lattice the transducer input side (transition-ids) is
    not available, as documented above."""
    from torchain_tpu.fstkit.openfst_io import from_fstkit, write_fst_stream

    arctype = "compactlattice44" if compact else "lattice4"
    with open(path, "wb") as f:
        for utt, lat in lats.items():
            if " " in utt:
                raise ValueError("utterance ids must not contain spaces")
            f.write(utt.encode() + b" \x00B")
            write_fst_stream(f, from_fstkit(lat, arctype=arctype))


def read_lattice_ark_binary(path: str) -> "dict[str, Fst]":
    """Read a binary Kaldi lattice archive (CompactLattice or Lattice) back
    into component-weighted fstkit lattices.  For Lattice records the
    OUTPUT label (words) is kept, matching read_lattice_ark."""
    from torchain_tpu.fstkit.openfst_io import read_fst_stream, to_fstkit

    from torchain_tpu.io import read_ark_key

    out: "dict[str, Fst]" = {}
    with open(path, "rb") as f:
        while True:
            key = read_ark_key(f, what="lattice ark")
            if key is None:
                break
            marker = f.read(2)
            if marker != b"\x00B":
                raise ValueError(
                    f"record {key!r} lacks the binary marker; "
                    "use read_lattice_ark for text archives"
                )
            raw = read_fst_stream(f, allow_stream_counts=False)
            if raw.arctype not in ("lattice4", "compactlattice44"):
                raise ValueError(
                    f"record {key!r} has arc type {raw.arctype!r}, "
                    "not a Kaldi lattice"
                )
            fst, olabels = to_fstkit(raw)
            if raw.arctype == "lattice4":
                # keep the word (output) side, as the text reader does
                relabeled = Fst()
                relabeled.add_states(fst.num_states)
                k = 0
                for s in range(fst.num_states):
                    for a in fst.arcs(s):
                        relabeled.add_arc(s, olabels[k], a.weight, a.dst, a.weight2)
                        k += 1
                    if fst.is_final(s):
                        relabeled.set_final(s, fst.final(s), fst.final2(s))
                fst = relabeled
            out[key] = fst
    return out
