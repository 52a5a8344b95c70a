"""Lattice determinization (determinize-lattice-pruned role) + exact
N-best, verified against brute-force path enumeration."""

import math

import numpy as np
import pytest

from torchain_tpu.eval import (
    determinize_lattice,
    lattice_best_path,
    lattice_decode,
    lattice_nbest,
    make_decoding_graph,
    viterbi_decode,
)
from torchain_tpu.fstkit import Fst, enumerate_paths
from torchain_tpu.graphs import ContextTree, PhoneLmOptions, estimate_phone_lm


def _label_seqs(fst):
    """label-sequence -> best tropical weight, by brute enumeration."""
    best = {}
    for labels, w in enumerate_paths(fst):
        seq = tuple(l for l in labels if l > 0)
        if seq not in best or w > best[seq]:
            best[seq] = w
    return best


def _hand_lattice():
    """Small ambiguous lattice with epsilons and duplicate sequences."""
    f = Fst()
    for _ in range(6):
        f.add_state()
    f.add_arc(0, 1, -1.0, 1)
    f.add_arc(0, 1, -2.5, 2)  # same label, different route
    f.add_arc(1, 0, -0.2, 3)  # epsilon
    f.add_arc(2, 2, -0.1, 3)
    f.add_arc(3, 3, -0.3, 4)
    f.add_arc(1, 2, -1.1, 4)
    f.add_arc(4, 0, -0.05, 5)  # epsilon into final
    f.set_final(4, -0.5)
    f.set_final(5, 0.0)
    return f


def test_determinized_has_unique_paths_per_sequence():
    lat = _hand_lattice()
    det = determinize_lattice(lat)
    seqs = [tuple(l for l in labels if l > 0) for labels, _ in enumerate_paths(det)]
    assert len(seqs) == len(set(seqs))
    # deterministic: no state has two arcs with the same label, no epsilons
    assert not det.has_epsilons()
    for s in range(det.num_states):
        labs = [a.label for a in det.arcs(s)]
        assert len(labs) == len(set(labs))


def test_determinized_weights_are_per_sequence_best():
    lat = _hand_lattice()
    det = determinize_lattice(lat)
    ref = _label_seqs(lat)
    got = _label_seqs(det)
    assert set(got) == set(ref)
    for seq, w in ref.items():
        assert got[seq] == pytest.approx(w, abs=1e-9)


def test_determinize_on_real_decode_lattice():
    rng = np.random.default_rng(0)
    sents = [list(map(int, rng.integers(1, 5, size=rng.integers(3, 7)))) for _ in range(40)]
    lm = estimate_phone_lm(sents, PhoneLmOptions(ngram_order=2, num_extra_lm_states=30))
    tree = ContextTree(4)
    graph = make_decoding_graph(lm, tree)
    y = (rng.normal(size=(8, tree.num_pdfs)) * 1.5).astype(np.float32)
    lat = lattice_decode(graph, y, beam=8.0)
    det = determinize_lattice(lat)
    ref = _label_seqs(lat)
    got = _label_seqs(det)
    assert got.keys() == ref.keys()
    for seq in ref:
        assert got[seq] == pytest.approx(ref[seq], abs=1e-4)
    # best path survives determinization exactly
    p1, s1 = lattice_best_path(lat)
    p2, s2 = lattice_best_path(det)
    assert p1 == p2
    assert s1 == pytest.approx(s2, abs=1e-4)
    hyp, score = viterbi_decode(graph, y)
    assert p2 == hyp
    assert s2 == pytest.approx(score, abs=1e-4)


def test_exact_nbest_matches_brute_force():
    rng = np.random.default_rng(1)
    sents = [list(map(int, rng.integers(1, 4, size=rng.integers(3, 6)))) for _ in range(30)]
    lm = estimate_phone_lm(sents, PhoneLmOptions(ngram_order=2, num_extra_lm_states=20))
    tree = ContextTree(3)
    graph = make_decoding_graph(lm, tree)
    y = (rng.normal(size=(6, tree.num_pdfs)) * 1.2).astype(np.float32)
    lat = lattice_decode(graph, y, beam=10.0)
    ref = sorted(_label_seqs(lat).items(), key=lambda kv: -kv[1])
    for n in (1, 3, 8):
        nb = lattice_nbest(lat, n, determinize=True)
        assert len(nb) == min(n, len(ref))
        for (ph, sc), (rseq, rsc) in zip(nb, ref):
            assert sc == pytest.approx(rsc, abs=1e-4)
            # scores may tie; compare score ordering strictly, sequences
            # only when scores are distinct
        got_scores = [sc for _, sc in nb]
        ref_scores = [rsc for _, rsc in ref[: len(nb)]]
        np.testing.assert_allclose(got_scores, ref_scores, atol=1e-4)


def test_nbest_sequences_are_unique_and_sorted():
    lat = _hand_lattice()
    nb = lattice_nbest(lat, 10, determinize=True)
    seqs = [tuple(p) for p, _ in nb]
    assert len(seqs) == len(set(seqs))
    scores = [s for _, s in nb]
    assert scores == sorted(scores, reverse=True)
