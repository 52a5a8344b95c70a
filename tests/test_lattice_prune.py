"""prune_lattice (lattice-prune role), verified against brute-force path
enumeration: arc-level keep/drop decisions, no over- or under-pruning,
best path and weight components preserved."""

import numpy as np

from torchain_tpu.eval import (
    lattice_best_path,
    lattice_decode,
    prune_lattice,
    make_decoding_graph,
)
from torchain_tpu.fstkit import Fst, enumerate_paths
from torchain_tpu.graphs import ContextTree, PhoneLmOptions, estimate_phone_lm


def _decode_fixture(seed=0, T=8):
    rng = np.random.default_rng(seed)
    sents = [
        list(map(int, rng.integers(1, 5, size=rng.integers(3, 7))))
        for _ in range(40)
    ]
    lm = estimate_phone_lm(
        sents, PhoneLmOptions(ngram_order=2, num_extra_lm_states=30)
    )
    tree = ContextTree(4)
    graph = make_decoding_graph(lm, tree)
    y = (rng.normal(size=(T, tree.num_pdfs)) * 1.5).astype(np.float32)
    return graph, y


def _lat(seed=0, beam=14.0):
    graph, y = _decode_fixture(seed)
    return lattice_decode(graph, y, beam=beam)


def test_huge_beam_is_identity_on_paths():
    lat = _lat(0)
    pruned = prune_lattice(lat, 1e9)
    a = sorted((tuple(l), round(w, 6)) for l, w in enumerate_paths(lat))
    b = sorted((tuple(l), round(w, 6)) for l, w in enumerate_paths(pruned))
    assert a == b


def test_best_path_survives_any_beam():
    lat = _lat(1)
    _, best = lattice_best_path(lat)
    for beam in (0.01, 1.0, 5.0):
        pruned = prune_lattice(lat, beam)
        _, best_p = lattice_best_path(pruned)
        assert abs(best_p - best) < 1e-6


def test_no_over_pruning_paths_within_beam_survive():
    lat = _lat(2)
    paths = list(enumerate_paths(lat))
    best = max(w for _, w in paths)
    beam = 3.0
    keep = sorted(
        (tuple(l), round(w, 6)) for l, w in paths if w >= best - beam - 1e-9
    )
    got = set(
        (tuple(l), round(w, 6)) for l, w in enumerate_paths(prune_lattice(lat, beam))
    )
    for p in keep:
        assert p in got


def test_no_under_pruning_every_arc_on_a_good_path():
    """Every surviving path must score >= best - beam when beams are
    checked arc-wise: verify each pruned arc lies on SOME original path
    within the beam (the Kaldi arc-level guarantee)."""
    lat = _lat(3)
    paths = list(enumerate_paths(lat))
    best = max(w for _, w in paths)
    beam = 2.0
    pruned = prune_lattice(lat, beam)
    # recompute arc-level max-path-through scores on the pruned lattice
    from torchain_tpu.fstkit import shortest_distance

    fwd = shortest_distance(pruned, reverse_dir=False, semiring="tropical")
    bwd = shortest_distance(pruned, reverse_dir=True, semiring="tropical")
    for s, a in pruned.all_arcs():
        assert fwd[s] + a.weight + bwd[a.dst] >= best - beam - 1e-6


def test_weight2_components_preserved():
    lat = _lat(4)
    pruned = prune_lattice(lat, 4.0)
    orig = {}
    for s, a in lat.all_arcs():
        orig.setdefault((a.label, round(a.weight, 6)), set()).add(
            round(a.weight2, 6)
        )
    for s, a in pruned.all_arcs():
        key = (a.label, round(a.weight, 6))
        assert key in orig and round(a.weight2, 6) in orig[key]


def test_empty_and_no_path_lattices():
    assert prune_lattice(Fst(), 5.0).num_states == 0
    f = Fst()
    f.add_states(2)
    f.add_arc(0, 1, -1.0, 1)  # state 1 is not final: no accepting path
    assert prune_lattice(f, 5.0).num_states == 0
