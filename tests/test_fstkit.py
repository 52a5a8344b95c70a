"""fstkit unit tests: algorithms verified against brute-force path oracles."""

import math
import random

import pytest

from torchain_tpu.fstkit import (
    Fst,
    NEG_INF,
    arcsort,
    bfs_time_sort,
    compose,
    connect,
    enumerate_paths,
    reverse,
    rm_epsilon,
    shortest_distance,
    topsort,
    total_weight,
)
from torchain_tpu.fstkit.fst import log_add


def logsumexp(xs):
    xs = [x for x in xs if x > NEG_INF]
    if not xs:
        return NEG_INF
    m = max(xs)
    return m + math.log(sum(math.exp(x - m) for x in xs))


def path_set(fst):
    """dict label-seq -> total log weight."""
    acc = {}
    for labels, w in enumerate_paths(fst):
        acc[labels] = log_add(acc.get(labels, NEG_INF), w)
    return acc


def random_acyclic_fst(rng, n_states=8, n_labels=4, arc_prob=0.5, eps_prob=0.0):
    """Random acyclic acceptor: arcs only go forward in state numbering."""
    fst = Fst()
    fst.add_states(n_states)
    for s in range(n_states - 1):
        for t in range(s + 1, n_states):
            if rng.random() < arc_prob:
                label = 0 if rng.random() < eps_prob else rng.randint(1, n_labels)
                fst.add_arc(s, label, rng.uniform(-2.0, 0.0), t)
    fst.set_final(n_states - 1, rng.uniform(-1.0, 0.0))
    if rng.random() < 0.3:
        fst.set_final(rng.randint(1, n_states - 1), rng.uniform(-1.0, 0.0))
    return connect(fst)


class TestBasics:
    def test_build_and_text_roundtrip(self):
        fst = Fst()
        fst.add_states(3)
        fst.add_arc(0, 1, -0.5, 1)
        fst.add_arc(1, 2, -0.25, 2)
        fst.set_final(2, -0.1)
        rt = Fst.from_text(fst.to_text())
        assert rt.num_states == 3
        assert rt.num_arcs == 2
        assert rt.final(2) == pytest.approx(-0.1)
        assert rt.arcs(0)[0].label == 1

    def test_connect_removes_dead_states(self):
        fst = Fst()
        fst.add_states(4)
        fst.add_arc(0, 1, 0.0, 1)
        fst.add_arc(0, 2, 0.0, 2)  # state 2 is a dead end
        fst.add_arc(1, 3, 0.0, 3)
        fst.set_final(3, 0.0)
        trimmed = connect(fst)
        assert trimmed.num_states == 3
        assert trimmed.num_arcs == 2

    def test_connect_empty_language(self):
        fst = Fst()
        fst.add_states(2)
        fst.add_arc(0, 1, 0.0, 1)  # no final state anywhere
        assert connect(fst).num_states == 0


class TestShortestDistance:
    def test_total_weight_matches_enumeration(self):
        rng = random.Random(0)
        for _ in range(20):
            fst = random_acyclic_fst(rng)
            if fst.num_states == 0:
                continue
            oracle = logsumexp([w for _, w in enumerate_paths(fst)])
            assert total_weight(fst) == pytest.approx(oracle, abs=1e-9)

    def test_forward_backward_consistency(self):
        # sum_s alpha[s] * arcs-out... simplest invariant:
        # total = backward[start] = logsumexp over finals of forward+final
        rng = random.Random(1)
        for _ in range(10):
            fst = random_acyclic_fst(rng)
            if fst.num_states == 0:
                continue
            fwd = shortest_distance(fst, reverse_dir=False)
            tot_f = logsumexp(
                [fwd[s] + fst.final(s) for s in range(fst.num_states) if fst.is_final(s)]
            )
            assert tot_f == pytest.approx(total_weight(fst), abs=1e-9)

    def test_tropical_is_best_path(self):
        rng = random.Random(2)
        for _ in range(10):
            fst = random_acyclic_fst(rng)
            if fst.num_states == 0:
                continue
            best = max(w for _, w in enumerate_paths(fst))
            assert total_weight(fst, semiring="tropical") == pytest.approx(best, abs=1e-9)


class TestRmEpsilon:
    def test_preserves_path_weights(self):
        rng = random.Random(3)
        checked = 0
        for _ in range(30):
            fst = random_acyclic_fst(rng, eps_prob=0.4)
            if fst.num_states == 0:
                continue
            noeps = rm_epsilon(fst)
            assert not noeps.has_epsilons()
            assert path_set(fst).keys() == path_set(noeps).keys()
            for k, v in path_set(fst).items():
                assert path_set(noeps)[k] == pytest.approx(v, abs=1e-9)
            checked += 1
        assert checked > 10

    def test_epsilon_cycle_raises(self):
        fst = Fst()
        fst.add_states(2)
        fst.add_arc(0, 0, -0.5, 1)
        fst.add_arc(1, 0, -0.5, 0)
        fst.set_final(1, 0.0)
        with pytest.raises(ValueError):
            rm_epsilon(fst)


class TestCompose:
    def test_intersection_semantics(self):
        rng = random.Random(4)
        checked = 0
        for _ in range(30):
            a = random_acyclic_fst(rng, n_states=6, n_labels=3)
            b = random_acyclic_fst(rng, n_states=6, n_labels=3)
            if a.num_states == 0 or b.num_states == 0:
                continue
            c = compose(a, b)
            pa, pb = path_set(a), path_set(b)
            expected = {
                k: pa[k] + pb[k] for k in set(pa) & set(pb)
            }
            got = path_set(c) if c.num_states else {}
            assert got.keys() == expected.keys()
            for k in expected:
                assert got[k] == pytest.approx(expected[k], abs=1e-9)
            checked += 1
        assert checked > 10

    def test_rejects_epsilons(self):
        a = Fst()
        a.add_states(2)
        a.add_arc(0, 0, 0.0, 1)
        a.set_final(1)
        with pytest.raises(ValueError):
            compose(a, a)


class TestMergeBisimilar:
    def test_merges_identical_suffix_states(self):
        from torchain_tpu.fstkit import merge_bisimilar

        # two parallel branches with identical futures must collapse
        fst = Fst()
        fst.add_states(6)
        fst.add_arc(0, 1, -0.1, 1)
        fst.add_arc(0, 2, -0.2, 2)
        fst.add_arc(1, 3, -0.3, 3)  # states 3 and 4 are bisimilar
        fst.add_arc(2, 3, -0.3, 4)
        fst.add_arc(3, 4, -0.4, 5)
        fst.add_arc(4, 4, -0.4, 5)
        fst.set_final(5, 0.0)
        merged = merge_bisimilar(fst)
        # 3/4 collapse, after which 1/2 share identical futures too
        assert merged.num_states == 4
        a, b = path_set(fst), path_set(merged)
        assert a.keys() == b.keys()
        for k in a:
            assert b[k] == pytest.approx(a[k], abs=1e-9)

    def test_language_preserved_on_random_fsts(self):
        from torchain_tpu.fstkit import merge_bisimilar

        rng = random.Random(11)
        for _ in range(15):
            fst = random_acyclic_fst(rng)
            if fst.num_states == 0:
                continue
            merged = merge_bisimilar(fst)
            assert merged.num_states <= fst.num_states
            a, b = path_set(fst), path_set(merged)
            assert a.keys() == b.keys()
            for k in a:
                assert b[k] == pytest.approx(a[k], abs=1e-9)


class TestSorts:
    def test_topsort_orders_arcs_forward(self):
        rng = random.Random(5)
        fst = random_acyclic_fst(rng)
        # scramble state order first
        perm = list(range(fst.num_states))
        rest = perm[1:]
        rng.shuffle(rest)
        scrambled = fst.relabel_states([0] + rest)
        sorted_fst = topsort(scrambled)
        for s, a in sorted_fst.all_arcs():
            assert a.dst > s
        # language preserved
        assert path_set(sorted_fst).keys() == path_set(fst).keys()

    def test_bfs_time_sort_frame_property(self):
        # Build an FST where every path consumes one label per arc; after
        # bfs_time_sort, states reached at frame t must form contiguous
        # nondecreasing ranges.
        fst = Fst()
        fst.add_states(5)
        fst.add_arc(0, 1, 0.0, 2)
        fst.add_arc(0, 2, 0.0, 1)
        fst.add_arc(1, 1, 0.0, 3)
        fst.add_arc(2, 2, 0.0, 3)
        fst.add_arc(3, 1, 0.0, 4)
        fst.set_final(4, 0.0)
        out = bfs_time_sort(fst)
        # frame of each state = length of label prefix; BFS order must be
        # monotonic in frame index
        frames = {0: 0}
        order_frames = [0]
        for s in range(out.num_states):
            for a in out.arcs(s):
                if a.dst not in frames:
                    frames[a.dst] = frames[s] + 1
        assert sorted(frames.values()) == [frames[s] for s in range(out.num_states)]

    def test_reverse_preserves_reversed_paths(self):
        rng = random.Random(6)
        fst = random_acyclic_fst(rng)
        rev = reverse(fst)
        fwd_paths = {tuple(reversed(k)): v for k, v in path_set(fst).items()}
        rev_paths = path_set(rev)
        assert rev_paths.keys() == fwd_paths.keys()
        for k in fwd_paths:
            assert rev_paths[k] == pytest.approx(fwd_paths[k], abs=1e-9)
