"""Native active-token lattice generation vs the numpy reference."""

import numpy as np
import pytest

from torchain_tpu.eval.decoder import make_decoding_graph
from torchain_tpu.eval.lattice import (
    determinize_lattice,
    lattice_best_path,
    lattice_decode,
    lattice_nbest,
    mbr_decode,
    rescore_lattice,
)
from torchain_tpu.eval.native import get_lib, native_lattice
from torchain_tpu.fstkit import shortest_distance
from torchain_tpu.graphs.phone_lm import PhoneLmOptions, estimate_phone_lm
from torchain_tpu.graphs.topology import ContextTree

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native decoder library unavailable"
)


def _fixture(seed=0, T=10, num_phones=4):
    rng = np.random.default_rng(seed)
    sents = [
        list(map(int, rng.integers(1, num_phones + 1, size=rng.integers(3, 7))))
        for _ in range(40)
    ]
    lm = estimate_phone_lm(
        sents, PhoneLmOptions(ngram_order=2, num_extra_lm_states=30)
    )
    tree = ContextTree(num_phones)
    graph = make_decoding_graph(lm, tree)
    y = (rng.normal(size=(T, tree.num_pdfs)) * 1.5).astype(np.float32)
    return graph, y


def _canonical(lat):
    """Order-independent content signature of a lattice."""
    arcs = sorted(
        (s, a.dst, a.label, round(a.weight, 4), round(a.weight2, 4))
        for s, a in lat.all_arcs()
    )
    finals = sorted(
        (s, round(lat.final(s), 4))
        for s in range(lat.num_states)
        if lat.is_final(s)
    )
    return len(arcs), arcs[:50], finals[:20]


class TestNativeMatchesNumpy:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("beam", [4.0, 8.0, 16.0])
    def test_equal_beam_contents(self, seed, beam):
        graph, y = _fixture(seed=seed)
        ref = lattice_decode(graph, y, beam=beam, backend="numpy")
        nat = lattice_decode(graph, y, beam=beam, backend="native")
        assert nat.num_arcs == ref.num_arcs
        assert nat.num_states == ref.num_states
        # same total tropical weight and same best path
        p0, s0 = lattice_best_path(ref)
        p1, s1 = lattice_best_path(nat)
        assert p0 == p1
        assert s1 == pytest.approx(s0, abs=1e-4)
        # same full (log-semiring) mass
        t0 = shortest_distance(ref, reverse_dir=True, semiring="log")[0]
        t1 = shortest_distance(nat, reverse_dir=True, semiring="log")[0]
        assert t1 == pytest.approx(t0, abs=1e-4)

    def test_determinized_nbest_identical(self):
        graph, y = _fixture(seed=3)
        ref = lattice_decode(graph, y, beam=10.0, backend="numpy")
        nat = lattice_decode(graph, y, beam=10.0, backend="native")
        n0 = lattice_nbest(ref, n=8)
        n1 = lattice_nbest(nat, n=8)
        assert [seq for seq, _ in n0] == [seq for seq, _ in n1]
        for (_, w0), (_, w1) in zip(n0, n1):
            assert w1 == pytest.approx(w0, abs=1e-4)

    def test_determinize_contents(self):
        graph, y = _fixture(seed=4, T=8)
        ref = determinize_lattice(lattice_decode(graph, y, beam=8.0, backend="numpy"))
        nat = determinize_lattice(lattice_decode(graph, y, beam=8.0, backend="native"))
        assert _canonical(ref) == _canonical(nat)

    def test_use_final_false_and_phone_bonus(self):
        graph, y = _fixture(seed=5, T=6)
        for kwargs in ({"use_final": False}, {"phone_bonus": 0.7}):
            ref = lattice_decode(graph, y, beam=8.0, backend="numpy", **kwargs)
            nat = lattice_decode(graph, y, beam=8.0, backend="native", **kwargs)
            assert nat.num_arcs == ref.num_arcs
            p0, s0 = lattice_best_path(ref)
            p1, s1 = lattice_best_path(nat)
            assert p0 == p1 and s1 == pytest.approx(s0, abs=1e-4)

    def test_mbr_and_rescore_pipelines(self):
        graph, y = _fixture(seed=6)
        ref = lattice_decode(graph, y, beam=10.0, backend="numpy")
        nat = lattice_decode(graph, y, beam=10.0, backend="native")
        assert mbr_decode(ref).words == mbr_decode(nat).words
        p0, _ = lattice_best_path(rescore_lattice(ref, lm_scale=7.0))
        p1, _ = lattice_best_path(rescore_lattice(nat, lm_scale=7.0))
        assert p0 == p1


class TestMaxActive:
    def test_max_active_prunes_frontier(self):
        graph, y = _fixture(seed=7, T=12)
        full = lattice_decode(graph, y, beam=1e6, backend="native")
        capped = lattice_decode(graph, y, beam=1e6, max_active=3, backend="native")
        assert capped.num_arcs < full.num_arcs
        # the Viterbi path survives a generous cap
        p_full, s_full = lattice_best_path(full)
        wide = lattice_decode(graph, y, beam=1e6, max_active=200, backend="native")
        p_wide, s_wide = lattice_best_path(wide)
        assert p_wide == p_full and s_wide == pytest.approx(s_full, abs=1e-4)

    def test_numpy_rejects_max_active(self):
        graph, y = _fixture(seed=8, T=4)
        with pytest.raises(ValueError, match="max_active"):
            lattice_decode(graph, y, beam=8.0, max_active=5, backend="numpy")


class TestErrors:
    def test_dead_beam_raises(self):
        graph, y = _fixture(seed=9, T=4)
        with pytest.raises(ValueError, match="died"):
            native_lattice(graph, y, beam=-1.0)
