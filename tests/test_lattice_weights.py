"""Two-component lattice weights (Kaldi LatticeWeight graph/acoustic
split) and the score.sh-style LMWT sweep, verified against brute-force
path enumeration of both components."""

import numpy as np
import pytest

from torchain_tpu.eval import (
    determinize_lattice,
    lattice_best_path,
    lattice_decode,
    lattice_nbest,
    make_decoding_graph,
    rescore_lattice,
    score_sweep,
)
from torchain_tpu.fstkit import Fst
from torchain_tpu.graphs import ContextTree, PhoneLmOptions, estimate_phone_lm


def _paths_with_components(fst):
    """Enumerate (label_seq, total, acoustic) for every complete path."""
    out = []

    def walk(s, labels, w, w2):
        if fst.is_final(s):
            out.append((tuple(labels), w + fst.final(s), w2 + fst.final2(s)))
        for a in fst.arcs(s):
            nl = labels + [a.label] if a.label > 0 else labels
            walk(a.dst, nl, w + a.weight, w2 + a.weight2)

    if fst.num_states:
        walk(0, [], 0.0, 0.0)
    return out


def _best_by_seq(paths):
    best = {}
    for seq, w, w2 in paths:
        if seq not in best or w > best[seq][0]:
            best[seq] = (w, w2)
    return best


def _decode_fixture(seed=0, T=8):
    rng = np.random.default_rng(seed)
    sents = [
        list(map(int, rng.integers(1, 5, size=rng.integers(3, 7))))
        for _ in range(40)
    ]
    lm = estimate_phone_lm(sents, PhoneLmOptions(ngram_order=2, num_extra_lm_states=30))
    tree = ContextTree(4)
    graph = make_decoding_graph(lm, tree)
    y = (rng.normal(size=(T, tree.num_pdfs)) * 1.5).astype(np.float32)
    return graph, y


class TestComponentTracking:
    def test_decode_lattice_splits_graph_and_acoustic(self):
        graph, y = _decode_fixture()
        lat = lattice_decode(graph, y, beam=8.0)
        assert lat.num_arcs > 0
        # every arc: acoustic component is one frame's loglike, and the
        # graph part (weight - weight2) is one decoding-graph arc weight
        graph_ws = set(np.round(graph.weight.astype(float), 5).tolist())
        am_vals = set(np.round(np.asarray(y, float).ravel(), 5).tolist())
        for _, a in lat.all_arcs():
            assert round(a.weight2, 5) in am_vals
            assert round(a.weight - a.weight2, 5) in graph_ws
        # finals are graph-side only
        for s in range(lat.num_states):
            if lat.is_final(s):
                assert lat.final2(s) == 0.0

    def test_identity_rescore_is_noop(self):
        graph, y = _decode_fixture(seed=1)
        lat = lattice_decode(graph, y, beam=8.0)
        same = rescore_lattice(lat, acoustic_scale=1.0, lm_scale=1.0)
        p0, s0 = lattice_best_path(lat)
        p1, s1 = lattice_best_path(same)
        assert p0 == p1 and s0 == pytest.approx(s1, abs=1e-9)

    def test_rescore_composes(self):
        graph, y = _decode_fixture(seed=2)
        lat = lattice_decode(graph, y, beam=8.0)
        once = rescore_lattice(lat, acoustic_scale=0.5, lm_scale=3.0)
        twice = rescore_lattice(once, acoustic_scale=2.0, lm_scale=1.0)
        # acoustic 0.5*2=1, graph 3*1=3 == single rescore at (1, 3)
        direct = rescore_lattice(lat, acoustic_scale=1.0, lm_scale=3.0)
        for (_, a), (_, b) in zip(twice.all_arcs(), direct.all_arcs()):
            assert a.weight == pytest.approx(b.weight, abs=1e-9)
            assert a.weight2 == pytest.approx(b.weight2, abs=1e-9)

    def test_rescore_equals_manual_reweigh_of_paths(self):
        graph, y = _decode_fixture(seed=3, T=6)
        lat = lattice_decode(graph, y, beam=10.0)
        lmwt = 7.0
        scaled = rescore_lattice(lat, acoustic_scale=1.0, lm_scale=lmwt)
        # brute force: best reweighed total per sequence
        best = {}
        for seq, w, w2 in _paths_with_components(lat):
            v = lmwt * (w - w2) + w2
            if seq not in best or v > best[seq]:
                best[seq] = v
        got = _best_by_seq(_paths_with_components(scaled))
        assert set(got) == set(best)
        for seq, v in best.items():
            assert got[seq][0] == pytest.approx(v, abs=1e-6)


class TestDeterminizeComponents:
    def test_determinize_preserves_winner_components(self):
        graph, y = _decode_fixture(seed=4, T=7)
        lat = lattice_decode(graph, y, beam=8.0)
        det = determinize_lattice(lat)
        ref = _best_by_seq(_paths_with_components(lat))
        got = _best_by_seq(_paths_with_components(det))
        assert set(got) == set(ref)
        for seq, (w, w2) in ref.items():
            assert got[seq][0] == pytest.approx(w, abs=1e-6)
            assert got[seq][1] == pytest.approx(w2, abs=1e-6)

    def test_rescore_after_determinize_matches_rescore_before(self):
        # the point of component tracking: LMWT rescoring commutes with
        # determinization for the best path
        graph, y = _decode_fixture(seed=5, T=7)
        lat = lattice_decode(graph, y, beam=8.0)
        det = determinize_lattice(lat)
        for lmwt in (0.5, 1.0, 4.0, 10.0):
            p_lat, s_lat = lattice_best_path(
                rescore_lattice(lat, lm_scale=lmwt)
            )
            p_det, s_det = lattice_best_path(
                rescore_lattice(det, lm_scale=lmwt)
            )
            assert p_lat == p_det
            assert s_lat == pytest.approx(s_det, abs=1e-5)


class TestNbestComponents:
    def test_nbest_components_sum_check(self):
        graph, y = _decode_fixture(seed=6, T=6)
        lat = lattice_decode(graph, y, beam=10.0)
        nb = lattice_nbest(lat, 5, determinize=True, return_components=True)
        ref = _best_by_seq(_paths_with_components(lat))
        for ph, sc, am in nb:
            w, w2 = ref[tuple(ph)]
            assert sc == pytest.approx(w, abs=1e-5)
            assert am == pytest.approx(w2, abs=1e-5)
        # default API unchanged: 2-tuples
        nb2 = lattice_nbest(lat, 3)
        assert all(len(e) == 2 for e in nb2)


class TestScoreSweep:
    def test_sweep_picks_lm_weight_that_fixes_errors(self):
        # Hand lattice: hypothesis A=(1,) favored by acoustic evidence,
        # B=(2,) favored by the graph.  ref = B, so a large-enough LMWT
        # must flip the best path to B and reach 0% WER.
        lat = Fst()
        for _ in range(2):
            lat.add_state()
        lat.add_arc(0, 1, -1.0 + 0.0, 1, 0.0)  # A: graph -1.0, acoustic 0
        lat.add_arc(0, 2, -0.2 - 1.5, 1, -1.5)  # B: graph -0.2, acoustic -1.5
        lat.set_final(1, 0.0)
        # at lm_scale=1 A wins (-1.0 > -1.7)
        p, _ = lattice_best_path(lat)
        assert p == [1]
        best_lmwt, res, hyps, by_lmwt = score_sweep(
            [lat], [[2]], lmwt_range=range(1, 10)
        )
        assert hyps[0] == [2]
        assert res["wer"] == 0.0
        # the winning weight must be one where B overtakes A:
        # lmwt*(-0.2) - 1.5 > lmwt*(-1.0)  <=>  lmwt > 1.875
        assert best_lmwt >= 2
        assert by_lmwt[1] > 0.0

    def test_word_insertion_penalty_axis(self):
        # insertion penalty suppresses the longer hypothesis
        lat = Fst()
        for _ in range(3):
            lat.add_state()
        lat.add_arc(0, 1, -0.1, 1, -0.1)  # (1,) then stop: total -0.1
        lat.add_arc(1, 2, -0.05, 2, -0.05)  # (1,2): total -0.15
        lat.set_final(1, -0.3)
        lat.set_final(2, 0.0)
        # unpenalized: (1,2) = -0.15 beats (1,) = -0.4
        p, _ = lattice_best_path(lat)
        assert p == [1, 2]
        _, res, hyps, _ = score_sweep(
            [lat], [[1]], lmwt_range=[1], word_insertion_penalty=0.5
        )
        assert hyps[0] == [1]
        assert res["wer"] == 0.0


class TestLatticeTextInterchange:
    def test_round_trip_preserves_components(self, tmp_path):
        from torchain_tpu.eval import read_lattice_ark, write_lattice_ark

        graph, y = _decode_fixture(seed=7, T=6)
        lats = {
            "utt0": lattice_decode(graph, y, beam=8.0),
            "utt1": lattice_decode(graph, y * 0.7, beam=8.0),
        }
        path = str(tmp_path / "lat.ark.txt")
        write_lattice_ark(path, lats)
        back = read_lattice_ark(path)
        assert set(back) == {"utt0", "utt1"}
        for utt, lat in lats.items():
            got = back[utt]
            assert got.num_states == lat.num_states
            assert got.num_arcs == lat.num_arcs
            for (s0, a0), (s1, a1) in zip(lat.all_arcs(), got.all_arcs()):
                assert (s0, a0.label, a0.dst) == (s1, a1.label, a1.dst)
                assert a1.weight == pytest.approx(a0.weight, abs=1e-5)
                assert a1.weight2 == pytest.approx(a0.weight2, abs=1e-5)
            for s in range(lat.num_states):
                assert got.is_final(s) == lat.is_final(s)
                if lat.is_final(s):
                    assert got.final(s) == pytest.approx(lat.final(s), abs=1e-5)
            # behavioral check: rescored best path survives the round trip
            p0, s0 = lattice_best_path(rescore_lattice(lat, lm_scale=5.0))
            p1, s1 = lattice_best_path(rescore_lattice(got, lm_scale=5.0))
            assert p0 == p1 and s0 == pytest.approx(s1, abs=1e-4)

    def test_reads_kaldi_style_golden_record(self):
        from torchain_tpu.eval import read_lattice_ark

        # hand-written Kaldi `lattice-copy ark,t:` style record: costs are
        # negated log-probs, transducer arcs (ilabel olabel), final with
        # and without explicit weight, blank-line separated
        text = (
            "utt_a\n"
            "0 1 3 3 0.5,2.25\n"
            "0 1 4 4 1.0,1.0\n"
            "1 2 0 0 0.25,0\n"
            "2 0.75,0.5\n"
            "\n"
            "utt_b\n"
            "0 1 7 7 1,1\n"
            "1\n"
            "\n"
        )
        lats = read_lattice_ark(text)
        a = lats["utt_a"]
        assert a.num_states == 3 and a.num_arcs == 3
        arc0 = a.arcs(0)[0]
        assert arc0.label == 3
        assert arc0.weight == pytest.approx(-(0.5 + 2.25))
        assert arc0.weight2 == pytest.approx(-2.25)
        assert a.final(2) == pytest.approx(-(0.75 + 0.5))
        assert a.final2(2) == pytest.approx(-0.5)
        b = lats["utt_b"]
        assert b.is_final(1) and b.final(1) == 0.0

    def test_reads_weightless_transducer_arcs_and_keeps_olabel(self):
        from torchain_tpu.eval import read_lattice_ark

        # Kaldi omits Weight::One -> `src dst il ol` (4 int tokens), and
        # Lattice arcs are (transition-id : word): the WORD (olabel) is
        # what scoring consumes
        text = (
            "utt\n"
            "0 1 101 7 0.5,0.25\n"  # transid 101, word 7, weighted
            "1 2 102 8\n"           # transid 102, word 8, weightless
            "2 3 9 1.5,0\n"         # weighted acceptor (non-int last token)
            "3\n"
            "\n"
        )
        lat = read_lattice_ark(text)["utt"]
        labels = [a.label for _, a in lat.all_arcs()]
        assert labels == [7, 8, 9]
        ws = {a.label: (a.weight, a.weight2) for _, a in lat.all_arcs()}
        assert ws[7][0] == pytest.approx(-0.75) and ws[7][1] == pytest.approx(-0.25)
        assert ws[8] == (0.0, 0.0)
        assert ws[9][0] == pytest.approx(-1.5)

    def test_missing_file_raises(self):
        from torchain_tpu.eval import read_lattice_ark

        with pytest.raises(FileNotFoundError):
            read_lattice_ark("/nonexistent/lat.ark.txt")


class TestLatticeBinaryInterchange:
    @pytest.mark.parametrize("compact", [True, False])
    def test_round_trip_preserves_components(self, tmp_path, compact):
        from torchain_tpu.eval import (
            read_lattice_ark_binary,
            write_lattice_ark_binary,
        )

        graph, y = _decode_fixture(seed=8, T=6)
        lats = {
            "utt0": lattice_decode(graph, y, beam=8.0),
            "utt1": lattice_decode(graph, y * 0.6, beam=8.0),
        }
        path = str(tmp_path / "lat.1.ark")
        write_lattice_ark_binary(path, lats, compact=compact)
        back = read_lattice_ark_binary(path)
        assert set(back) == {"utt0", "utt1"}
        for utt, lat in lats.items():
            got = back[utt]
            assert got.num_arcs == lat.num_arcs
            for (s0, a0), (s1, a1) in zip(lat.all_arcs(), got.all_arcs()):
                assert (s0, a0.label, a0.dst) == (s1, a1.label, a1.dst)
                assert a1.weight == pytest.approx(a0.weight, abs=1e-5)
                assert a1.weight2 == pytest.approx(a0.weight2, abs=1e-5)
            p0, s0 = lattice_best_path(rescore_lattice(lat, lm_scale=5.0))
            p1, s1 = lattice_best_path(rescore_lattice(got, lm_scale=5.0))
            assert p0 == p1 and s0 == pytest.approx(s1, abs=1e-4)

    def test_binary_equals_text_semantics(self, tmp_path):
        from torchain_tpu.eval import (
            read_lattice_ark,
            read_lattice_ark_binary,
            write_lattice_ark,
            write_lattice_ark_binary,
        )

        graph, y = _decode_fixture(seed=9, T=5)
        lats = {"u": lattice_decode(graph, y, beam=8.0)}
        bt = str(tmp_path / "lat.txt")
        bb = str(tmp_path / "lat.ark")
        write_lattice_ark(bt, lats)
        write_lattice_ark_binary(bb, lats)
        t = read_lattice_ark(bt)["u"]
        b = read_lattice_ark_binary(bb)["u"]
        assert t.num_arcs == b.num_arcs
        for (_, a0), (_, a1) in zip(t.all_arcs(), b.all_arcs()):
            assert a0.label == a1.label
            assert a1.weight == pytest.approx(a0.weight, abs=1e-5)

    def test_compact_arctype_in_header(self, tmp_path):
        from torchain_tpu.eval import write_lattice_ark_binary
        from torchain_tpu.fstkit.openfst_io import read_fst_stream

        graph, y = _decode_fixture(seed=10, T=4)
        path = str(tmp_path / "lat.ark")
        write_lattice_ark_binary(path, {"u": lattice_decode(graph, y, beam=8.0)})
        with open(path, "rb") as f:
            assert f.read(2) == b"u "
            assert f.read(2) == b"\x00B"
            raw = read_fst_stream(f)
        assert raw.arctype == "compactlattice44"
        assert raw.fsttype == "vector"

    def test_mbr_and_determinize_consume_binary_lattice(self, tmp_path):
        from torchain_tpu.eval import (
            read_lattice_ark_binary,
            write_lattice_ark_binary,
        )
        from torchain_tpu.eval.lattice import determinize_lattice, mbr_decode

        graph, y = _decode_fixture(seed=11, T=6)
        lat = lattice_decode(graph, y, beam=10.0)
        path = str(tmp_path / "lat.ark")
        write_lattice_ark_binary(path, {"u": lat})
        got = read_lattice_ark_binary(path)["u"]
        det0 = determinize_lattice(lat)
        det1 = determinize_lattice(got)
        assert det0.num_arcs == det1.num_arcs
        m0 = mbr_decode(lat)
        m1 = mbr_decode(got)
        assert m0.words == m1.words
