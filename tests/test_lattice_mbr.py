"""Lattice posteriors, LM rescoring, and MBR/sausage decoding, verified
against brute-force path enumeration.

Reference roles: [K latbin/lattice-to-post.cc] (arc posteriors),
[K latbin/lattice-lmrescore.cc] (grammar composition rescoring),
[K latbin/lattice-mbr-decode.cc] / [K lat/sausages.cc] (minimum Bayes
risk decoding with confusion-network output, Xu et al. 2011)."""

import numpy as np
import pytest

from torchain_tpu.eval import (
    determinize_lattice,
    lattice_arc_posteriors,
    lattice_best_path,
    lattice_decode,
    lmrescore_lattice,
    make_decoding_graph,
    mbr_decode,
)
from torchain_tpu.eval.wer import edit_distance
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


def _path_posteriors(lat):
    """Brute-force (label_seq, posterior) over all accepting paths."""
    paths = list(enumerate_paths(lat))
    ws = np.array([w for _, w in paths], dtype=np.float64)
    total = np.logaddexp.reduce(ws)
    return [
        (tuple(l for l in labels if l > 0), float(np.exp(w - total)))
        for (labels, w), _ in zip(paths, ws)
    ], float(total)


def _expected_edit(hyp, path_posts):
    risk = 0.0
    for seq, p in path_posts:
        *_, d = edit_distance(list(seq), list(hyp))
        risk += p * d
    return risk


def _sausage_lattice(seqs_with_logits):
    """Acceptor with one branch per (label seq, logit); posteriors are
    softmax of the logits."""
    fst = Fst()
    fst.add_state()  # state 0 = start
    end = fst.add_state()
    fst.set_final(end, 0.0)
    for seq, logit in seqs_with_logits:
        s = 0
        for i, lab in enumerate(seq):
            nxt = end if i == len(seq) - 1 else fst.add_state()
            fst.add_arc(s, lab, logit if i == 0 else 0.0, nxt)
            s = nxt
        if not seq:
            # empty sequence: epsilon arc to final
            fst.add_arc(0, 0, logit, end)
    return fst


class TestArcPosteriors:
    def test_cut_sums_to_one_on_time_unrolled_lattice(self):
        graph, y = _decode_fixture(seed=3)
        lat = lattice_decode(graph, y, beam=8.0)
        posts, total = lattice_arc_posteriors(lat)
        assert np.isfinite(total)
        # lattice_decode is time-unrolled: arcs out of frame-t states form
        # a cut; the start state's out-arcs are the t=0 cut
        start_mass = sum(p for s, _, p in posts if s == 0)
        assert start_mass == pytest.approx(1.0, abs=1e-6)

    def test_matches_brute_force_on_small_lattice(self):
        lat = _sausage_lattice(
            [([1, 2], np.log(0.5)), ([1, 3], np.log(0.3)), ([4], np.log(0.2))]
        )
        posts, total = lattice_arc_posteriors(lat)
        assert total == pytest.approx(0.0, abs=1e-9)  # probs sum to 1
        by_label = {}
        for _, a, p in posts:
            by_label[a.label] = by_label.get(a.label, 0.0) + p
        assert by_label[1] == pytest.approx(0.8, abs=1e-9)
        assert by_label[2] == pytest.approx(0.5, abs=1e-9)
        assert by_label[3] == pytest.approx(0.3, abs=1e-9)
        assert by_label[4] == pytest.approx(0.2, abs=1e-9)


class TestLmRescore:
    def _grammar(self):
        # unigram-ish acceptor over labels 1..4 with distinct weights
        g = Fst()
        g.add_state()
        w = {1: -0.1, 2: -0.7, 3: -1.3, 4: -0.4}
        for lab, wt in w.items():
            g.add_arc(0, lab, wt, 0)
        g.set_final(0, -0.05)
        return g, w

    def test_adds_grammar_scores_per_path(self):
        graph, y = _decode_fixture(seed=5)
        lat = determinize_lattice(lattice_decode(graph, y, beam=8.0))
        g, w = self._grammar()
        res = lmrescore_lattice(lat, g, lm_scale=1.0)
        before = {
            tuple(l for l in labels if l > 0): wt
            for labels, wt in enumerate_paths(lat)
        }
        after = {
            tuple(l for l in labels if l > 0): wt
            for labels, wt in enumerate_paths(res)
        }
        assert set(after) == set(before)  # unigram G accepts everything
        for seq, wt in after.items():
            expect = before[seq] + sum(w[l] for l in seq) + (-0.05)
            assert wt == pytest.approx(expect, abs=1e-5)

    def test_subtract_then_add_is_identity(self):
        graph, y = _decode_fixture(seed=6)
        lat = determinize_lattice(lattice_decode(graph, y, beam=8.0))
        g, _ = self._grammar()
        round_trip = lmrescore_lattice(
            lmrescore_lattice(lat, g, lm_scale=-1.0), g, lm_scale=1.0
        )
        before = dict(
            (tuple(l for l in labels if l > 0), wt)
            for labels, wt in enumerate_paths(lat)
        )
        after = dict(
            (tuple(l for l in labels if l > 0), wt)
            for labels, wt in enumerate_paths(round_trip)
        )
        assert set(after) == set(before)
        for seq in before:
            assert after[seq] == pytest.approx(before[seq], abs=1e-5)

    def test_acoustic_component_untouched(self):
        graph, y = _decode_fixture(seed=7)
        lat = lattice_decode(graph, y, beam=6.0)
        g, _ = self._grammar()
        res = lmrescore_lattice(lat, g, lm_scale=1.0)
        am_before = sorted(
            round(a.weight2, 5) for _, a in lat.all_arcs() if a.label > 0
        )
        am_after = sorted(
            round(a.weight2, 5) for _, a in res.all_arcs() if a.label > 0
        )
        # every surviving labeled arc keeps its acoustic score (compose can
        # duplicate arcs across grammar states but never alters weight2)
        assert set(am_after) <= set(am_before)

    def test_drops_paths_grammar_rejects(self):
        lat = _sausage_lattice([([1, 2], 0.0), ([3], 0.0)])
        g = Fst()
        g.add_state()
        g.add_arc(0, 1, 0.0, 0)
        g.add_arc(0, 2, 0.0, 0)
        g.set_final(0, 0.0)  # accepts {1,2}* only
        res = lmrescore_lattice(lat, g)
        seqs = {
            tuple(l for l in labels if l > 0) for labels, _ in enumerate_paths(res)
        }
        assert seqs == {(1, 2)}


class TestMbrDecode:
    def test_risk_matches_brute_force(self):
        graph, y = _decode_fixture(seed=11, T=7)
        lat = determinize_lattice(lattice_decode(graph, y, beam=7.0))
        res = mbr_decode(lat)
        path_posts, _ = _path_posteriors(lat)
        # on reconvergent lattices the recursion's expected edit distance is
        # the documented slight approximation (per-path alignment choices are
        # averaged at merge states, Xu et al. 2011 / [K lat/sausages.cc]);
        # exactness on tree lattices is covered below
        assert res.risk == pytest.approx(
            _expected_edit(res.words, path_posts), rel=1e-3
        )
        assert res.map_risk == pytest.approx(
            _expected_edit(lattice_best_path(lat)[0], path_posts), rel=1e-3
        )

    def test_risk_exact_on_tree_lattice(self):
        lat = _sausage_lattice(
            [
                ([1, 2, 3], np.log(0.4)),
                ([1, 3], np.log(0.25)),
                ([2, 2, 3], np.log(0.2)),
                ([4], np.log(0.15)),
            ]
        )
        res = mbr_decode(lat)
        path_posts, _ = _path_posteriors(lat)
        assert res.risk == pytest.approx(
            _expected_edit(res.words, path_posts), abs=1e-9
        )
        assert res.map_risk == pytest.approx(
            _expected_edit(lattice_best_path(lat)[0], path_posts), abs=1e-9
        )

    def test_mbr_beats_map_when_map_is_risky(self):
        # classic case: MAP picks the isolated path, MBR the shared prefix
        # paths: "1 2" (0.3), "1 3" (0.3), "4" (0.4)
        lat = _sausage_lattice(
            [([1, 2], np.log(0.3)), ([1, 3], np.log(0.3)), ([4], np.log(0.4))]
        )
        assert lattice_best_path(lat)[0] == [4]
        res = mbr_decode(lat)
        # risk("1") = 0.3*1 + 0.3*1 + 0.4*1 = 1.0 < risk("4") = 1.2
        assert res.words == [1]
        assert res.risk == pytest.approx(1.0, abs=1e-9)
        assert res.map_risk == pytest.approx(1.2, abs=1e-9)

    def test_risk_never_exceeds_map(self):
        for seed in range(8):
            graph, y = _decode_fixture(seed=100 + seed, T=6)
            lat = determinize_lattice(lattice_decode(graph, y, beam=6.0))
            res = mbr_decode(lat)
            assert res.risk <= res.map_risk + 1e-9

    def test_bins_are_distributions(self):
        graph, y = _decode_fixture(seed=13, T=7)
        lat = determinize_lattice(lattice_decode(graph, y, beam=7.0))
        res = mbr_decode(lat)
        for g in res.bins:
            assert sum(g.values()) == pytest.approx(1.0, abs=1e-6)
            assert all(v >= -1e-12 for v in g.values())

    def test_confidences_align_with_words(self):
        graph, y = _decode_fixture(seed=17, T=7)
        lat = determinize_lattice(lattice_decode(graph, y, beam=7.0))
        res = mbr_decode(lat)
        assert len(res.confidences) == len(res.words)
        assert all(0.0 <= c <= 1.0 + 1e-9 for c in res.confidences)
        # confidences are the bin posteriors of the slots' words
        assert len(res.slots) == len(res.bins)
        assert [w for w in res.slots if w != 0] == res.words
        expect = [
            res.bins[q][res.slots[q]]
            for q in range(len(res.slots))
            if res.slots[q] != 0
        ]
        for c, e in zip(res.confidences, expect):
            assert c == pytest.approx(e, abs=1e-12)

    def test_single_path_lattice_is_fixed_point(self):
        lat = _sausage_lattice([([2, 3, 2], 0.0)])
        res = mbr_decode(lat)
        assert res.words == [2, 3, 2]
        assert res.risk == pytest.approx(0.0, abs=1e-9)

    def test_empty_hypothesis_wins_when_paths_disagree(self):
        # four disjoint single-word paths, equal mass: any word has risk
        # 0.25*0 + 0.75*1 = ... wait, subbing w for another word costs 1,
        # so risk(word w) = 0.75*1 = 0.75; risk(empty) = 1.0*1 = 1.0 —
        # a word still wins.  With SIX words risk(w)=5/6 vs empty=1.0,
        # word still wins; check MBR picks SOME single word with correct
        # risk instead of hallucinating longer output
        lat = _sausage_lattice(
            [([w], np.log(0.25)) for w in (1, 2, 3, 4)]
        )
        res = mbr_decode(lat)
        assert len(res.words) == 1
        assert res.risk == pytest.approx(0.75, abs=1e-9)


class TestLatticeOracle:
    def test_matches_brute_force_minimum(self):
        from torchain_tpu.eval import lattice_oracle

        for seed in range(5):
            graph, y = _decode_fixture(seed=40 + seed, T=7)
            lat = determinize_lattice(lattice_decode(graph, y, beam=6.0))
            path_posts, _ = _path_posteriors(lat)
            rng = np.random.default_rng(seed)
            ref = list(map(int, rng.integers(1, 5, size=4)))
            hyp, dist = lattice_oracle(lat, ref)
            bf = min(edit_distance(list(ref), list(s))[-1] for s, _ in path_posts)
            assert dist == bf
            # the oracle hypothesis achieves its reported distance and is
            # a label sequence of the lattice
            assert edit_distance(ref, hyp)[-1] == dist
            assert tuple(hyp) in {s for s, _ in path_posts}

    def test_perfect_when_ref_in_lattice(self):
        from torchain_tpu.eval import lattice_oracle

        lat = _sausage_lattice([([1, 2, 3], 0.0), ([2, 2], -1.0)])
        hyp, dist = lattice_oracle(lat, [2, 2])
        assert dist == 0 and hyp == [2, 2]
        hyp, dist = lattice_oracle(lat, [1, 3])
        assert dist == 1 and hyp == [1, 2, 3]

    def test_empty_ref(self):
        from torchain_tpu.eval import lattice_oracle

        lat = _sausage_lattice([([1, 2], 0.0), ([3], -0.5)])
        hyp, dist = lattice_oracle(lat, [])
        assert dist == 1 and hyp == [3]  # all-insertions: shortest path
