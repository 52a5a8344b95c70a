"""Decoder + WER tests: oracle-posterior decoding must recover transcripts
exactly; the trained-model path is exercised by test_e2e_recipe."""

import numpy as np
import pytest

from torchain_tpu.data import synthetic_dataset
from torchain_tpu.eval import make_decoding_graph, viterbi_decode, wer
from torchain_tpu.eval.wer import edit_distance
from torchain_tpu.graphs import ContextTree, PhoneLmOptions, estimate_phone_lm


class TestWer:
    def test_edit_distance_cases(self):
        assert edit_distance([1, 2, 3], [1, 2, 3]) == (0, 0, 0, 0)
        assert edit_distance([1, 2, 3], [1, 9, 3]) == (1, 0, 0, 1)
        assert edit_distance([1, 2, 3], [1, 3]) == (0, 1, 0, 1)
        assert edit_distance([1, 3], [1, 2, 3]) == (0, 0, 1, 1)
        assert edit_distance([], [1, 2]) == (0, 0, 2, 2)

    def test_corpus_wer(self):
        out = wer([[1, 2, 3], [4, 5]], [[1, 2], [4, 5]])
        assert out["wer"] == pytest.approx(100.0 * 1 / 5)
        assert out["dele"] == 1


class TestViterbi:
    def test_oracle_posteriors_recover_transcript(self):
        """Feed posteriors that are exactly right (huge margin on the true
        pdf at each frame): the decoder must read back the exact phone
        sequence for every utterance."""
        rng = np.random.default_rng(0)
        num_phones = 6
        sents = [
            list(map(int, rng.integers(1, num_phones + 1, size=rng.integers(3, 7))))
            for _ in range(20)
        ]
        lm = estimate_phone_lm(
            sents, PhoneLmOptions(ngram_order=2, num_extra_lm_states=100)
        )
        tree = ContextTree(num_phones)
        graph = make_decoding_graph(lm, tree)

        for sent in sents[:8]:
            durs = rng.integers(1, 4, size=len(sent))
            # true pdf sequence under the chain topology
            pdfs = []
            for p, d in zip(sent, durs):
                pdfs += [tree.pdf(int(p), 0)] + [tree.pdf(int(p), 1)] * (int(d) - 1)
            T = len(pdfs)
            y = np.full((T, tree.num_pdfs), -10.0, dtype=np.float32)
            y[np.arange(T), pdfs] = 10.0
            hyp, score = viterbi_decode(graph, y)
            assert hyp == [int(p) for p in sent], (sent, hyp)
            assert np.isfinite(score)

    def test_native_matches_numpy(self):
        """The C++ decoder core must agree with the numpy reference on
        scores and (given identical tie-free inputs) on the phone path."""
        from torchain_tpu.eval.native import get_lib

        if get_lib() is None:
            pytest.skip("no native toolchain")
        rng = np.random.default_rng(42)
        num_phones = 5
        sents = [
            list(map(int, rng.integers(1, num_phones + 1, size=rng.integers(3, 7))))
            for _ in range(15)
        ]
        lm = estimate_phone_lm(sents, PhoneLmOptions(ngram_order=2))
        tree = ContextTree(num_phones)
        graph = make_decoding_graph(lm, tree)
        for _ in range(10):
            T = int(rng.integers(5, 25))
            y = (rng.normal(size=(T, tree.num_pdfs)) * 2).astype(np.float32)
            hyp_np, score_np = viterbi_decode(graph, y, backend="numpy")
            hyp_cc, score_cc = viterbi_decode(graph, y, backend="native")
            assert score_cc == pytest.approx(score_np, abs=1e-3)
            assert hyp_cc == hyp_np

    def test_lattice_agrees_with_viterbi(self):
        from torchain_tpu.eval import lattice_best_path, lattice_decode
        from torchain_tpu.fstkit import total_weight

        rng = np.random.default_rng(7)
        num_phones = 4
        sents = [
            list(map(int, rng.integers(1, num_phones + 1, size=rng.integers(3, 6))))
            for _ in range(12)
        ]
        lm = estimate_phone_lm(sents, PhoneLmOptions(ngram_order=2))
        tree = ContextTree(num_phones)
        graph = make_decoding_graph(lm, tree)
        for _ in range(5):
            T = int(rng.integers(6, 15))
            y = (rng.normal(size=(T, tree.num_pdfs)) * 2).astype(np.float32)
            hyp, score = viterbi_decode(graph, y, beam=1e9, backend="numpy")
            lat = lattice_decode(graph, y, beam=1e9)
            # tropical total == Viterbi best score
            assert total_weight(lat, semiring="tropical") == pytest.approx(
                score, abs=1e-3
            )
            lhyp, lscore = lattice_best_path(lat)
            assert lscore == pytest.approx(score, abs=1e-3)
            assert lhyp == hyp
            # tighter beams prune mass monotonically (log semiring)
            wide = total_weight(lattice_decode(graph, y, beam=1e9))
            narrow = total_weight(lattice_decode(graph, y, beam=2.0))
            assert narrow <= wide + 1e-6

    def test_nbest_matches_enumeration(self):
        from torchain_tpu.eval import lattice_decode, lattice_nbest
        from torchain_tpu.fstkit import enumerate_paths

        rng = np.random.default_rng(9)
        sents = [[1, 2], [2, 1], [1, 1], [2, 2]]
        lm = estimate_phone_lm(sents, PhoneLmOptions(ngram_order=2))
        tree = ContextTree(2)
        graph = make_decoding_graph(lm, tree)
        y = (rng.normal(size=(8, tree.num_pdfs)) * 1.5).astype(np.float32)
        lat = lattice_decode(graph, y, beam=1e9)
        nbest = lattice_nbest(lat, 5)
        # oracle: enumerate all paths, dedup phone sequences by max score
        acc = {}
        for labels, w in enumerate_paths(lat):
            seq = tuple(l for l in labels if l > 0)
            acc[seq] = max(acc.get(seq, -1e30), w)
        oracle = sorted(acc.items(), key=lambda kv: -kv[1])[:5]
        assert [tuple(p) for p, _ in nbest] == [list(p) and p for p, _ in oracle]
        for (p1, s1), (p2, s2) in zip(nbest, oracle):
            assert s1 == pytest.approx(s2, abs=1e-4)
        # scores strictly non-increasing
        scores = [s for _, s in nbest]
        assert scores == sorted(scores, reverse=True)

    def test_garbage_posteriors_still_decode(self):
        rng = np.random.default_rng(1)
        sents = [[1, 2], [2, 1], [1, 1, 2]]
        lm = estimate_phone_lm(sents, PhoneLmOptions(ngram_order=2))
        tree = ContextTree(2)
        graph = make_decoding_graph(lm, tree)
        y = rng.normal(size=(12, tree.num_pdfs)).astype(np.float32)
        hyp, score = viterbi_decode(graph, y)
        assert isinstance(hyp, list)
        assert np.isfinite(score)
        assert all(1 <= p <= 2 for p in hyp)


def test_active_token_decoder_matches_reference():
    """csrc tt_viterbi_decode_active (faster-decoder role) vs the numpy
    reference and the full-arc native core."""
    import numpy as np
    import pytest

    from torchain_tpu.eval.native import native_viterbi_active
    from torchain_tpu.graphs import ContextTree, PhoneLmOptions, estimate_phone_lm
    from torchain_tpu.eval import make_decoding_graph, viterbi_decode

    rng = np.random.default_rng(11)
    sents = [list(map(int, rng.integers(1, 7, size=rng.integers(3, 9)))) for _ in range(60)]
    lm = estimate_phone_lm(sents, PhoneLmOptions(ngram_order=3, num_extra_lm_states=80))
    tree = ContextTree(6, context_width=2)
    graph = make_decoding_graph(lm, tree)
    for seed in range(3):
        y = (np.random.default_rng(seed).normal(size=(15, tree.num_pdfs)) * 1.3).astype(np.float32)
        ref = viterbi_decode(graph, y, backend="numpy")
        act = native_viterbi_active(graph, y, beam=16.0, max_active=0, use_final=True)
        if act is None:  # no toolchain in this environment
            pytest.skip("native library unavailable")
        assert act[0] == ref[0]
        assert act[1] == pytest.approx(ref[1], abs=1e-3)
        # tight max_active still finds the same best path on these graphs
        act2 = native_viterbi_active(graph, y, beam=16.0, max_active=50, use_final=True)
        assert act2[0] == ref[0]
