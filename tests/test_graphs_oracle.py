"""Graph compilers + NumPy oracle, validated against brute-force path
enumeration — the M0 milestone de-risking all the chain math
(SURVEY.md section 7 build order)."""

import math

import numpy as np
import pytest

from torchain_tpu.fstkit import Fst, compose, connect, enumerate_paths, total_weight
from torchain_tpu.graphs import (
    ChainTopology,
    ContextTree,
    PhoneLmOptions,
    Supervision,
    SupervisionOptions,
    alignment_to_supervision_fst,
    compile_den_graph,
    compile_supervision,
    estimate_phone_lm,
    make_den_fst,
    make_dense_den_graph,
    make_normalization_fst,
    split_alignment_into_chunks,
)
from torchain_tpu.graphs.phone_lm import lm_log_prob
from torchain_tpu.graphs.supervision import subsample_alignment
from torchain_tpu.ops import oracle


def tiny_setup(num_phones=2, context_width=1, seed=0):
    rng = np.random.default_rng(seed)
    sentences = [
        list(rng.integers(1, num_phones + 1, size=rng.integers(2, 6)))
        for _ in range(20)
    ]
    lm = estimate_phone_lm(
        [list(map(int, s)) for s in sentences],
        PhoneLmOptions(ngram_order=2, num_extra_lm_states=100),
    )
    tree = ContextTree(num_phones, context_width=context_width)
    den_fst = make_den_fst(lm, tree)
    graph = compile_den_graph(den_fst, tree.num_pdfs)
    return lm, tree, den_fst, graph


class TestPhoneLm:
    def test_arc_probs_sum_to_one(self):
        lm, *_ = tiny_setup()
        for s in range(lm.num_states):
            mass = [math.exp(a.weight) for a in lm.arcs(s)]
            if lm.is_final(s):
                mass.append(math.exp(lm.final(s)))
            assert sum(mass) == pytest.approx(1.0, abs=1e-9)

    def test_unpruned_lm_is_ml(self):
        # bigram LM, no pruning: p(sent) = prod count ratios
        sents = [[1, 2, 1], [1, 2, 2], [2, 1]]
        lm = estimate_phone_lm(
            sents, PhoneLmOptions(ngram_order=2, num_extra_lm_states=10**6)
        )
        # p(1|BOS)=2/3, p(2|1)=2/3? counts: histories (BOS): 1x2, 2x1
        # (1,): follows of 1: 2,2,EOS ... compute via lm_log_prob sanity:
        total = sum(math.exp(lm_log_prob(lm, s)) for s in sents)
        # ML bigram assigns the empirical distribution over these sentences
        # (they're the only ones with support): total prob of the training
        # set should be high and each sentence's prob = product of ratios
        p = math.exp(lm_log_prob(lm, [2, 1]))
        # p(2|BOS)=1/3, p(1|2)=2/3 (follows of 2: 1, 2, 1 -> {1:2, 2:1}),
        # p(EOS|1)=1/3 (follows of 1: 2, EOS, 2, EOS -> wait recount)
        # follows of history (1,): from sents: 1->2, 2->... enumerate:
        # [1,2,1]: (1)->2, (2)->1, (1)->EOS ; [1,2,2]: (1)->2, (2)->2,
        # (2)->EOS ; [2,1]: (2)->1, (1)->EOS
        # h=(1,): {2:2, EOS:2}; h=(2,): {1:2, 2:1, EOS:1}
        expected = (1 / 3) * (2 / 4) * (2 / 4)
        assert p == pytest.approx(expected, abs=1e-9)
        assert 0.0 < total <= 1.0 + 1e-9

    def test_pruning_budget(self):
        rng = np.random.default_rng(1)
        sents = [list(map(int, rng.integers(1, 6, size=10))) for _ in range(50)]
        small = estimate_phone_lm(
            sents, PhoneLmOptions(ngram_order=3, num_extra_lm_states=5)
        )
        big = estimate_phone_lm(
            sents, PhoneLmOptions(ngram_order=3, num_extra_lm_states=10**6)
        )
        assert small.num_states < big.num_states
        # still normalized after merging
        for s in range(small.num_states):
            mass = [math.exp(a.weight) for a in small.arcs(s)]
            if small.is_final(s):
                mass.append(math.exp(small.final(s)))
            assert sum(mass) == pytest.approx(1.0, abs=1e-9)


class TestDenGraph:
    def test_den_fst_structure(self):
        _, tree, den_fst, graph = tiny_setup()
        assert not den_fst.has_epsilons()
        # every state must have outgoing arcs (the HMM never gets stuck)
        for s in range(den_fst.num_states):
            assert len(den_fst.arcs(s)) > 0
        assert graph.num_arcs == den_fst.num_arcs
        assert graph.initial_probs.sum() == pytest.approx(1.0, abs=1e-5)

    def test_initial_probs_stationary(self):
        lm, tree, den_fst, _ = tiny_setup()
        graph = __import__("torchain_tpu.graphs", fromlist=["compile_den_graph"]).compile_den_graph(
            den_fst, tree.num_pdfs, start_boost=0.0
        )
        S = graph.num_states
        x = graph.initial_probs.astype(np.float64)
        y = np.zeros(S)
        dst = np.repeat(np.arange(S), np.diff(graph.in_offsets))
        np.add.at(y, dst, x[graph.in_src] * np.exp(graph.in_logw.astype(np.float64)))
        y /= y.sum()
        np.testing.assert_allclose(x, y, atol=2e-3)

    def test_csr_consistency(self):
        _, _, den_fst, graph = tiny_setup()
        # in- and out- views describe the same arc multiset
        S = graph.num_states
        in_dst = np.repeat(np.arange(S), np.diff(graph.in_offsets))
        out_src = np.repeat(np.arange(S), np.diff(graph.out_offsets))
        a = sorted(
            zip(graph.in_src.tolist(), in_dst.tolist(), graph.in_pdf.tolist(),
                np.round(graph.in_logw, 5).tolist())
        )
        b = sorted(
            zip(out_src.tolist(), graph.out_dst.tolist(), graph.out_pdf.tolist(),
                np.round(graph.out_logw, 5).tolist())
        )
        assert a == b

    def test_biphone_tree_contexts(self):
        _, tree, den_fst, graph = tiny_setup(num_phones=2, context_width=2)
        assert tree.num_pdfs == 2 + 2 * 3  # tied self-loops: P + P*(P+1)
        assert graph.num_pdfs == tree.num_pdfs


class TestOracleVsBruteForce:
    @pytest.mark.parametrize("leaky", [0.0, 0.1])
    def test_den_logz_matches_enumeration(self, leaky):
        _, _, _, graph = tiny_setup()
        rng = np.random.default_rng(2)
        T = 4
        y = rng.normal(size=(T, graph.num_pdfs)) * 0.5
        log_z, _ = oracle.den_forward_backward(graph, y, leaky=leaky)
        brute = oracle.brute_force_den_logz(graph, y, leaky=leaky)
        assert log_z == pytest.approx(brute, abs=1e-8)

    @pytest.mark.parametrize("leaky", [0.0, 0.1])
    def test_den_gamma_matches_finite_diff(self, leaky):
        _, _, _, graph = tiny_setup()
        rng = np.random.default_rng(3)
        T = 3
        y = rng.normal(size=(T, graph.num_pdfs)) * 0.5
        log_z, gamma = oracle.den_forward_backward(graph, y, leaky=leaky)
        eps = 1e-6
        for t in range(T):
            for j in range(0, graph.num_pdfs, 3):  # subsample for speed
                yp = y.copy()
                yp[t, j] += eps
                ym = y.copy()
                ym[t, j] -= eps
                zp, _ = oracle.den_forward_backward(graph, yp, leaky=leaky)
                zm, _ = oracle.den_forward_backward(graph, ym, leaky=leaky)
                fd = (zp - zm) / (2 * eps)
                assert gamma[t, j] == pytest.approx(fd, abs=1e-4)

    def test_den_gamma_rows_sum_to_one(self):
        _, _, _, graph = tiny_setup()
        rng = np.random.default_rng(4)
        y = rng.normal(size=(5, graph.num_pdfs))
        for leaky in (0.0, 0.1):
            _, gamma = oracle.den_forward_backward(graph, y, leaky=leaky)
            np.testing.assert_allclose(gamma.sum(axis=1), 1.0, atol=1e-8)


class TestSupervision:
    def setup_method(self):
        self.tree = ContextTree(3)
        self.opts = SupervisionOptions(left_tolerance=1, right_tolerance=1)

    def test_paths_respect_tolerance(self):
        ali = [(1, 2), (2, 3), (3, 2)]  # T=7
        fst = alignment_to_supervision_fst(ali, self.tree, self.opts)
        paths = [labels for labels, _ in enumerate_paths(fst)]
        assert len(paths) > 1
        for labels in paths:
            assert len(labels) == 7
            # decode pdf sequence back to phone segments
            phones = []
            for lab in labels:
                pdf = lab - 1
                phone, cls = pdf // 2 + 1, pdf % 2
                if cls == 0:
                    phones.append(phone)
                else:
                    assert phones and phones[-1] == phone
            assert phones == [1, 2, 3]
        # the exact alignment must be among the paths
        exact = []
        for p, d in ali:
            exact += [self.tree.pdf(p, 0) + 1] + [self.tree.pdf(p, 1) + 1] * (d - 1)
        assert tuple(exact) in paths
        # boundary shifted by more than tolerance must NOT be present
        shifted = [
            self.tree.pdf(1, 0) + 1,
            self.tree.pdf(1, 1) + 1,
            self.tree.pdf(1, 1) + 1,
            self.tree.pdf(1, 1) + 1,  # phone 2 starts at t=4 (start 2 + tol 1 < 4)
            self.tree.pdf(2, 0) + 1,
            self.tree.pdf(3, 0) + 1,
            self.tree.pdf(3, 1) + 1,
        ]
        assert tuple(shifted) not in paths

    def test_pack_and_score_matches_fst(self):
        ali = [(1, 2), (2, 2), (1, 2)]
        fst = alignment_to_supervision_fst(ali, self.tree, self.opts)
        sup = compile_supervision(fst, self.tree.num_pdfs)
        rng = np.random.default_rng(5)
        y = rng.normal(size=(sup.num_frames, sup.num_pdfs))
        logp, gamma = oracle.num_forward_backward(sup, y)
        # brute force over the fst: add emission scores per path
        brute = []
        for labels, w in enumerate_paths(fst):
            brute.append(w + sum(y[t, lab - 1] for t, lab in enumerate(labels)))
        m = max(brute)
        expected = m + math.log(sum(math.exp(b - m) for b in brute))
        assert logp == pytest.approx(expected, abs=1e-8)
        np.testing.assert_allclose(gamma.sum(axis=1), 1.0, atol=1e-8)

    def test_num_gamma_finite_diff(self):
        ali = [(2, 2), (3, 2)]
        fst = alignment_to_supervision_fst(ali, self.tree, self.opts)
        sup = compile_supervision(fst, self.tree.num_pdfs)
        rng = np.random.default_rng(6)
        y = rng.normal(size=(sup.num_frames, sup.num_pdfs))
        logp, gamma = oracle.num_forward_backward(sup, y)
        eps = 1e-6
        for t in range(sup.num_frames):
            for j in range(sup.num_pdfs):
                yp = y.copy()
                yp[t, j] += eps
                ym = y.copy()
                ym[t, j] -= eps
                fd = (
                    oracle.num_forward_backward(sup, yp)[0]
                    - oracle.num_forward_backward(sup, ym)[0]
                ) / (2 * eps)
                assert gamma[t, j] == pytest.approx(fd, abs=1e-4)

    def test_chunk_splitting(self):
        ali = [(1, 5), (2, 5), (3, 5)]
        chunks = split_alignment_into_chunks(ali, 6)
        # two full chunks + a 3-frame tail (>= min_tail = 3) kept separately
        assert [c[0] for c in chunks] == [0, 6, 12]
        assert [sum(d for _, d in c[1]) for c in chunks] == [6, 6, 3]
        # phone 2 spans the boundary so it is chunk 2's (clipped) first
        # phone; the left context is its true predecessor, phone 1
        assert chunks[1][2] == 1
        assert chunks[1][1][0] == (2, 4)  # frames 6..9 of phone 2
        # a tail shorter than min_tail is dropped
        chunks2 = split_alignment_into_chunks(ali, 7)
        assert [c[0] for c in chunks2] == [0, 7]  # 1-frame tail dropped

    def test_subsample_alignment(self):
        ali = [(1, 7), (2, 2), (3, 9)]  # 18 input frames -> 6 output
        out = subsample_alignment(ali, 3)
        assert sum(d for _, d in out) == 6
        assert [p for p, _ in out] == [1, 2, 3]  # no phone dropped
        assert all(d >= 1 for _, d in out)


class TestNormalizationInvariant:
    def test_free_supervision_equals_denominator(self):
        """Composing the 'accept anything of length T' acceptor with the
        normalization FST must reproduce the denominator log Z (leaky=0) —
        the exact num/den scale-matching property the normalization FST
        exists for (chain-supervision.cc AddWeightToSupervisionFst)."""
        _, tree, den_fst, graph = tiny_setup()
        norm = make_normalization_fst(den_fst, graph.initial_probs)
        T = 3
        free = Fst()
        free.add_states(T + 1)
        for t in range(T):
            for pdf in range(tree.num_pdfs):
                free.add_arc(t, pdf + 1, 0.0, t + 1)
        free.set_final(T, 0.0)
        composed = compose(free, norm)
        rng = np.random.default_rng(7)
        y = rng.normal(size=(T, tree.num_pdfs))
        # score composed FST with emissions
        scores = []
        for labels, w in enumerate_paths(composed):
            scores.append(w + sum(y[t, lab - 1] for t, lab in enumerate(labels)))
        m = max(scores)
        total = m + math.log(sum(math.exp(s - m) for s in scores))
        log_z, _ = oracle.den_forward_backward(graph, y, leaky=0.0)
        # float32 arc weights in the packed graph vs float64 in the FST
        assert total == pytest.approx(log_z, abs=1e-5)
