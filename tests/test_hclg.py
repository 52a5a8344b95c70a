"""Word-level decode stack: HCLG compiler + word Viterbi/lattices/WER.

Parity target: latgen-faster-mapped over HCLG with word-level scoring
(SURVEY.md section 3.4).  The graph is validated structurally (epsilon-free,
aligned olabels), behaviorally (decoding the generative pdf sequence
recovers the exact word transcript), and through the lattice invariants
(best path == Viterbi, N-best scores descend)."""

import numpy as np
import pytest

from torchain_tpu.data import synthetic_word_dataset, train_word_lm
from torchain_tpu.graphs import ContextTree, Lexicon, make_hclg
from torchain_tpu.eval import (
    make_word_decoding_graph,
    viterbi_decode,
    wer,
)
from torchain_tpu.eval.lattice import lattice_best_path, lattice_decode, lattice_nbest


def _tiny_word_lm(sentences):
    return train_word_lm(sentences, order=2, extra_states=50)


@pytest.fixture(scope="module")
def word_setup():
    rng = np.random.default_rng(0)
    num_phones = 5
    lexicon = Lexicon(
        prons={1: [(1, 2)], 2: [(3,)], 3: [(1, 3)], 4: [(4, 5, 2)]}
    )
    sentences = [
        [int(w) for w in rng.integers(1, 5, size=rng.integers(2, 6))]
        for _ in range(30)
    ]
    word_lm = _tiny_word_lm(sentences)
    tree = ContextTree(num_phones, context_width=2)
    return dict(
        lexicon=lexicon, word_lm=word_lm, tree=tree, sentences=sentences,
        num_phones=num_phones,
    )


def _loglikes_for_words(words, lexicon, tree, frames_per_phone=3):
    """Sharply peaked loglikes following the generative pdf sequence of the
    word string (entry pdf then self-loop pdfs, left-biphone context)."""
    pdfs = []
    prev = 0
    for w in words:
        for q in lexicon.prons[w][0]:
            pdfs.append(tree.pdf(q, 0, prev))
            pdfs.extend([tree.pdf(q, 1, prev)] * (frames_per_phone - 1))
            prev = q
    T = len(pdfs)
    ll = np.full((T, tree.num_pdfs), -8.0, dtype=np.float32)
    ll[np.arange(T), pdfs] = 0.0
    return ll


class TestHclgStructure:
    def test_epsilon_free_and_aligned(self, word_setup):
        fst, olabels = make_hclg(
            word_setup["word_lm"], word_setup["lexicon"], word_setup["tree"]
        )
        assert not fst.has_epsilons()
        assert len(olabels) == fst.num_arcs
        assert fst.num_states > 0
        # word labels appear only on phone-entry (pdf-class 0) arcs
        n_word_arcs = sum(1 for ol in olabels if ol > 0)
        assert n_word_arcs > 0
        # some state is final (utterances can end)
        assert any(fst.is_final(s) for s in range(fst.num_states))

    def test_graph_packs(self, word_setup):
        g = make_word_decoding_graph(
            word_setup["word_lm"], word_setup["lexicon"], word_setup["tree"]
        )
        assert g.num_pdfs == word_setup["tree"].num_pdfs
        assert (g.olabel >= 0).all()


class TestWordDecode:
    @pytest.mark.parametrize("words", [[1, 2, 3], [4, 1], [2, 2, 4, 3]])
    def test_recovers_exact_transcript(self, word_setup, words):
        g = make_word_decoding_graph(
            word_setup["word_lm"], word_setup["lexicon"], word_setup["tree"]
        )
        ll = _loglikes_for_words(words, word_setup["lexicon"], word_setup["tree"])
        hyp, score = viterbi_decode(g, ll, beam=20.0, backend="numpy")
        assert hyp == words
        assert np.isfinite(score)

    def test_homophone_resolved_by_grammar(self):
        # words 1 and 2 share a pronunciation; the grammar only ever saw
        # word 1, so decoding must pick it
        lexicon = Lexicon(prons={1: [(1, 2)], 2: [(1, 2)]})
        tree = ContextTree(3, context_width=1)
        word_lm = _tiny_word_lm([[1], [1], [1, 1]])
        g = make_word_decoding_graph(word_lm, lexicon, tree)
        ll = _loglikes_for_words([1], lexicon, tree)
        hyp, _ = viterbi_decode(g, ll, beam=20.0, backend="numpy")
        assert hyp == [1]

    def test_optional_silence(self, word_setup):
        lexicon = Lexicon(
            prons=dict(word_setup["lexicon"].prons), sil_phone=5, sil_prob=0.4
        )
        tree = word_setup["tree"]
        g = make_word_decoding_graph(word_setup["word_lm"], lexicon, tree)
        # transcript [1, 2] with silence between: pdf sequence manually
        pdfs = []
        prev = 0
        for q in lexicon.prons[1][0]:
            pdfs += [tree.pdf(q, 0, prev), tree.pdf(q, 1, prev), tree.pdf(q, 1, prev)]
            prev = q
        for q in (5,):  # silence phone
            pdfs += [tree.pdf(q, 0, prev), tree.pdf(q, 1, prev)]
            prev = q
        for q in lexicon.prons[2][0]:
            pdfs += [tree.pdf(q, 0, prev), tree.pdf(q, 1, prev)]
            prev = q
        T = len(pdfs)
        ll = np.full((T, tree.num_pdfs), -8.0, dtype=np.float32)
        ll[np.arange(T), pdfs] = 0.0
        hyp, _ = viterbi_decode(g, ll, beam=25.0, backend="numpy")
        assert hyp == [1, 2]  # silence absorbed, no word label


class TestWordLattices:
    def test_best_path_matches_viterbi(self, word_setup):
        g = make_word_decoding_graph(
            word_setup["word_lm"], word_setup["lexicon"], word_setup["tree"]
        )
        ll = _loglikes_for_words([1, 4, 2], word_setup["lexicon"], word_setup["tree"])
        hyp, score = viterbi_decode(g, ll, beam=20.0, backend="numpy")
        lat = lattice_decode(g, ll, beam=20.0)
        words, lat_score = lattice_best_path(lat)
        assert words == hyp
        assert lat_score == pytest.approx(score, abs=1e-3)

    def test_nbest_scores_descend_and_contain_best(self, word_setup):
        g = make_word_decoding_graph(
            word_setup["word_lm"], word_setup["lexicon"], word_setup["tree"]
        )
        ll = _loglikes_for_words([3, 2], word_setup["lexicon"], word_setup["tree"])
        hyp, score = viterbi_decode(g, ll, beam=20.0, backend="numpy")
        lat = lattice_decode(g, ll, beam=20.0)
        nbest = lattice_nbest(lat, 5)
        assert nbest[0][0] == hyp
        scores = [s for _, s in nbest]
        assert scores == sorted(scores, reverse=True)


class TestWordCorpusWer:
    def test_oracle_loglikes_give_zero_wer(self):
        """Generative pdf-peaked loglikes through the full word stack must
        score WER 0% — the end-to-end gate for the graph+decoder."""
        wc = synthetic_word_dataset(
            num_utts=10, vocab_size=8, num_phones=6, context_width=2, seed=3
        )
        word_lm = train_word_lm(wc.transcripts)
        g = make_word_decoding_graph(word_lm, wc.lexicon, wc.corpus.tree)
        hyps = []
        for tr in wc.transcripts:
            ll = _loglikes_for_words(tr, wc.lexicon, wc.corpus.tree)
            hyp, _ = viterbi_decode(g, ll, beam=20.0, backend="numpy")
            hyps.append(hyp)
        res = wer(wc.transcripts, hyps)
        assert res["wer"] == 0.0, res


@pytest.mark.slow
def test_word_recipe_wer_gate():
    """Train on the synthetic word corpus, decode through HCLG, and gate the
    word WER — the in-repo stand-in for 'WER within 0.2% of Kaldi' until a
    real corpus is mountable (no network here)."""
    import jax.numpy as jnp

    from torchain_tpu.data import ChainDataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.models import TDNNF, TdnnfConfig
    from torchain_tpu.ops import ChainLossOptions, auto_den_graph
    from torchain_tpu.train import Trainer, TrainerConfig
    from torchain_tpu.train.step import make_forward_fn

    wc = synthetic_word_dataset(
        num_utts=32, vocab_size=10, num_phones=5, feat_dim=16,
        words_per_utt=(3, 7), noise=0.3, seed=1,
    )
    corpus = wc.corpus
    cfg = TdnnfConfig(
        num_pdfs=corpus.tree.num_pdfs, hidden_dim=96, bottleneck_dim=24,
        prefinal_dim=48, num_layers=3,
    )
    model = TDNNF(cfg)
    left, right = cfg.context
    fsf = cfg.frame_subsampling_factor
    dataset = ChainDataset(
        corpus.utts, corpus.tree, corpus.norm_fst, chunk_frames_out=18,
        left_context=left, right_context=right,
        sup_opts=SupervisionOptions(left_tolerance=2, right_tolerance=2),
    )
    den = auto_den_graph(
        corpus.den_graph, phone_lm=corpus.phone_lm, tree=corpus.tree
    )
    tcfg = TrainerConfig(
        lr=2e-3, num_epochs=10, batch_size=8, semi_ortho_every=4, log_every=50,
        loss=ChainLossOptions(
            l2_regularize=1e-4, leaky_hmm_coefficient=0.1, xent_regularize=0.1
        ),
    )
    t_in = 18 * fsf + left + right
    trainer = Trainer(model, den, tcfg, np.zeros((2, t_in, 16), np.float32))
    results = trainer.fit(dataset, log_fn=lambda s: None)
    assert results.tot_failed == 0

    word_lm = train_word_lm(wc.transcripts)
    g = make_word_decoding_graph(word_lm, wc.lexicon, corpus.tree)
    forward = make_forward_fn(model)
    variables = {"params": trainer.state.params}
    if trainer.state.batch_stats:
        variables["batch_stats"] = trainer.state.batch_stats
    hyps = []
    for u in corpus.utts:
        T_in_utt = u.feats.shape[0]
        t_out = T_in_utt // fsf
        idx = np.clip(np.arange(-left, t_out * fsf + right), 0, T_in_utt - 1)
        y = np.asarray(forward(variables, jnp.asarray(u.feats[idx][None])))[0]
        hyp, _ = viterbi_decode(g, y, beam=16.0, backend="numpy")
        hyps.append(hyp)
    score = wer(wc.transcripts, hyps)
    # word task is harder than phones (lexicon constraints actually help);
    # untrained sits near ~100% WER
    assert score["wer"] < 25.0, score


def _full_triphone_tree(num_phones):
    """Untied triphone TiedTree: every (class, phone, left, right) cell gets
    its own pdf id — any context mistake in the HCLG expansion then shows up
    as a decode failure against generative loglikes."""
    from torchain_tpu.graphs.tied_tree import TiedTree

    sigma = num_phones + 1
    pdf_map = np.arange(2 * sigma * sigma * sigma, dtype=np.int32).reshape(
        2, sigma, sigma, sigma
    )
    return TiedTree(pdf_map, num_phones)


def _tri_loglikes_for_words(words, lexicon, tree, frames_per_phone=3, sil_between=None):
    """Generative pdf sequence with CROSS-WORD triphone contexts: left = the
    previous phone in the full stream, right = the next (BOUNDARY at the
    utterance end).  `sil_between` optionally inserts a silence phone between
    words (tests the silence pseudo-word's context threading)."""
    phones = []
    for i, w in enumerate(words):
        phones.extend(lexicon.prons[w][0])
        if sil_between is not None and i + 1 < len(words):
            phones.append(sil_between)
    pdfs = []
    for i, q in enumerate(phones):
        prev = phones[i - 1] if i > 0 else 0
        nxt = phones[i + 1] if i + 1 < len(phones) else 0
        pdfs.append(tree.pdf(q, 0, prev, nxt))
        pdfs.extend([tree.pdf(q, 1, prev, nxt)] * (frames_per_phone - 1))
    T = len(pdfs)
    ll = np.full((T, tree.num_pdfs), -8.0, dtype=np.float32)
    ll[np.arange(T), pdfs] = 0.0
    return ll


class TestTriphoneHclg:
    """Word HCLG over right-context (triphone) trees: cross-word delayed
    emission (VERDICT r1 known gap; Kaldi cross-word C composition role)."""

    @pytest.fixture(scope="class")
    def tri_setup(self, request):
        rng = np.random.default_rng(7)
        num_phones = 4
        lexicon = Lexicon(prons={1: [(1, 2)], 2: [(3,)], 3: [(2, 4, 1)]})
        sentences = [
            [int(w) for w in rng.integers(1, 4, size=rng.integers(2, 5))]
            for _ in range(40)
        ]
        word_lm = _tiny_word_lm(sentences)
        tree = _full_triphone_tree(num_phones)
        return dict(lexicon=lexicon, word_lm=word_lm, tree=tree)

    def test_structure(self, tri_setup):
        fst, olabels = make_hclg(
            tri_setup["word_lm"], tri_setup["lexicon"], tri_setup["tree"]
        )
        assert not fst.has_epsilons()
        assert len(olabels) == fst.num_arcs
        assert any(ol > 0 for ol in olabels)
        assert any(fst.is_final(s) for s in range(fst.num_states))
        for s, a in fst.all_arcs():
            assert 1 <= a.label <= tri_setup["tree"].num_pdfs

    @pytest.mark.parametrize("words", [[1, 2], [3, 1, 2], [2, 2, 3]])
    def test_recovers_exact_transcript_cross_word(self, tri_setup, words):
        """With the fully-enumerated triphone map, decoding only succeeds if
        every pdf in the graph carries the TRUE (left, phone, right) context
        — including across word boundaries."""
        g = make_word_decoding_graph(
            tri_setup["word_lm"], tri_setup["lexicon"], tri_setup["tree"]
        )
        ll = _tri_loglikes_for_words(words, tri_setup["lexicon"], tri_setup["tree"])
        hyp, score = viterbi_decode(g, ll, beam=25.0, backend="numpy")
        assert hyp == words
        assert np.isfinite(score)

    def test_wrong_cross_word_context_scores_worse(self, tri_setup):
        """Loglikes built with BOUNDARY right-context at word junctions (what
        a context-clipping compiler would emit) must score strictly worse
        than the true cross-word sequence — proving the graph really encodes
        cross-word lookahead."""
        lexicon, tree = tri_setup["lexicon"], tri_setup["tree"]
        words = [1, 2]
        g = make_word_decoding_graph(tri_setup["word_lm"], lexicon, tree)
        ll_true = _tri_loglikes_for_words(words, lexicon, tree)
        _, score_true = viterbi_decode(g, ll_true, beam=25.0, backend="numpy")

        phones = [q for w in words for q in lexicon.prons[w][0]]
        pdfs = []
        for i, q in enumerate(phones):
            prev = phones[i - 1] if i > 0 else 0
            # clip the right context at each word's last phone
            is_word_end = i == len(lexicon.prons[words[0]][0]) - 1 or i == len(phones) - 1
            nxt = 0 if is_word_end else phones[i + 1]
            pdfs += [tree.pdf(q, 0, prev, nxt)] + [tree.pdf(q, 1, prev, nxt)] * 2
        ll_clip = np.full((len(pdfs), tree.num_pdfs), -8.0, dtype=np.float32)
        ll_clip[np.arange(len(pdfs)), pdfs] = 0.0
        _, score_clip = viterbi_decode(g, ll_clip, beam=25.0, backend="numpy")
        assert score_true > score_clip + 1.0

    def test_optional_silence_threads_context(self, tri_setup):
        lexicon = Lexicon(
            prons=dict(tri_setup["lexicon"].prons), sil_phone=4, sil_prob=0.4
        )
        tree = tri_setup["tree"]
        g = make_word_decoding_graph(tri_setup["word_lm"], lexicon, tree)
        ll = _tri_loglikes_for_words([1, 2], lexicon, tree, sil_between=4)
        hyp, _ = viterbi_decode(g, ll, beam=30.0, backend="numpy")
        assert hyp == [1, 2]

    def test_lattice_best_path_matches_viterbi(self, tri_setup):
        g = make_word_decoding_graph(
            tri_setup["word_lm"], tri_setup["lexicon"], tri_setup["tree"]
        )
        ll = _tri_loglikes_for_words([3, 2], tri_setup["lexicon"], tri_setup["tree"])
        hyp, score = viterbi_decode(g, ll, beam=25.0, backend="numpy")
        lat = lattice_decode(g, ll, beam=25.0)
        words, lat_score = lattice_best_path(lat)
        assert words == hyp
        assert lat_score == pytest.approx(score, abs=1e-3)

    def test_data_driven_tied_triphone_tree(self):
        """Word HCLG over a DATA-DRIVEN tied triphone tree: stats → tied
        tree → graph; decode with tied-pdf generative loglikes recovers the
        transcript (pdf map consistency across lexicon expansion)."""
        from torchain_tpu.data.loader import Utterance
        from torchain_tpu.graphs import accumulate_tree_stats, build_tied_tree

        rng = np.random.default_rng(1)
        utts = []
        for _ in range(40):
            phones = list(rng.integers(1, 5, size=rng.integers(3, 7)))
            durs = [int(rng.integers(1, 4)) for _ in phones]
            feats = rng.normal(size=(sum(durs), 6)).astype(np.float32)
            utts.append(Utterance(feats=feats, alignment=list(zip(phones, durs))))
        stats = accumulate_tree_stats(utts, num_phones=4, context="triphone")
        tree = build_tied_tree(stats, num_pdfs=30)
        assert tree.right_dependent(0) or tree.right_dependent(1)

        lexicon = Lexicon(prons={1: [(1, 2)], 2: [(3,)], 3: [(2, 4)]})
        word_lm = _tiny_word_lm([[1, 2], [3, 1], [2, 3, 1], [1, 2, 3]])
        g = make_word_decoding_graph(word_lm, lexicon, tree)
        for words in ([1, 2], [3, 1]):
            ll = _tri_loglikes_for_words(words, lexicon, tree)
            hyp, _ = viterbi_decode(g, ll, beam=25.0, backend="numpy")
            assert hyp == words


def test_hclg_with_tied_left_tree():
    """Word HCLG over a data-driven tied LEFT-context tree (the tied pdf
    map must flow through lexicon expansion consistently with training
    supervision)."""
    import numpy as np

    from torchain_tpu.graphs import (
        accumulate_tree_stats,
        build_tied_tree,
    )
    from torchain_tpu.data.loader import Utterance
    from torchain_tpu.fstkit import enumerate_paths
    from torchain_tpu.graphs.hclg import Lexicon, make_hclg

    rng = np.random.default_rng(0)
    utts = []
    for _ in range(30):
        phones = list(rng.integers(1, 5, size=rng.integers(3, 7)))
        durs = [int(rng.integers(1, 4)) for _ in phones]
        feats = rng.normal(size=(sum(durs), 6)).astype(np.float32)
        utts.append(Utterance(feats=feats, alignment=list(zip(phones, durs))))
    stats = accumulate_tree_stats(utts, num_phones=4)
    tree = build_tied_tree(stats, num_pdfs=14)

    from torchain_tpu.fstkit import Fst

    g = Fst()
    s0, s1 = g.add_state(), g.add_state()
    g.add_arc(s0, 1, 0.0, s1)
    g.add_arc(s1, 2, 0.0, s1)
    g.set_final(s1, 0.0)
    lex = Lexicon(prons={1: [(1, 2)], 2: [(3,)]})
    fst, olabels = make_hclg(g, lex, tree)
    assert not fst.has_epsilons()
    assert len(olabels) == fst.num_arcs
    # every emitted pdf must be a valid tied pdf id
    for s, a in fst.all_arcs():
        assert 0 <= a.label - 1 < tree.num_pdfs
    # at least one full path accepted (word 1 then word 2)
    assert any(True for _ in enumerate_paths(fst))
