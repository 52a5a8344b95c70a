"""Tied context-dependency trees: data-driven clustering, Kaldi tree
format round trip, and integration with den graph / supervision / decoder
(reference behavior: kaldi/src/tree/ ContextDependency + build-tree)."""

import numpy as np
import pytest

from torchain_tpu.data.loader import Utterance
from torchain_tpu.graphs import (
    ContextTree,
    PhoneLmOptions,
    TiedTree,
    accumulate_tree_stats,
    build_tied_tree,
    compile_den_graph,
    estimate_phone_lm,
    make_den_fst,
    read_kaldi_tree,
    write_kaldi_tree,
)
from torchain_tpu.graphs.topology import BOUNDARY


def _toy_utts(num_phones=4, n=40, feat_dim=6, seed=0, confusable=None):
    """Utterances whose frame features identify (phone, left) pairs —
    except pairs listed in `confusable`, which share a distribution."""
    rng = np.random.default_rng(seed)
    means = {}

    def mean_of(q, left):
        key = (q, left)
        if confusable and key in confusable:
            key = confusable[key]
        if key not in means:
            means[key] = rng.normal(size=feat_dim) * 3.0
        return means[key]

    utts = []
    for _ in range(n):
        phones = list(rng.integers(1, num_phones + 1, size=rng.integers(3, 7)))
        durs = [int(rng.integers(1, 4)) for _ in phones]
        feats = []
        for i, (q, d) in enumerate(zip(phones, durs)):
            left = phones[i - 1] if i > 0 else BOUNDARY
            m = mean_of(q, left)
            for _ in range(d):
                feats.append(m + rng.normal(size=feat_dim) * 0.1)
        utts.append(
            Utterance(
                feats=np.asarray(feats, dtype=np.float32),
                alignment=list(zip(phones, durs)),
            )
        )
    return utts


def test_stats_counts_match_frames():
    utts = _toy_utts()
    stats = accumulate_tree_stats(utts, num_phones=4)
    total = sum(sum(d for _, d in u.alignment) for u in utts)
    assert stats.count.sum() == pytest.approx(total)
    # pdf-class 0 count = number of phone tokens
    tokens = sum(len(u.alignment) for u in utts)
    assert stats.count[0].sum() == pytest.approx(tokens)


def test_full_budget_keeps_all_seen_contexts():
    utts = _toy_utts()
    stats = accumulate_tree_stats(utts, num_phones=4)
    seen = int((stats.count > 0).sum())
    tree = build_tied_tree(stats, num_pdfs=seen)
    assert tree.num_pdfs == seen
    # distinct pdfs for distinct seen cells
    pdfs = set()
    for c in range(2):
        for q in range(1, 5):
            for l in range(5):
                if stats.count[c, q, l, 0] > 0:
                    pdfs.add(tree.pdf(q, c, l))
    assert len(pdfs) == seen


def test_clustering_merges_confusable_contexts_first():
    # left contexts 1 and 2 of phone 3 share a distribution; with a budget
    # one short of full, exactly that pair must merge
    confusable = {(3, 2): (3, 1)}
    utts = _toy_utts(n=80, confusable=confusable, seed=1)
    stats = accumulate_tree_stats(utts, num_phones=4)
    seen = int((stats.count > 0).sum())
    tree = build_tied_tree(stats, num_pdfs=seen - 1)
    assert tree.pdf(3, 0, 1) == tree.pdf(3, 0, 2)
    # and a non-confusable pair stayed apart
    assert tree.pdf(3, 0, 0) != tree.pdf(3, 0, 1) or stats.count[0, 3, 0, 0] == 0


def test_budget_floor_is_group_count():
    utts = _toy_utts()
    stats = accumulate_tree_stats(utts, num_phones=4)
    tree = build_tied_tree(stats, num_pdfs=8)  # 2 classes x 4 phones
    assert tree.num_pdfs == 8
    with pytest.raises(ValueError):
        build_tied_tree(stats, num_pdfs=7)


def test_unseen_context_uses_backoff_leaf():
    utts = _toy_utts()
    stats = accumulate_tree_stats(utts, num_phones=4)
    tree = build_tied_tree(stats, num_pdfs=12)
    # every (phone, class, left) resolves to a valid pdf, seen or not
    for q in range(1, 5):
        for c in range(2):
            for l in range(5):
                assert 0 <= tree.pdf(q, c, l) < tree.num_pdfs


def test_kaldi_text_round_trip():
    utts = _toy_utts()
    stats = accumulate_tree_stats(utts, num_phones=4)
    tree = build_tied_tree(stats, num_pdfs=14)
    text = write_kaldi_tree(tree)
    back = read_kaldi_tree(text, num_phones=4)
    np.testing.assert_array_equal(back.pdf_map, tree.pdf_map)
    assert back.num_pdfs == tree.num_pdfs


def test_parse_handwritten_kaldi_tree():
    # N=2 P=1 (left-biphone, chain convention): phone 1 splits on left in
    # pdf-class 0 (left in {1} vs rest), phone 2 constant
    text = (
        "ContextDependency 2 1 ToPdf TE -1 2 ( "
        "TE 1 3 ( NULL SE 0 [ 1 ] { CE 0 CE 1 } CE 2 ) "
        "TE 1 3 ( NULL CE 3 CE 4 ) "
        ") EndContextDependency"
    )
    tree = read_kaldi_tree(text, num_phones=2)
    assert tree.pdf(1, 0, left=1) == 0
    assert tree.pdf(1, 0, left=0) == 1
    assert tree.pdf(1, 0, left=2) == 1
    assert tree.pdf(2, 0, left=1) == 2
    assert tree.pdf(1, 1, left=0) == 3
    assert tree.pdf(2, 1, left=2) == 4
    assert tree.num_pdfs == 5


def test_parse_triphone_tree_carries_right_context():
    text = (
        "ContextDependency 3 1 ToPdf TE -1 1 ( "
        "TE 1 2 ( NULL SE 2 [ 1 ] { CE 0 CE 1 } ) "
        ") EndContextDependency"
    )
    tree = read_kaldi_tree(text, num_phones=1)
    assert tree.right_size == 2
    assert tree.pdf(1, 0, left=0, right=1) == 0
    assert tree.pdf(1, 0, left=0, right=0) == 1
    assert tree.right_dependent(0)


def test_tied_tree_drives_den_graph_supervision_decoder():
    import jax.numpy as jnp

    from torchain_tpu.eval import make_decoding_graph, viterbi_decode
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.graphs.supervision import (
        alignment_to_supervision_fst,
        compile_supervision,
        pad_and_stack_supervisions,
    )
    from torchain_tpu.ops import DeviceSupervision, chain_loss
    from torchain_tpu.ops.den_resident import DeviceResidentDenGraph

    utts = _toy_utts(n=60, seed=3)
    stats = accumulate_tree_stats(utts, num_phones=4)
    tree = build_tied_tree(stats, num_pdfs=16)
    sents = [[p for p, _ in u.alignment] for u in utts]
    lm = estimate_phone_lm(sents, PhoneLmOptions(ngram_order=2, num_extra_lm_states=30))
    graph = compile_den_graph(make_den_fst(lm, tree), tree.num_pdfs)
    # tied trees can give a boundary state several distinct in-pdfs (tied
    # self-loop pdfs differ per left context), so K here exceeds the chain
    # K=2; the slot layout generalizes
    den = DeviceResidentDenGraph.from_host(graph, pad_to=8, max_slots=8)

    T = 8
    rng = np.random.default_rng(4)
    sups = []
    for u in utts[:3]:
        ali = []
        left = T
        for q, d in u.alignment:
            d = min(d, left)
            if d <= 0:
                break
            ali.append((q, d))
            left -= d
        if left > 0:
            ali[-1] = (ali[-1][0], ali[-1][1] + left)
        fst = alignment_to_supervision_fst(
            ali, tree, SupervisionOptions(left_tolerance=1, right_tolerance=1)
        )
        sups.append(compile_supervision(fst, tree.num_pdfs))
    sup = DeviceSupervision.from_host(pad_and_stack_supervisions(sups))
    y = jnp.asarray(rng.normal(size=(3, T, tree.num_pdfs)).astype(np.float32))
    loss, aux = chain_loss(y, None, den, sup)
    assert np.isfinite(float(loss))
    assert float(aux["num_failed"]) == 0.0

    dg = make_decoding_graph(lm, tree)
    hyp, _ = viterbi_decode(dg, np.asarray(y)[0])
    assert all(1 <= p <= 4 for p in hyp)
