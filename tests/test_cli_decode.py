"""Standalone decode CLI (latgen-faster-mapped + compute-wer roles):
posteriors ark + text graph sources -> hypotheses + WER, fully decoupled
from training (SURVEY.md section 3.4 decode stage as its own surface)."""

import numpy as np
import pytest

from torchain_tpu import io as tio
from torchain_tpu.cli.decode import main as decode_main
from torchain_tpu.data import synthetic_word_dataset, train_word_lm
from torchain_tpu.fstkit import Fst
from torchain_tpu.graphs import ContextTree


def _peaked(pdfs, num_pdfs):
    ll = np.full((len(pdfs), num_pdfs), -8.0, dtype=np.float32)
    ll[np.arange(len(pdfs)), pdfs] = 0.0
    return ll


@pytest.fixture(scope="module")
def word_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("decode_cli")
    wc = synthetic_word_dataset(
        num_utts=6, vocab_size=6, num_phones=5, feat_dim=8, context_width=2, seed=2
    )
    tree = wc.corpus.tree
    # generative peaked posteriors per utterance (left-biphone pdf stream)
    posts = {}
    for i, tr in enumerate(wc.transcripts):
        pdfs, prev = [], 0
        for w in tr:
            for q in wc.lexicon.prons[w][0]:
                pdfs += [tree.pdf(q, 0, prev)] + [tree.pdf(q, 1, prev)] * 2
                prev = q
        posts[f"utt{i}"] = _peaked(pdfs, tree.num_pdfs)
    ark = str(d / "post.ark")
    tio.write_ark_binary(ark, posts)
    lex_path = str(d / "lexicon.txt")
    with open(lex_path, "w") as f:
        for w, prons in wc.lexicon.prons.items():
            for p in prons:
                f.write(f"{w} {' '.join(map(str, p))}\n")
    ref_path = str(d / "ref.txt")
    with open(ref_path, "w") as f:
        for i, tr in enumerate(wc.transcripts):
            f.write(f"utt{i} {' '.join(map(str, tr))}\n")
    return dict(
        dir=d, ark=ark, lexicon=lex_path, ref=ref_path, wc=wc, tree=tree
    )


def test_word_mode_zero_wer(word_files, capsys):
    res = decode_main(
        [
            "--posteriors", word_files["ark"],
            "--mode", "word",
            "--lexicon", word_files["lexicon"],
            "--ref", word_files["ref"],
            "--num-phones", "5",
            "--context-width", "2",
            "--hyp-out", str(word_files["dir"] / "hyp.txt"),
        ]
    )
    assert res["num_utts"] == 6
    assert res["wer"] == 0.0
    # hyp file round-trips
    with open(word_files["dir"] / "hyp.txt") as f:
        lines = [l.split() for l in f if l.strip()]
    assert len(lines) == 6
    assert [int(x) for x in lines[0][1:]] == word_files["wc"].transcripts[0]


def test_word_mode_explicit_word_lm(word_files):
    g = train_word_lm(word_files["wc"].transcripts)
    lm_path = str(word_files["dir"] / "g.fst.txt")
    with open(lm_path, "w") as f:
        f.write(g.to_text())
    res = decode_main(
        [
            "--posteriors", word_files["ark"],
            "--mode", "word",
            "--lexicon", word_files["lexicon"],
            "--word-lm", lm_path,
            "--ref", word_files["ref"],
            "--num-phones", "5",
            "--context-width", "2",
        ]
    )
    assert res["wer"] == 0.0


def test_phone_mode_with_nbest(tmp_path):
    from torchain_tpu.graphs import PhoneLmOptions, estimate_phone_lm

    rng = np.random.default_rng(0)
    tree = ContextTree(4, context_width=1)
    seqs = [[int(q) for q in rng.integers(1, 5, size=5)] for _ in range(20)]
    plm = estimate_phone_lm(seqs, PhoneLmOptions(ngram_order=2, num_extra_lm_states=20))
    lm_path = str(tmp_path / "plm.fst.txt")
    with open(lm_path, "w") as f:
        f.write(plm.to_text())

    posts = {}
    for i, seq in enumerate(seqs[:4]):
        pdfs = []
        for q in seq:
            pdfs += [tree.pdf(q, 0)] + [tree.pdf(q, 1)] * 2
        posts[f"u{i}"] = _peaked(pdfs, tree.num_pdfs)
    ark = str(tmp_path / "post.ark")
    with tio.MatrixWriter(ark) as w:  # text ark path
        for utt, m in posts.items():
            w.write(utt, m)
    ref = str(tmp_path / "ref.txt")
    with open(ref, "w") as f:
        for i, seq in enumerate(seqs[:4]):
            f.write(f"u{i} {' '.join(map(str, seq))}\n")

    res = decode_main(
        [
            "--posteriors", ark,
            "--mode", "phone",
            "--phone-lm", lm_path,
            "--num-phones", "4",
            "--ref", ref,
            "--nbest", "3",
        ]
    )
    assert res["wer"] == 0.0


def test_word_mode_lmwt_sweep(word_files):
    res = decode_main(
        [
            "--posteriors", word_files["ark"],
            "--mode", "word",
            "--lexicon", word_files["lexicon"],
            "--ref", word_files["ref"],
            "--num-phones", "5",
            "--context-width", "2",
            "--lmwt-min", "1",
            "--lmwt-max", "4",
        ]
    )
    # peaked posteriors decode perfectly at every weight; the sweep must
    # still run, report a winner, and keep WER at 0
    assert res["wer"] == 0.0
    assert 1 <= res["best_lmwt"] <= 4


def test_sweep_requires_ref(word_files):
    with pytest.raises(SystemExit):
        decode_main(
            [
                "--posteriors", word_files["ark"],
                "--mode", "word",
                "--lexicon", word_files["lexicon"],
                "--word-lm", "/nonexistent",
                "--num-phones", "5",
                "--context-width", "2",
                "--lmwt-min", "1",
                "--lmwt-max", "4",
            ]
        )


def test_lattice_out_archive_round_trips(word_files):
    from torchain_tpu.eval import read_lattice_ark, lattice_best_path

    lat_path = str(word_files["dir"] / "lat.ark.txt")
    res = decode_main(
        [
            "--posteriors", word_files["ark"],
            "--mode", "word",
            "--lexicon", word_files["lexicon"],
            "--ref", word_files["ref"],
            "--num-phones", "5",
            "--context-width", "2",
            "--lattice-out", lat_path,
        ]
    )
    assert res["wer"] == 0.0
    lats = read_lattice_ark(lat_path)
    assert len(lats) == 6
    # best path of the archived lattice reproduces the (perfect) decode
    for i, tr in enumerate(word_files["wc"].transcripts):
        hyp, _ = lattice_best_path(lats[f"utt{i}"])
        assert hyp == tr


def test_mbr_decode_with_confidences(word_files):
    conf_path = str(word_files["dir"] / "conf.txt")
    res = decode_main(
        [
            "--posteriors", word_files["ark"],
            "--mode", "word",
            "--lexicon", word_files["lexicon"],
            "--ref", word_files["ref"],
            "--num-phones", "5",
            "--context-width", "2",
            "--mbr",
            "--confidence-out", conf_path,
        ]
    )
    # peaked posteriors: the MBR hypothesis matches the reference too
    assert res["wer"] == 0.0
    with open(conf_path) as f:
        lines = [l.split() for l in f if l.strip()]
    assert len(lines) == 6
    for i, parts in enumerate(lines):
        utt, cs = parts[0], [float(c) for c in parts[1:]]
        n = int(utt[3:])
        assert len(cs) == len(word_files["wc"].transcripts[n])
        assert all(0.0 <= c <= 1.0 + 1e-6 for c in cs)
        # peaked evidence -> near-certain words
        assert min(cs) > 0.5


def test_mbr_with_lmwt_sweep(word_files):
    res = decode_main(
        [
            "--posteriors", word_files["ark"],
            "--mode", "word",
            "--lexicon", word_files["lexicon"],
            "--ref", word_files["ref"],
            "--num-phones", "5",
            "--context-width", "2",
            "--mbr",
            "--lmwt-min", "1",
            "--lmwt-max", "3",
        ]
    )
    assert res["mbr"] is True
    assert res["wer"] == 0.0
    assert 1 <= res["best_lmwt"] <= 3


def test_lm_rescore_swaps_grammars(word_files):
    # old G: the trained bigram; new G: a permissive unigram with a strong
    # preference ordering — after the swap the rescored best paths must
    # still be the references (peaked acoustics dominate), proving the
    # composition path end-to-end
    g_old = train_word_lm(word_files["wc"].transcripts)
    old_path = str(word_files["dir"] / "g_old.fst.txt")
    with open(old_path, "w") as f:
        f.write(g_old.to_text())
    vocab = sorted({w for tr in word_files["wc"].transcripts for w in tr})
    g_new = Fst()
    g_new.add_state()
    for w in vocab:
        g_new.add_arc(0, w, -0.5, 0)
    g_new.set_final(0, 0.0)
    new_path = str(word_files["dir"] / "g_new.fst.txt")
    with open(new_path, "w") as f:
        f.write(g_new.to_text())
    res = decode_main(
        [
            "--posteriors", word_files["ark"],
            "--mode", "word",
            "--lexicon", word_files["lexicon"],
            "--word-lm", old_path,
            "--ref", word_files["ref"],
            "--num-phones", "5",
            "--context-width", "2",
            "--lm-rescore", new_path,
            "--lm-rescore-old", old_path,
        ]
    )
    assert res["wer"] == 0.0


def test_confidence_out_requires_mbr(word_files):
    with pytest.raises(SystemExit):
        decode_main(
            [
                "--posteriors", word_files["ark"],
                "--mode", "word",
                "--lexicon", word_files["lexicon"],
                "--ref", word_files["ref"],
                "--num-phones", "5",
                "--context-width", "2",
                "--confidence-out", "/dev/null",
            ]
        )


def test_oracle_error_rate(word_files):
    res = decode_main(
        [
            "--posteriors", word_files["ark"],
            "--mode", "word",
            "--lexicon", word_files["lexicon"],
            "--ref", word_files["ref"],
            "--num-phones", "5",
            "--context-width", "2",
            "--oracle",
        ]
    )
    # the reference path survives the beam on peaked posteriors
    assert res["oracle_wer"] == 0.0
    assert res["wer"] == 0.0


def test_ctm_out_word_times(word_files):
    """--ctm-out writes NIST CTM rows whose words match the decode and
    whose segments tile each utterance from t=0."""
    from torchain_tpu.eval import read_ctm

    ctm_path = str(word_files["dir"] / "hyp.ctm")
    res = decode_main(
        [
            "--posteriors", word_files["ark"],
            "--mode", "word",
            "--lexicon", word_files["lexicon"],
            "--ref", word_files["ref"],
            "--num-phones", "5",
            "--context-width", "2",
            "--ctm-out", ctm_path,
            "--frame-shift", "0.03",
        ]
    )
    assert res["wer"] == 0.0
    ctm = read_ctm(ctm_path)
    assert len(ctm) == 6
    for i, tr in enumerate(word_files["wc"].transcripts):
        entries = ctm[f"utt{i}"]
        assert [e.word for e in entries] == tr
        assert entries[0].start_s == 0.0
        for a, b in zip(entries, entries[1:]):
            assert b.start_s == pytest.approx(a.start_s + a.dur_s, abs=0.005)
