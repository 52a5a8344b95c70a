"""Word time alignments (CTM): lattice-align-words + nbest-to-ctm role."""

import numpy as np
import pytest

from torchain_tpu.data import synthetic_word_dataset, train_word_lm
from torchain_tpu.eval import (
    best_path_ctm,
    lattice_best_path,
    lattice_decode,
    make_word_decoding_graph,
    read_ctm,
    rescore_lattice,
    write_ctm,
)


@pytest.fixture(scope="module")
def decoded():
    wc = synthetic_word_dataset(
        num_utts=6, vocab_size=8, num_phones=5, feat_dim=12, seed=0, noise=0.2
    )
    corpus = wc.corpus
    lm = train_word_lm(wc.transcripts, order=2)
    graph = make_word_decoding_graph(lm, wc.lexicon, corpus.tree)
    # ideal posteriors from the generative means: y = -||f - mu||^2 row scores
    lats = []
    fsf = 3
    for u in corpus.utts:
        f = u.feats[::fsf]
        d = ((f[:, None, :] - corpus.pdf_means[None]) ** 2).sum(-1)
        y = (-0.5 * d).astype(np.float32)
        lats.append(lattice_decode(graph, y, beam=10.0))
    return wc, lats, fsf


def test_ctm_words_match_best_path(decoded):
    wc, lats, fsf = decoded
    for lat in lats:
        words, _ = lattice_best_path(lat)
        ctm = best_path_ctm(lat, frame_shift_s=0.01 * fsf)
        assert [e.word for e in ctm] == words


def test_ctm_times_partition_the_utterance(decoded):
    """Segments are contiguous from t=0, non-overlapping, and end at or
    before the last frame; confidences are valid posteriors."""
    wc, lats, fsf = decoded
    shift = 0.01 * fsf
    for lat in lats:
        ctm = best_path_ctm(lat, frame_shift_s=shift)
        if not ctm:
            continue
        assert ctm[0].start_s == 0.0
        for prev, cur in zip(ctm, ctm[1:]):
            assert cur.start_s == pytest.approx(prev.start_s + prev.dur_s)
        for e in ctm:
            assert e.dur_s > 0
            assert 0.0 <= e.conf <= 1.0 + 1e-6


def test_ctm_confidence_tracks_posterior(decoded):
    """A words-certain lattice gives ~1.0 confidence on the best path."""
    wc, lats, fsf = decoded
    ctm = best_path_ctm(rescore_lattice(lats[0], lm_scale=10.0))
    assert all(e.conf > 0.5 for e in ctm)


def test_ctm_file_roundtrip(tmp_path, decoded):
    wc, lats, fsf = decoded
    entries = {
        f"utt{i}": best_path_ctm(lat, frame_shift_s=0.03)
        for i, lat in enumerate(lats[:3])
    }
    p = str(tmp_path / "hyp.ctm")
    words_txt = {w: f"w{w}" for w in range(1, 9)}
    write_ctm(p, entries, words_txt=words_txt)
    back = read_ctm(p)
    assert set(back) == set(entries)
    for utt in entries:
        assert [e.word for e in back[utt]] == [e.word for e in entries[utt]]
        for a, b in zip(back[utt], entries[utt]):
            assert a.start_s == pytest.approx(b.start_s, abs=0.005)
            assert a.dur_s == pytest.approx(b.dur_s, abs=0.005)
