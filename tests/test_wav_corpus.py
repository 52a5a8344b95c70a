"""Raw-audio data-dir front: synthetic wav corpus generation + assembly
(wav.scp + segments + utt2spk -> fbank -> CMVN -> speed perturb ->
trainable WordCorpus)."""

import numpy as np
import pytest

from torchain_tpu.data.kaldi_compat import load_wav_dir
from torchain_tpu.data.synth_wav import make_wav_data_dir


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavcorpus")
    make_wav_data_dir(
        str(d), num_utts=8, vocab_size=6, num_phones=4, num_speakers=2, seed=0
    )
    return str(d)


def test_dir_contents_complete(wav_dir):
    import pathlib

    names = {p.name for p in pathlib.Path(wav_dir).iterdir()}
    for req in (
        "wav.scp",
        "segments",
        "utt2spk",
        "text",
        "ali.txt",
        "words.txt",
        "phones.txt",
        "lexicon.txt",
        "frontend.json",
    ):
        assert req in names
    # recordings group 2 utts each
    assert sum(1 for n in names if n.endswith(".wav")) == 4


def test_load_assembles_trainable_corpus(wav_dir):
    wc = load_wav_dir(wav_dir, cmvn="speaker")
    corpus = wc.corpus
    assert len(corpus.utts) == 8
    assert len(wc.transcripts) == 8
    assert wc.lexicon is not None and len(wc.lexicon.prons) == 6
    # alignment frame counts match features exactly (synthesis contract)
    for u in corpus.utts:
        assert sum(d for _, d in u.alignment) == u.feats.shape[0]
    # transcripts expand to the alignment's phone sequence
    for u, tr in zip(corpus.utts, wc.transcripts):
        expanded = [q for w in tr for q in wc.lexicon.prons[w][0]]
        assert [p for p, _ in u.alignment] == expanded
    assert corpus.den_graph.num_states > 0
    assert corpus.tree.num_pdfs > 0


def test_speaker_cmvn_removes_gain_offset(wav_dir):
    """Per-speaker gains put a constant log-fbank offset between speakers;
    speaker CMVN (mean) must remove it."""
    raw = load_wav_dir(wav_dir, cmvn=None).corpus
    normed = load_wav_dir(wav_dir, cmvn="speaker").corpus
    from torchain_tpu.data.kaldi_compat import read_utt2spk
    import pathlib

    u2s = read_utt2spk(str(pathlib.Path(wav_dir) / "utt2spk"))

    def spk_means(utts):
        by = {}
        for u in utts:
            by.setdefault(u2s[u.utt_id], []).append(u.feats.mean())
        return {s: np.mean(v) for s, v in by.items()}

    raw_gap = np.ptp(list(spk_means(raw.utts).values()))
    norm_gap = np.ptp(list(spk_means(normed.utts).values()))
    assert raw_gap > 0.3  # gains are audible in raw features
    assert norm_gap < 0.05


def test_speed_perturb_triples_corpus(wav_dir):
    wc = load_wav_dir(wav_dir, cmvn="speaker", speed_perturb=True)
    corpus = wc.corpus
    assert len(corpus.utts) == 24
    ids = {u.utt_id for u in corpus.utts}
    assert "utt000" in ids and "sp0.9-utt000" in ids and "sp1.1-utt000" in ids
    by_id = {u.utt_id: u for u in corpus.utts}
    base = by_id["utt000"]
    slow = by_id["sp0.9-utt000"]
    fast = by_id["sp1.1-utt000"]
    # durations scale ~1/f, phone sequences identical
    assert slow.feats.shape[0] > base.feats.shape[0] > fast.feats.shape[0]
    for copy in (slow, fast):
        assert [p for p, _ in copy.alignment] == [p for p, _ in base.alignment]
        assert sum(d for _, d in copy.alignment) == copy.feats.shape[0]
    # transcripts replicate alongside
    assert len(wc.transcripts) == 24


def test_corpus_trains_one_step(wav_dir):
    """The assembled corpus drives a real train step end to end."""
    import jax.numpy as jnp

    from torchain_tpu.data import ChainDataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.models import TDNNF, TdnnfConfig
    from torchain_tpu.train import Trainer, TrainerConfig

    from torchain_tpu.ops import DeviceDenseDenGraph

    wc = load_wav_dir(wav_dir, cmvn="speaker")
    corpus = wc.corpus
    left = right = 4
    ds = ChainDataset(
        corpus.utts,
        corpus.tree,
        corpus.norm_fst,
        chunk_frames_out=20,
        left_context=left,
        right_context=right,
        sup_opts=SupervisionOptions(frame_subsampling_factor=3),
    )
    model = TDNNF(
        TdnnfConfig(
            num_pdfs=corpus.tree.num_pdfs,
            hidden_dim=32,
            bottleneck_dim=8,
            prefinal_dim=16,
            num_layers=2,
        )
    )
    den = DeviceDenseDenGraph.from_host(corpus.dense_den)
    tcfg = TrainerConfig(batch_size=4, lr=1e-3, num_epochs=1, log_every=100)
    t_in = 20 * 3 + left + right
    trainer = Trainer(
        model, den, tcfg, np.zeros((2, t_in, corpus.feat_dim), np.float32)
    )
    results = trainer.fit(ds, log_fn=lambda s: None)
    assert np.isfinite(results.objf)


def test_equal_frame_length_and_shift(tmp_path):
    """frame_length == frame_shift used to append the ENTIRE waveform
    (x[-0:] is the whole array); the tail pad must be skipped instead."""
    from torchain_tpu.data.features import FbankOptions

    d = tmp_path / "eqshift"
    make_wav_data_dir(
        str(d),
        num_utts=4,
        vocab_size=4,
        num_phones=3,
        num_speakers=2,
        opts=FbankOptions(sample_rate=8000, num_mel_bins=16,
                          frame_length_ms=10.0, frame_shift_ms=10.0),
        seed=3,
    )
    wc = load_wav_dir(str(d))
    assert len(wc.corpus.utts) == 4
