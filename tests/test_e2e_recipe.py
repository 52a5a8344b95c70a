"""The full recipe as a test (config-2 milestone, WER-gate style):
synthetic corpus -> train TDNN-F -> decode -> phone error rate must be low.
This is the in-repo stand-in for the Mini-LibriSpeech WER-parity gate until
a real corpus is mountable (no network in this environment)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchain_tpu.data import ChainDataset, synthetic_dataset
from torchain_tpu.eval import make_decoding_graph, viterbi_decode, wer
from torchain_tpu.graphs import PhoneLmOptions, SupervisionOptions, estimate_phone_lm
from torchain_tpu.models import TDNNF, TdnnfConfig
from torchain_tpu.ops import ChainLossOptions, DeviceDenseDenGraph
from torchain_tpu.train import Trainer, TrainerConfig
from torchain_tpu.train.step import make_forward_fn


@pytest.mark.slow
def test_train_decode_per_gate():
    corpus = synthetic_dataset(
        num_utts=32,
        num_phones=5,
        feat_dim=16,
        utt_frames_out=(36, 60),
        noise=0.3,
        seed=0,
    )
    cfg = TdnnfConfig(
        num_pdfs=corpus.tree.num_pdfs,
        hidden_dim=96,
        bottleneck_dim=24,
        prefinal_dim=48,
        num_layers=3,
    )
    model = TDNNF(cfg)
    left, right = cfg.context
    fsf = cfg.frame_subsampling_factor
    dataset = ChainDataset(
        corpus.utts,
        corpus.tree,
        corpus.norm_fst,
        chunk_frames_out=18,
        left_context=left,
        right_context=right,
        sup_opts=SupervisionOptions(left_tolerance=2, right_tolerance=2),
    )
    den = DeviceDenseDenGraph.from_host(corpus.dense_den)
    tcfg = TrainerConfig(
        lr=2e-3,
        num_epochs=10,
        batch_size=8,
        semi_ortho_every=4,
        log_every=50,
        loss=ChainLossOptions(
            l2_regularize=1e-4, leaky_hmm_coefficient=0.1, xent_regularize=0.1
        ),
    )
    t_in = 18 * fsf + left + right
    trainer = Trainer(model, den, tcfg, np.zeros((2, t_in, 16), np.float32))
    results = trainer.fit(dataset, log_fn=lambda s: None)
    assert results.tot_failed == 0
    assert results.objf > -1.0  # must have learned the emission mapping

    # decode all utterances with a bigram LM over the training transcripts
    refs = [[p for p, _ in u.alignment] for u in corpus.utts]
    lm = estimate_phone_lm(refs, PhoneLmOptions(ngram_order=2, num_extra_lm_states=500))
    dgraph = make_decoding_graph(lm, corpus.tree)
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
        hyp, _ = viterbi_decode(dgraph, y)
        hyps.append(hyp)
    score = wer(refs, hyps)
    # the synthetic task is near-separable: a trained model must decode most
    # phones correctly (untrained/random sits near ~90% PER)
    assert score["wer"] < 20.0, score


@pytest.mark.slow
def test_dress_rehearsal_wav_ladder(tmp_path):
    """The FULL Kaldi-recipe ladder in one CLI invocation, zero Kaldi
    binaries: wav.scp (+segments, utt2spk) -> fbank -> per-speaker CMVN ->
    3-way speed perturb -> online iVectors -> data-driven tied tree ->
    chain training -> word HCLG decode -> LMWT sweep -> MBR.  On a
    real-corpus day the data dir is swapped and nothing else changes
    (VERDICT r2 item 10)."""
    from torchain_tpu.cli.train import main
    from torchain_tpu.data.synth_wav import make_wav_data_dir

    d = tmp_path / "wavdir"
    make_wav_data_dir(
        str(d),
        num_utts=12,
        vocab_size=6,
        num_phones=4,
        num_speakers=2,
        utts_per_recording=3,
        seed=3,
    )
    out = main(
        [
            "--wav-dir", str(d),
            "--cmvn", "speaker",
            "--speed-perturb",
            "--ivector-dim", "4",
            "--ivector-gauss", "8",
            "--tied-tree-pdfs", "24",
            "--epochs", "2",
            "--batch-size", "6",
            "--chunk-frames", "16",
            "--hidden-dim", "48",
            "--bottleneck-dim", "12",
            "--num-layers", "2",
            "--decode",
            "--lmwt-min", "6",
            "--lmwt-max", "10",
            "--mbr",
        ]
    )
    assert out["steps"] > 0
    # every rung of the ladder reported
    assert "per" in out
    assert "wer" in out and out["wer"] <= 100.0
    assert "best_lmwt" in out and 6 <= out["best_lmwt"] <= 10
    assert "mbr_wer" in out and out["mbr_wer"] <= 100.0
