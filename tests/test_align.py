"""Forced alignment tests + the full two-stage flat-start ladder:
e2e training (no alignments) -> force-align -> tolerance-path training."""

import numpy as np
import pytest

import jax.numpy as jnp

from torchain_tpu.data import synthetic_dataset
from torchain_tpu.eval.align import align_corpus, force_align
from torchain_tpu.graphs import ContextTree


class TestForceAlign:
    def test_oracle_posteriors_recover_exact_durations(self):
        rng = np.random.default_rng(0)
        tree = ContextTree(5)
        for _ in range(10):
            phones = list(map(int, rng.integers(1, 6, size=rng.integers(2, 6))))
            durs = [int(d) for d in rng.integers(1, 5, size=len(phones))]
            T = sum(durs)
            y = np.full((T, tree.num_pdfs), -8.0, dtype=np.float32)
            t = 0
            left = 0
            for p, d in zip(phones, durs):
                y[t, tree.pdf(p, 0, left)] = 8.0
                for k in range(1, d):
                    y[t + k, tree.pdf(p, 1, left)] = 8.0
                t += d
                left = p
            ali = force_align(y, phones, tree)
            assert ali == list(zip(phones, durs))

    def test_noisy_posteriors_valid_alignment(self):
        rng = np.random.default_rng(1)
        tree = ContextTree(4)
        phones = [1, 3, 2, 4]
        T = 15
        y = rng.normal(size=(T, tree.num_pdfs)).astype(np.float32)
        ali = force_align(y, phones, tree)
        assert [p for p, _ in ali] == phones
        assert sum(d for _, d in ali) == T
        assert all(d >= 1 for _, d in ali)

    def test_infeasible_raises(self):
        tree = ContextTree(3)
        y = np.zeros((2, tree.num_pdfs), np.float32)
        with pytest.raises(ValueError):
            force_align(y, [1, 2, 3], tree)


@pytest.mark.slow
def test_flat_start_ladder():
    """Stage 1: e2e training from transcripts only.  Stage 2: force-align
    with the stage-1 model; alignments must broadly agree with the (hidden)
    generating alignments.  Stage 3: tolerance-path training on the
    GENERATED alignments works."""
    from torchain_tpu.data import ChainDataset, E2eChainDataset, Utterance
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.models import TDNNF, TdnnfConfig
    from torchain_tpu.ops import ChainLossOptions, DeviceDenseDenGraph
    from torchain_tpu.train import Trainer, TrainerConfig
    from torchain_tpu.train.step import make_forward_fn

    corpus = synthetic_dataset(
        num_utts=24, num_phones=5, feat_dim=16, utt_frames_out=(30, 45),
        noise=0.3, seed=0,
    )
    cfg = TdnnfConfig(
        num_pdfs=corpus.tree.num_pdfs, hidden_dim=96, bottleneck_dim=24,
        prefinal_dim=48, num_layers=3,
    )
    model = TDNNF(cfg)
    left, right = cfg.context
    fsf = cfg.frame_subsampling_factor
    den = DeviceDenseDenGraph.from_host(corpus.dense_den)

    # stage 1: flat-start (transcripts only)
    e2e_ds = E2eChainDataset(
        corpus.utts, corpus.tree, corpus.norm_fst, chunk_frames_out=24,
        left_context=left, right_context=right, frame_subsampling_factor=fsf,
    )
    t_in = 24 * fsf + left + right
    tcfg = TrainerConfig(
        lr=2e-3, num_epochs=8, batch_size=8, semi_ortho_every=4,
        log_every=1000,
        loss=ChainLossOptions(l2_regularize=1e-4, leaky_hmm_coefficient=0.1),
        use_xent=False,
    )
    tr1 = Trainer(model, den, tcfg, np.zeros((2, t_in, 16), np.float32))
    res1 = tr1.fit(e2e_ds, log_fn=lambda s: None)
    assert res1.tot_failed == 0

    # stage 2: force-align with the flat-start model
    forward = make_forward_fn(model)
    variables = {"params": tr1.state.params}
    if tr1.state.batch_stats:
        variables["batch_stats"] = tr1.state.batch_stats
    gen_alis = align_corpus(
        forward, variables, corpus.utts, corpus.tree,
        frame_subsampling_factor=fsf, left_context=left, right_context=right,
    )
    # frame-level agreement with the true generating alignments
    agree = total = 0
    for utt, ali in zip(corpus.utts, gen_alis):
        true_frames = np.repeat([p for p, _ in utt.alignment],
                                [d for _, d in utt.alignment])
        gen_frames = np.repeat([p for p, _ in ali], [d for _, d in ali])
        L = min(len(true_frames), len(gen_frames))
        agree += (true_frames[:L] == gen_frames[:L]).sum()
        total += L
    assert agree / total > 0.75, f"alignment agreement {agree/total:.2f}"

    # stage 3: standard tolerance-path training on GENERATED alignments
    utts2 = [
        Utterance(feats=u.feats, alignment=ali, utt_id=u.utt_id)
        for u, ali in zip(corpus.utts, gen_alis)
    ]
    ds2 = ChainDataset(
        utts2, corpus.tree, corpus.norm_fst, chunk_frames_out=24,
        left_context=left, right_context=right,
        sup_opts=SupervisionOptions(left_tolerance=2, right_tolerance=2),
    )
    tcfg2 = TrainerConfig(
        lr=2e-3, num_epochs=2, batch_size=8, semi_ortho_every=4,
        log_every=1000,
        loss=ChainLossOptions(l2_regularize=1e-4, leaky_hmm_coefficient=0.1,
                              xent_regularize=0.1),
    )
    tr2 = Trainer(TDNNF(cfg), den, tcfg2, np.zeros((2, t_in, 16), np.float32))
    res2 = tr2.fit(ds2, log_fn=lambda s: None)
    assert res2.tot_failed == 0
    assert res2.tot_weight > 0
    assert ds2.num_dropped <= len(ds2.chunks) // 4  # alignments are usable
