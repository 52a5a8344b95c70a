"""Run-config serialization into checkpoints + fingerprint-gated resume
(SURVEY.md section 5 config row: dataclass configs serialized into
checkpoints; VERDICT r1 item 10: refuse resume on changed den graph)."""

import json

import numpy as np
import pytest

from torchain_tpu.data import ChainDataset, synthetic_dataset
from torchain_tpu.graphs import SupervisionOptions
from torchain_tpu.models import TDNNF, TdnnfConfig
from torchain_tpu.ops import ChainLossOptions, auto_den_graph
from torchain_tpu.train import Trainer, TrainerConfig


def _setup(tmp_path, seed=7, num_phones=5):
    corpus = synthetic_dataset(
        num_utts=10, num_phones=num_phones, feat_dim=8, seed=seed
    )
    cfg = TdnnfConfig(
        num_pdfs=corpus.tree.num_pdfs,
        hidden_dim=32,
        bottleneck_dim=8,
        prefinal_dim=16,
        num_layers=2,
    )
    model = TDNNF(cfg)
    left, right = cfg.context
    ds = ChainDataset(
        corpus.utts,
        corpus.tree,
        corpus.norm_fst,
        chunk_frames_out=12,
        left_context=left,
        right_context=right,
        sup_opts=SupervisionOptions(frame_subsampling_factor=3),
        seed=3,
    )
    den = auto_den_graph(corpus.den_graph)
    tcfg = TrainerConfig(
        lr=1e-3,
        num_epochs=1,
        batch_size=4,
        log_every=1000,
        semi_ortho_every=0,
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=10_000,
        loss=ChainLossOptions(leaky_hmm_coefficient=0.1),
    )
    t_in = 12 * 3 + left + right
    trainer = Trainer(
        model, den, tcfg, np.zeros((2, t_in, 8), np.float32), tree=corpus.tree
    )
    return corpus, ds, den, model, tcfg, trainer, t_in


def test_config_written_and_readable(tmp_path):
    _, ds, _, _, tcfg, trainer, _ = _setup(tmp_path)
    trainer.fit(ds, log_fn=lambda s: None)
    saved = Trainer.load_run_config(tcfg.checkpoint_dir)
    assert saved is not None
    assert saved["config"]["lr"] == pytest.approx(1e-3)
    assert saved["config"]["loss"]["leaky_hmm_coefficient"] == pytest.approx(0.1)
    assert saved["fingerprints"]["den"]
    assert saved["fingerprints"]["tree"]
    # file is plain json on disk
    raw = json.loads((tmp_path / "ckpt" / "run_config.json").read_text())
    assert raw == saved


def test_resume_with_same_graph_succeeds(tmp_path):
    corpus, ds, den, model, tcfg, trainer, t_in = _setup(tmp_path)
    trainer.fit(ds, log_fn=lambda s: None)
    tr2 = Trainer(
        model, den, tcfg, np.zeros((2, t_in, 8), np.float32), tree=corpus.tree
    )
    assert tr2.restore_checkpoint()
    assert int(tr2.state.step) > 0


def test_resume_with_changed_den_graph_refuses(tmp_path):
    corpus, ds, den, model, tcfg, trainer, t_in = _setup(tmp_path)
    trainer.fit(ds, log_fn=lambda s: None)
    other = synthetic_dataset(num_utts=10, num_phones=5, feat_dim=8, seed=99)
    den2 = auto_den_graph(other.den_graph)
    tr2 = Trainer(
        model, den2, tcfg, np.zeros((2, t_in, 8), np.float32), tree=other.tree
    )
    with pytest.raises(ValueError, match="refusing to resume"):
        tr2.restore_checkpoint()
