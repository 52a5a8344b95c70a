"""Feature extraction + chunk loader + checkpoint round-trip tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from torchain_tpu.data import ChainDataset, FbankOptions, cmvn, fbank, mfcc, synthetic_dataset
from torchain_tpu.data.features import mel_filterbank, num_frames
from torchain_tpu.graphs import SupervisionOptions


class TestFeatures:
    def test_fbank_shapes_and_finiteness(self):
        opts = FbankOptions(num_mel_bins=23)
        rng = np.random.default_rng(0)
        wave = jnp.asarray(rng.normal(size=(2, 16000)).astype(np.float32))
        f = fbank(wave, opts)
        assert f.shape == (2, num_frames(16000, opts), 23)
        assert np.all(np.isfinite(np.asarray(f)))

    def test_mfcc_shapes(self):
        opts = FbankOptions(num_mel_bins=23, num_ceps=13)
        wave = jnp.asarray(np.random.default_rng(1).normal(size=(8000,)).astype(np.float32))
        m = mfcc(wave, opts)
        assert m.shape == (num_frames(8000, opts), 13)

    def test_mel_filterbank_covers_spectrum(self):
        opts = FbankOptions(num_mel_bins=40)
        fb = mel_filterbank(opts)
        # every mel bin has some support; interior fft bins covered
        assert (fb.sum(axis=0) > 0).all()
        mid = fb[10 : fb.shape[0] - 10].sum(axis=1)
        assert (mid > 0).all()

    def test_pure_tone_hits_right_bin(self):
        opts = FbankOptions(num_mel_bins=30)
        t = np.arange(16000) / opts.sample_rate
        for freq in (300.0, 1000.0, 3000.0):
            wave = jnp.asarray(np.sin(2 * np.pi * freq * t).astype(np.float32))
            f = np.asarray(fbank(wave, opts)).mean(axis=0)
            peak_bin = int(f.argmax())
            # find which mel bin the tone frequency falls into
            fb = mel_filterbank(opts)
            fft_bin = int(round(freq * opts.fft_size / opts.sample_rate))
            expected = int(fb[fft_bin].argmax())
            assert abs(peak_bin - expected) <= 1

    def test_cmvn(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(100, 13)).astype(np.float32) * 3 + 5)
        out = np.asarray(cmvn(x))
        np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-4)
        np.testing.assert_allclose(out.std(axis=0), 1.0, atol=1e-2)


class TestLoader:
    def test_batches_shapes_and_contract(self):
        corpus = synthetic_dataset(num_utts=12, num_phones=4, feat_dim=8, seed=1)
        left, right, fsf = 6, 4, 3
        ds = ChainDataset(
            corpus.utts,
            corpus.tree,
            corpus.norm_fst,
            chunk_frames_out=15,
            left_context=left,
            right_context=right,
            sup_opts=SupervisionOptions(left_tolerance=1, right_tolerance=1),
        )
        n = 0
        for batch in ds.batches(4):
            B, T_in, F = batch.feats.shape
            assert B == 4 and F == 8
            # SURVEY.md 3.2 shape contract
            assert T_in == batch.sup.num_frames * fsf + left + right
            assert batch.sup.in_src.shape[0] == B
            n += 1
        assert n >= 1
        assert ds.num_dropped == 0

    def test_deterministic_given_seed(self):
        corpus = synthetic_dataset(num_utts=8, num_phones=4, feat_dim=8, seed=2)
        def collect(seed):
            ds = ChainDataset(
                corpus.utts, corpus.tree, corpus.norm_fst,
                chunk_frames_out=15, left_context=2, right_context=2,
                sup_opts=SupervisionOptions(left_tolerance=1, right_tolerance=1),
                seed=seed,
            )
            return [b.feats.sum() for b in ds.batches(2)]
        assert collect(7) == collect(7)


class TestCheckpoint:
    def test_orbax_round_trip(self, tmp_path):
        import optax

        from torchain_tpu.models import TDNNF, TdnnfConfig
        from torchain_tpu.ops import ChainLossOptions, DeviceDenseDenGraph
        from torchain_tpu.train import Trainer, TrainerConfig

        corpus = synthetic_dataset(num_utts=8, num_phones=4, feat_dim=8, seed=3)
        cfg = TdnnfConfig(
            num_pdfs=corpus.tree.num_pdfs, hidden_dim=32, bottleneck_dim=8,
            prefinal_dim=16, num_layers=2,
        )
        model = TDNNF(cfg)
        left, right = cfg.context
        den = DeviceDenseDenGraph.from_host(corpus.dense_den)
        t_in = 10 * 3 + left + right
        example = np.zeros((2, t_in, 8), np.float32)
        tcfg = TrainerConfig(
            num_epochs=1, batch_size=2, checkpoint_dir=str(tmp_path / "ckpt"),
            log_every=1000, semi_ortho_every=0,
        )
        ds = ChainDataset(
            corpus.utts, corpus.tree, corpus.norm_fst, chunk_frames_out=10,
            left_context=left, right_context=right,
            sup_opts=SupervisionOptions(left_tolerance=1, right_tolerance=1),
        )
        tr = Trainer(model, den, tcfg, example)
        tr.fit(ds, log_fn=lambda s: None)
        step_after = int(tr.state.step)
        params_after = tr.state.params

        tr2 = Trainer(model, den, tcfg, example)
        assert int(tr2.state.step) == 0
        assert tr2.restore_checkpoint()
        assert int(tr2.state.step) == step_after
        a = jnp.concatenate([x.ravel() for x in __import__("jax").tree.leaves(params_after)])
        b = jnp.concatenate([x.ravel() for x in __import__("jax").tree.leaves(tr2.state.params)])
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_mid_epoch_resume_completes_run(self, tmp_path):
        """Interrupt mid-epoch, restore, finish: total steps must equal an
        uninterrupted run (exact batch-skip resume)."""
        import optax

        from torchain_tpu.models import TDNNF, TdnnfConfig
        from torchain_tpu.ops import DeviceDenseDenGraph
        from torchain_tpu.train import Trainer, TrainerConfig

        corpus = synthetic_dataset(num_utts=12, num_phones=4, feat_dim=8, seed=4)
        cfg = TdnnfConfig(
            num_pdfs=corpus.tree.num_pdfs, hidden_dim=32, bottleneck_dim=8,
            prefinal_dim=16, num_layers=2,
        )
        model = TDNNF(cfg)
        left, right = cfg.context
        den = DeviceDenseDenGraph.from_host(corpus.dense_den)
        example = np.zeros((2, 10 * 3 + left + right, 8), np.float32)
        ds = ChainDataset(
            corpus.utts, corpus.tree, corpus.norm_fst, chunk_frames_out=10,
            left_context=left, right_context=right,
            sup_opts=SupervisionOptions(left_tolerance=1, right_tolerance=1),
        )
        mk = lambda d: TrainerConfig(
            num_epochs=2, batch_size=2, checkpoint_dir=d, log_every=1000,
            semi_ortho_every=0, checkpoint_every=10**9,
        )
        # uninterrupted reference
        tr_ref = Trainer(model, den, mk(None), example)
        tr_ref.fit(ds, log_fn=lambda s: None)
        total_steps = int(tr_ref.state.step)
        assert total_steps >= 4

        # interrupted: stop after 3 batches of epoch 0 (simulate by fitting
        # with num_epochs=1 and manually saving mid-way)
        d = str(tmp_path / "ck")
        tr1 = Trainer(model, den, mk(d), example)
        with tr1.mesh:
            for bi, batch in enumerate(ds.batches(2, epoch=0)):
                feats, sup = tr1._put_batch(batch)
                tr1.state, _ = tr1.train_step(tr1.state, feats, tr1.den, sup)
                tr1.batch_in_epoch = bi + 1
                if bi == 2:
                    break
        tr1.current_epoch = 0
        tr1.save_checkpoint()

        tr2 = Trainer(model, den, mk(d), example)
        assert tr2.restore_checkpoint()
        assert tr2.start_epoch == 0 and tr2.skip_batches == 3
        tr2.fit(ds, log_fn=lambda s: None)
        assert int(tr2.state.step) == total_steps


class TestPrefetcher:
    def test_order_and_completion(self):
        from torchain_tpu.data import Prefetcher

        out = list(Prefetcher(iter(range(50)), depth=3))
        assert out == list(range(50))

    def test_exception_propagates(self):
        from torchain_tpu.data import Prefetcher

        def gen():
            yield 1
            raise RuntimeError("boom")

        it = Prefetcher(gen())
        assert next(it) == 1
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="boom"):
            for _ in it:
                pass

    def test_close_midway(self):
        from torchain_tpu.data import Prefetcher

        with Prefetcher(iter(range(1000)), depth=2) as p:
            assert next(p) == 0
        # closed without exhausting: no hang, thread drains


class TestGlobalCmvn:
    def test_stats_normalize_corpus(self):
        from torchain_tpu.data import apply_cmvn_stats, compute_cmvn_stats

        rng = np.random.default_rng(5)
        utts = [rng.normal(size=(50 + i, 6)).astype(np.float32) * 3 + 7 for i in range(4)]
        mean, std = compute_cmvn_stats(utts)
        normed = np.concatenate(
            [np.asarray(apply_cmvn_stats(jnp.asarray(u), mean, std)) for u in utts]
        )
        np.testing.assert_allclose(normed.mean(axis=0), 0.0, atol=1e-4)
        np.testing.assert_allclose(normed.std(axis=0), 1.0, atol=1e-2)

    def test_empty_raises(self):
        from torchain_tpu.data import compute_cmvn_stats

        with pytest.raises(ValueError):
            compute_cmvn_stats([])


class TestSupervisionCacheAndPrecompile:
    """Round-2 host-pipeline fixes: supervision compilations are cached
    across epochs (Kaldi compiles egs once, offline) and precompile() fills
    the cache from parallel worker processes with identical results."""

    def _ds(self):
        from torchain_tpu.data import ChainDataset, synthetic_dataset
        from torchain_tpu.graphs import SupervisionOptions

        corpus = synthetic_dataset(num_utts=12, num_phones=5, feat_dim=8, seed=11)
        return ChainDataset(
            corpus.utts,
            corpus.tree,
            corpus.norm_fst,
            chunk_frames_out=12,
            left_context=6,
            right_context=6,
            sup_opts=SupervisionOptions(frame_subsampling_factor=3),
            seed=5,
        )

    def test_cache_reuses_compilations_across_epochs(self):
        ds = self._ds()
        b1 = [b for b in ds.batches(4, epoch=0)]
        assert len(ds._sup_cache) > 0, "epoch must populate the cache"
        calls = {"n": 0}
        orig = ds._chunk_supervision

        def counting(*a, **k):
            calls["n"] += 1
            return orig(*a, **k)

        ds._chunk_supervision = counting
        b2 = [b for b in ds.batches(4, epoch=0)]
        assert calls["n"] == 0, "second epoch must not recompile"
        for x, y in zip(b1, b2):
            np.testing.assert_array_equal(x.sup.in_src, y.sup.in_src)
            np.testing.assert_allclose(x.sup.in_logw, y.sup.in_logw)

    def test_precompile_matches_inline(self):
        ds_a, ds_b = self._ds(), self._ds()
        n = ds_b.precompile(num_workers=2)
        assert n == len(ds_b.chunks)
        for x, y in zip(ds_a.batches(4, epoch=1), ds_b.batches(4, epoch=1)):
            np.testing.assert_array_equal(x.sup.in_src, y.sup.in_src)
            np.testing.assert_allclose(x.sup.in_logw, y.sup.in_logw)
            np.testing.assert_allclose(x.feats, y.feats)

    def test_cache_size_cap_respected(self):
        ds = self._ds()
        ds.sup_cache_size = 2
        for _ in ds.batches(4, epoch=0):
            pass
        assert len(ds._sup_cache) <= 2


class TestMaterializedBatches:
    def _ds(self):
        from torchain_tpu.data import ChainDataset, synthetic_dataset
        from torchain_tpu.graphs import SupervisionOptions

        corpus = synthetic_dataset(num_utts=12, num_phones=4, feat_dim=8,
                                   seed=9)
        return ChainDataset(
            corpus.utts, corpus.tree, corpus.norm_fst, chunk_frames_out=8,
            left_context=2, right_context=2,
            sup_opts=SupervisionOptions(left_tolerance=1, right_tolerance=1),
        )

    def test_same_batch_multiset_as_live(self):
        from torchain_tpu.data import MaterializedBatches

        ds = self._ds()
        caps = ds.estimate_sup_caps()
        live = sorted(
            float(np.sum(b.feats)) for b in ds.batches(
                4, shuffle=True, epoch=0, sup_caps=caps)
        )
        mat = MaterializedBatches(ds, 4, sup_caps=caps)
        got = sorted(float(np.sum(b.feats)) for b in mat.batches(4, epoch=3))
        assert got == live

    def test_epoch_shuffle_deterministic(self):
        from torchain_tpu.data import MaterializedBatches

        mat = MaterializedBatches(self._ds(), 4, seed=5)
        a = [id(b) for b in mat.batches(4, epoch=1)]
        b = [id(b) for b in mat.batches(4, epoch=1)]
        c = [id(b) for b in mat.batches(4, epoch=2)]
        assert a == b
        assert sorted(a) == sorted(c)
        assert len(mat) == len(a)
        assert mat.nbytes > 0

    def test_trainer_fit_runs(self):
        import jax.numpy as jnp

        from torchain_tpu.data import (
            ChainDataset,
            MaterializedBatches,
            synthetic_dataset,
        )
        from torchain_tpu.graphs import SupervisionOptions
        from torchain_tpu.models import TDNN, TdnnConfig
        from torchain_tpu.ops import DeviceDenseDenGraph
        from torchain_tpu.train import Trainer, TrainerConfig

        corpus = synthetic_dataset(num_utts=12, num_phones=4, feat_dim=8,
                                   seed=9)
        den = DeviceDenseDenGraph.from_host(corpus.dense_den)
        cfg = TdnnConfig(num_pdfs=corpus.tree.num_pdfs, hidden_dim=32)
        model = TDNN(cfg)
        left, right = cfg.context
        ds = ChainDataset(
            corpus.utts, corpus.tree, corpus.norm_fst, chunk_frames_out=8,
            left_context=left, right_context=right,
            sup_opts=SupervisionOptions(left_tolerance=1, right_tolerance=1),
        )
        t_in = 8 * cfg.frame_subsampling_factor + left + right
        tcfg = TrainerConfig(batch_size=4, num_epochs=1, log_every=100)
        tr = Trainer(model, den, tcfg,
                     jnp.zeros((4, t_in, 8), jnp.float32))
        mat = MaterializedBatches(ds, 4)
        res = tr.fit(mat, log_fn=lambda *_: None)
        assert res.steps > 0
