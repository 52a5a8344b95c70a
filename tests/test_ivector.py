"""iVector subsystem tests (Kaldi src/ivector role).

Covers: diag-UBM EM recovery of a known mixture, total-variability EM
recovering per-utterance latent vectors generated FROM the model (up to
the inherent rotation ambiguity, checked via linear-fit R^2), online
extraction consistency with utterance-level extraction, and the corpus
helper's wiring into the Utterance/ChainDataset pipeline.
"""

import numpy as np
import pytest

from torchain_tpu.data.ivector import (
    append_corpus_ivectors,
    extract_ivector,
    extract_ivectors_online,
    train_diag_ubm,
    train_ivector_extractor,
)


def _gmm_data(rng, n, means, scale=0.3):
    comps = rng.integers(0, len(means), size=n)
    return means[comps] + scale * rng.normal(size=(n, means.shape[1]))


def test_diag_ubm_recovers_mixture():
    rng = np.random.default_rng(0)
    true_means = np.array(
        [[0.0, 0.0], [5.0, 0.0], [0.0, 5.0], [5.0, 5.0]], np.float64
    )
    feats = _gmm_data(rng, 4000, true_means)
    ubm = train_diag_ubm(feats, num_gauss=4, num_iters=20, seed=1)
    # every true mean has a learned mean within a fraction of the spacing
    d = np.linalg.norm(true_means[:, None] - ubm.means[None], axis=2)
    assert d.min(axis=1).max() < 0.5, ubm.means
    np.testing.assert_allclose(ubm.weights.sum(), 1.0, rtol=1e-9)
    assert (ubm.vars > 0).all()


def test_posteriors_are_normalized_and_peaked():
    rng = np.random.default_rng(1)
    true_means = np.array([[0.0, 0.0], [8.0, 8.0]])
    feats = _gmm_data(rng, 500, true_means)
    ubm = train_diag_ubm(feats, num_gauss=2, num_iters=10)
    post = ubm.posteriors(feats)
    np.testing.assert_allclose(post.sum(axis=1), 1.0, rtol=1e-8)
    # well-separated clusters -> confident responsibilities
    assert (post.max(axis=1) > 0.99).mean() > 0.95


def _model_corpus(rng, ubm_means, m_true, num_utts=40, frames=120, noise=0.2):
    """Utterances generated from the iVector model itself."""
    g, f, d = m_true.shape
    utts, ws = [], []
    for _ in range(num_utts):
        w = rng.normal(size=d)
        comps = rng.integers(0, g, size=frames)
        x = (
            ubm_means[comps]
            + np.einsum("tfd,d->tf", m_true[comps], w)
            + noise * rng.normal(size=(frames, f))
        )
        utts.append(x)
        ws.append(w)
    return utts, np.stack(ws)


def test_extractor_em_recovers_latents():
    """Train the TV model on data generated from a random TV model; the
    recovered iVectors must explain the true latents (R^2 via linear fit —
    the subspace is identifiable only up to a rotation)."""
    rng = np.random.default_rng(2)
    g, f, d = 4, 6, 2
    ubm_means = rng.normal(scale=4.0, size=(g, f))
    pool = _gmm_data(rng, 3000, ubm_means, scale=0.5)
    ubm = train_diag_ubm(pool, num_gauss=g, num_iters=15, seed=3)
    m_true = rng.normal(scale=1.0, size=(g, f, d))
    utts, w_true = _model_corpus(rng, ubm_means, m_true)
    ext = train_ivector_extractor(ubm, utts, ivector_dim=d, num_iters=8, seed=4)
    w_hat = np.stack([extract_ivector(ext, u) for u in utts])
    # least-squares fit w_true ~ A w_hat; R^2 must be high
    a, *_ = np.linalg.lstsq(w_hat, w_true, rcond=None)
    resid = w_true - w_hat @ a
    r2 = 1.0 - (resid**2).sum() / ((w_true - w_true.mean(0)) ** 2).sum()
    assert r2 > 0.9, r2


def test_em_improves_latent_fit():
    """More EM iterations must not degrade the latent recovery."""
    rng = np.random.default_rng(5)
    g, f, d = 3, 5, 2
    ubm_means = rng.normal(scale=4.0, size=(g, f))
    pool = _gmm_data(rng, 2000, ubm_means, scale=0.5)
    ubm = train_diag_ubm(pool, num_gauss=g, num_iters=15, seed=6)
    m_true = rng.normal(size=(g, f, d))
    utts, w_true = _model_corpus(rng, ubm_means, m_true, num_utts=30)

    def r2(iters):
        ext = train_ivector_extractor(ubm, utts, d, num_iters=iters, seed=7)
        w_hat = np.stack([extract_ivector(ext, u) for u in utts])
        a, *_ = np.linalg.lstsq(w_hat, w_true, rcond=None)
        resid = w_true - w_hat @ a
        return 1.0 - (resid**2).sum() / ((w_true - w_true.mean(0)) ** 2).sum()

    assert r2(6) >= r2(1) - 0.02


def test_online_matches_utterance_level():
    """With posterior_scale=1 and no count cap, the LAST online iVector
    uses exactly the full-utterance stats."""
    rng = np.random.default_rng(8)
    g, f, d = 3, 5, 2
    ubm_means = rng.normal(scale=4.0, size=(g, f))
    pool = _gmm_data(rng, 2000, ubm_means, scale=0.5)
    ubm = train_diag_ubm(pool, num_gauss=g, num_iters=10, seed=9)
    m_true = rng.normal(size=(g, f, d))
    utts, _ = _model_corpus(rng, ubm_means, m_true, num_utts=10)
    ext = train_ivector_extractor(ubm, utts, d, num_iters=3, seed=10)
    x = utts[0]
    online = extract_ivectors_online(
        ext, x, period=7, posterior_scale=1.0, max_count=0.0
    )
    assert online.shape == (int(np.ceil(x.shape[0] / 7)), d)
    full = extract_ivector(ext, x)
    np.testing.assert_allclose(online[-1], full, rtol=1e-8, atol=1e-10)


def test_online_max_count_caps_stats():
    """max_count freezes adaptation: once the cap binds, consecutive
    online iVectors change much more slowly than uncapped ones."""
    rng = np.random.default_rng(11)
    g, f, d = 3, 5, 2
    ubm_means = rng.normal(scale=4.0, size=(g, f))
    pool = _gmm_data(rng, 2000, ubm_means, scale=0.5)
    ubm = train_diag_ubm(pool, num_gauss=g, num_iters=10, seed=12)
    m_true = rng.normal(size=(g, f, d))
    utts, _ = _model_corpus(rng, ubm_means, m_true, num_utts=8, frames=200)
    ext = train_ivector_extractor(ubm, utts, d, num_iters=3, seed=13)
    capped = extract_ivectors_online(
        ext, utts[0], period=10, posterior_scale=1.0, max_count=5.0
    )
    # norms bounded: capped stats keep the prior's pull
    assert np.linalg.norm(capped, axis=1).max() < np.linalg.norm(
        extract_ivectors_online(
            ext, utts[0], period=10, posterior_scale=1.0, max_count=0.0
        ),
        axis=1,
    ).max() + 1e-9


def test_append_corpus_ivectors_pipeline():
    """Corpus helper appends D extra dims and the result trains through
    ChainDataset (shape contract preserved end to end)."""
    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.graphs import SupervisionOptions

    corpus = synthetic_dataset(
        num_utts=6, num_phones=5, feat_dim=8, utt_frames_out=(20, 24), seed=0
    )
    d = 3
    new_utts, ext = append_corpus_ivectors(
        corpus.utts, ivector_dim=d, num_gauss=4, period=5, ubm_frames=2000
    )
    assert ext.ivector_dim == d
    for old, new in zip(corpus.utts, new_utts):
        assert new.feats.shape == (old.feats.shape[0], old.feats.shape[1] + d)
        np.testing.assert_array_equal(new.feats[:, : old.feats.shape[1]], old.feats)
        assert new.feats.dtype == old.feats.dtype
        # per-frame repeat: frames within one period share an iVector
        np.testing.assert_array_equal(
            new.feats[0, old.feats.shape[1] :], new.feats[4, old.feats.shape[1] :]
        )
    ds = ChainDataset(
        new_utts,
        corpus.tree,
        corpus.norm_fst,
        chunk_frames_out=6,
        left_context=2,
        right_context=2,
        sup_opts=SupervisionOptions(left_tolerance=1, right_tolerance=1),
    )
    batch = next(ds.batches(2, shuffle=False))
    assert batch.feats.shape[-1] == 8 + d
    assert np.isfinite(batch.feats).all()
