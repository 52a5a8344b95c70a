"""On-disk egs archive tests (nnet3-chain-get-egs archive role:
supervision compiled once, written to disk, reloaded bit-exactly by
training runs; fingerprint-guarded against mismatched datasets)."""

import dataclasses

import numpy as np
import pytest

from torchain_tpu.data import ChainDataset, synthetic_dataset
from torchain_tpu.graphs import SupervisionOptions


def _make_dataset(tol=1):
    corpus = synthetic_dataset(
        num_utts=6, num_phones=5, feat_dim=6, utt_frames_out=(20, 26), seed=0
    )
    ds = ChainDataset(
        corpus.utts,
        corpus.tree,
        corpus.norm_fst,
        chunk_frames_out=8,
        left_context=3,
        right_context=3,
        sup_opts=SupervisionOptions(left_tolerance=tol, right_tolerance=tol),
    )
    return corpus, ds


def test_save_load_roundtrip_bitexact(tmp_path):
    corpus, ds = _make_dataset()
    path = tmp_path / "egs.npz"
    n = ds.save_egs(path)
    assert n > 0
    ref_batches = list(ds.batches(2, shuffle=False))

    _, ds2 = _make_dataset()
    assert ds2.load_egs(path) == n
    # cache now holds every chunk: no recompilation happens on iteration
    ds2._chunk_supervision = None  # would raise if called
    new_batches = list(ds2.batches(2, shuffle=False))
    assert len(new_batches) == len(ref_batches)
    for a, b in zip(ref_batches, new_batches):
        np.testing.assert_array_equal(a.feats, b.feats)
        np.testing.assert_array_equal(a.sup.in_src, b.sup.in_src)
        np.testing.assert_array_equal(a.sup.in_pdf, b.sup.in_pdf)
        np.testing.assert_array_equal(a.sup.in_logw, b.sup.in_logw)
        np.testing.assert_array_equal(a.sup.final_logw, b.sup.final_logw)
        np.testing.assert_array_equal(a.sup.num_states, b.sup.num_states)
        np.testing.assert_array_equal(
            np.asarray(a.sup.weight), np.asarray(b.sup.weight)
        )


def test_load_refuses_mismatched_dataset(tmp_path):
    _, ds = _make_dataset(tol=1)
    path = tmp_path / "egs.npz"
    ds.save_egs(path)
    # different supervision options -> different fingerprint -> refuse
    _, ds_other = _make_dataset(tol=2)
    with pytest.raises(ValueError, match="fingerprint"):
        ds_other.load_egs(path)


def test_fingerprint_sensitive_to_tree_and_norm_fst(tmp_path):
    corpus, ds = _make_dataset()
    fp = ds.egs_fingerprint()
    # same dataset built twice -> identical fingerprint (determinism)
    _, ds_again = _make_dataset()
    assert ds_again.egs_fingerprint() == fp
    # perturbing the normalization FST changes it
    from torchain_tpu.fstkit import Fst

    bent = Fst()
    for s in range(corpus.norm_fst.num_states):
        bent.add_state()
    bent_arcs = 0
    for s in range(corpus.norm_fst.num_states):
        for a in corpus.norm_fst.arcs(s):
            bent.add_arc(s, a.label, a.weight + 0.125, a.dst)
            bent_arcs += 1
        if corpus.norm_fst.is_final(s):
            bent.set_final(s, corpus.norm_fst.final(s))
    ds_bent = ChainDataset(
        corpus.utts,
        corpus.tree,
        bent,
        chunk_frames_out=8,
        left_context=3,
        right_context=3,
        sup_opts=SupervisionOptions(left_tolerance=1, right_tolerance=1),
    )
    assert ds_bent.egs_fingerprint() != fp


def test_dropped_chunks_survive_reload(tmp_path):
    """A dataset whose archive recorded dropped chunks must not recompile
    (and re-fail) them after load."""
    corpus, ds = _make_dataset()
    # force-drop chunk 0 by caching None (simulates a compile failure)
    ds._sup_cache[0] = None
    path = tmp_path / "egs.npz"
    n = ds.save_egs(path)
    _, ds2 = _make_dataset()
    ds2.load_egs(path)
    assert ds2._sup_cache[0] is None
    assert len(ds2._sup_cache) == len(ds.chunks)
    assert n == len(ds.chunks) - 1


def test_merge_e2e_records(tmp_path):
    """egs merge regroups flat-start records by appending their cyclic
    per-sequence FSTs (nnet3-chain-merge-egs e2e behavior)."""
    import sys

    sys.path.insert(0, str(tmp_path.parent))
    from tests.test_cegs_train import _kaldi_e2e_prep
    from torchain_tpu.cli.egs import main as egs_main
    from torchain_tpu.data.cegs import iter_cegs_ark

    paths, _den, tree, _g = _kaldi_e2e_prep(
        tmp_path, n_archives=1, records_per=4, B=2
    )
    outp = str(tmp_path / "merged.ark")
    rc = egs_main(["merge", paths[0], outp, "--batch-size", "4"])
    assert rc == 0
    egs = list(iter_cegs_ark(outp))
    assert len(egs) == 2  # 4 records x B=2 -> 2 records of B=4
    for _k, eg in egs:
        sup = eg.outputs[0].supervision
        assert sup.is_e2e and sup.num_sequences == 4
        assert len(sup.e2e_fsts) == 4
