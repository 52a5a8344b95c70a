"""Binary Kaldi archive IO (kaldi/src/matrix kaldi-matrix.cc Write +
compressed-matrix.cc format 1): round trips, hand-built byte-layout
fixtures, checked-in golden files, and the kaldi_compat auto-detect path."""

import os
import struct

import numpy as np
import pytest

from torchain_tpu.io import (
    read_ark,
    read_ark_binary,
    read_ark_text,
    write_ark_binary,
)

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def _mats(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "a": (rng.normal(size=(9, 4)) * 2).astype(np.float32),
        "b_long_id-1": rng.normal(size=(1, 6)).astype(np.float32),
    }


def test_fm_round_trip(tmp_path):
    mats = _mats()
    p = str(tmp_path / "x.ark")
    write_ark_binary(p, mats)
    back = read_ark_binary(p)
    assert set(back) == set(mats)
    for k in mats:
        np.testing.assert_array_equal(back[k], mats[k])


def test_cm_round_trip_within_quantization(tmp_path):
    mats = _mats(1)
    p = str(tmp_path / "x.ark")
    write_ark_binary(p, mats, compress=True)
    back = read_ark_binary(p)
    for k in mats:
        rng = mats[k].max() - mats[k].min() + 1e-8
        assert np.abs(back[k] - mats[k]).max() <= 0.01 * rng


def test_fm_exact_byte_layout(tmp_path):
    """The documented record layout, constructed by hand."""
    buf = b"u1 \x00BFM " + b"\x04" + struct.pack("<i", 2) + b"\x04" + struct.pack("<i", 3)
    data = np.arange(6, dtype="<f4").reshape(2, 3)
    buf += data.tobytes()
    p = str(tmp_path / "hand.ark")
    open(p, "wb").write(buf)
    out = read_ark_binary(p)
    np.testing.assert_array_equal(out["u1"], data)


def test_dm_and_vectors(tmp_path):
    buf = b"m \x00BDM " + b"\x04" + struct.pack("<i", 1) + b"\x04" + struct.pack("<i", 2)
    buf += np.array([[1.5, -2.5]], dtype="<f8").tobytes()
    buf += b"v \x00BFV " + b"\x04" + struct.pack("<i", 3)
    buf += np.array([1, 2, 3], dtype="<f4").tobytes()
    p = str(tmp_path / "h.ark")
    open(p, "wb").write(buf)
    out = read_ark_binary(p)
    np.testing.assert_array_equal(out["m"], [[1.5, -2.5]])
    np.testing.assert_array_equal(out["v"], [1, 2, 3])


def test_golden_fixtures_decode_exactly():
    """Checked-in golden bytes guard against format drift."""
    expected = dict(np.load(os.path.join(FIX, "golden_expected.npz")))
    fm = read_ark_binary(os.path.join(FIX, "golden_fm.ark"))
    for k, v in expected.items():
        np.testing.assert_array_equal(fm[k], v)
    cm = read_ark_binary(os.path.join(FIX, "golden_cm.ark"))
    for k, v in expected.items():
        rng = v.max() - v.min() + 1e-8
        assert np.abs(cm[k] - v).max() <= 0.01 * rng


def test_read_ark_autodetect(tmp_path):
    from torchain_tpu.io import MatrixWriter

    mats = _mats(2)
    pb = str(tmp_path / "b.ark")
    pt = str(tmp_path / "t.ark")
    write_ark_binary(pb, mats)
    with MatrixWriter(pt) as w:
        for k, v in mats.items():
            w[k] = v
    bin_out = read_ark(pb)
    txt_out = read_ark(pt)
    for k in mats:
        np.testing.assert_array_equal(bin_out[k], mats[k])
        np.testing.assert_allclose(txt_out[k], mats[k], rtol=1e-5)


def test_kaldi_dir_with_binary_feats(tmp_path):
    from torchain_tpu.data.kaldi_compat import load_kaldi_dir

    rng = np.random.default_rng(3)
    feats = {"u1": rng.normal(size=(12, 5)).astype(np.float32)}
    write_ark_binary(str(tmp_path / "feats.ark"), feats, compress=True)
    (tmp_path / "ali.txt").write_text("u1 1:5 2:7\n")
    utts = load_kaldi_dir(str(tmp_path))
    assert len(utts) == 1
    assert utts[0].feats.shape == (12, 5)
    assert utts[0].alignment == [(1, 5), (2, 7)]


def test_malformed_binary_ark_raises(tmp_path):
    p = str(tmp_path / "bad.ark")
    open(p, "wb").write(b"u1 XY")
    with pytest.raises(ValueError):
        read_ark_binary(p)


class TestScp:
    """scp offset index: the ark,scp dual-output + random-access reader
    (RandomAccessBaseFloatMatrixReader / rspecifier roles)."""

    def _mats(self):
        rng = np.random.default_rng(3)
        return {
            f"utt{i}": rng.normal(size=(5 + i, 4)).astype(np.float32)
            for i in range(4)
        }

    def test_ark_scp_dual_output_roundtrip(self, tmp_path):
        from torchain_tpu.io import ScpReader

        ark = str(tmp_path / "feats.ark")
        scp = str(tmp_path / "feats.scp")
        mats = self._mats()
        write_ark_binary(ark, mats, scp_path=scp)
        r = ScpReader(scp)
        assert set(r.keys()) == set(mats)
        # random access, out of order
        for utt in reversed(list(mats)):
            np.testing.assert_array_equal(r[utt], mats[utt])

    def test_scp_matches_sequential_ark(self, tmp_path):
        from torchain_tpu.io import read_scp

        ark = str(tmp_path / "f.ark")
        scp = str(tmp_path / "f.scp")
        mats = self._mats()
        write_ark_binary(ark, mats, compress=True, scp_path=scp)
        seq = read_ark_binary(ark)
        rand = read_scp(scp)
        for utt in mats:
            np.testing.assert_array_equal(seq[utt], rand[utt])

    def test_rspecifier_dispatch(self, tmp_path):
        from torchain_tpu.io import MatrixWriter, read_rspecifier

        mats = self._mats()
        ark = str(tmp_path / "g.ark")
        scp = str(tmp_path / "g.scp")
        write_ark_binary(ark, mats, scp_path=scp)
        txt = str(tmp_path / "g_t.ark")
        with MatrixWriter(txt) as w:
            for u, m in mats.items():
                w[u] = m
        for rspec in (f"ark:{ark}", f"scp:{scp}", f"ark,t:{txt}", ark):
            got = read_rspecifier(rspec)
            assert set(got) == set(mats)
            np.testing.assert_allclose(got["utt0"], mats["utt0"], atol=1e-5)

    def test_kaldi_dir_with_scp(self, tmp_path):
        from torchain_tpu.data.kaldi_compat import load_kaldi_dir

        rng = np.random.default_rng(5)
        feats = {"u1": rng.normal(size=(9, 4)).astype(np.float32)}
        write_ark_binary(
            str(tmp_path / "feats.ark"),
            feats,
            scp_path=str(tmp_path / "feats.scp"),
        )
        (tmp_path / "ali.txt").write_text("u1 1:3 2:2 3:4\n")
        utts = load_kaldi_dir(str(tmp_path), feats_file="feats.scp")
        assert len(utts) == 1 and utts[0].feats.shape == (9, 4)
        assert utts[0].alignment == [(1, 3), (2, 2), (3, 4)]
