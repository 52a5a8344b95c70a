"""Kaldi-format corpus adapter round trips + ivector append helper."""

import numpy as np
import pytest

import jax.numpy as jnp

from torchain_tpu.data.features import append_ivectors
from torchain_tpu.data.kaldi_compat import (
    load_kaldi_dir,
    parse_colon_line,
    parse_write_lengths_line,
    read_alignments,
    read_phone_table,
    read_transcripts,
)
from torchain_tpu.io import MatrixWriter


class TestParsers:
    def test_write_lengths_format(self):
        utt, ali = parse_write_lengths_line("utt1 5 ,12 ; 28 ,5 ; 1 ,31")
        assert utt == "utt1"
        assert ali == [(5, 12), (28, 5), (1, 31)]

    def test_colon_format(self):
        utt, ali = parse_colon_line("utt2 3:4 1:2")
        assert utt == "utt2"
        assert ali == [(3, 4), (1, 2)]

    def test_read_alignments_autodetect(self, tmp_path):
        p = tmp_path / "ali.txt"
        p.write_text("a 1 ,3 ; 2 ,4\n")
        assert read_alignments(str(p)) == {"a": [(1, 3), (2, 4)]}
        p.write_text("a 1:3 2:4\n")
        assert read_alignments(str(p)) == {"a": [(1, 3), (2, 4)]}

    def test_bad_alignment_raises(self, tmp_path):
        p = tmp_path / "ali.txt"
        p.write_text("a 0:3\n")
        with pytest.raises(ValueError):
            read_alignments(str(p))

    def test_phone_table_and_text(self, tmp_path):
        (tmp_path / "phones.txt").write_text("<eps> 0\na 1\nb 2\n")
        t = read_phone_table(str(tmp_path / "phones.txt"))
        assert t == {"<eps>": 0, "a": 1, "b": 2}
        (tmp_path / "text").write_text("u1 1 2 1\n")
        assert read_transcripts(str(tmp_path / "text")) == {"u1": [1, 2, 1]}


class TestLoadDir:
    def test_round_trip_through_data_dir(self, tmp_path):
        rng = np.random.default_rng(0)
        alis = {"u1": [(1, 10), (2, 5)], "u2": [(2, 8), (1, 8)]}
        with MatrixWriter(str(tmp_path / "feats.ark")) as w:
            for utt, ali in alis.items():
                T = sum(d for _, d in ali)
                w[utt] = rng.normal(size=(T, 6)).astype(np.float32)
        with open(tmp_path / "ali.txt", "w") as f:
            for utt, ali in alis.items():
                f.write(utt + " " + " ".join(f"{p}:{d}" for p, d in ali) + "\n")
        utts = load_kaldi_dir(str(tmp_path))
        assert [u.utt_id for u in utts] == ["u1", "u2"]
        assert utts[0].feats.shape == (15, 6)
        assert utts[0].alignment == [(1, 10), (2, 5)]

    def test_length_mismatch_clipped_or_skipped(self, tmp_path):
        rng = np.random.default_rng(1)
        with MatrixWriter(str(tmp_path / "feats.ark")) as w:
            w["u1"] = rng.normal(size=(14, 4)).astype(np.float32)  # ali says 15
            w["u2"] = rng.normal(size=(30, 4)).astype(np.float32)  # way off
        (tmp_path / "ali.txt").write_text("u1 1:10 2:5\nu2 1:10 2:5\n")
        utts = load_kaldi_dir(str(tmp_path))
        assert len(utts) == 1  # u2 skipped (off by >2)
        assert utts[0].feats.shape[0] == 14
        assert sum(d for _, d in utts[0].alignment) == 14


def test_append_ivectors():
    feats = jnp.zeros((2, 5, 3))
    ivecs = jnp.asarray(np.arange(8, dtype=np.float32).reshape(2, 4))
    out = append_ivectors(feats, ivecs)
    assert out.shape == (2, 5, 7)
    np.testing.assert_allclose(np.asarray(out[1, 3, 3:]), [4, 5, 6, 7])


class TestSymbolTables:
    """OpenFst symbol tables (phones.txt / words.txt) + symbolic `text`."""

    def test_roundtrip_and_text_mapping(self, tmp_path):
        from torchain_tpu.data.kaldi_compat import (
            read_symbol_table,
            read_text_transcripts,
            write_symbol_table,
        )

        tab = {"<eps>": 0, "hello": 1, "world": 2, "<unk>": 3}
        p = str(tmp_path / "words.txt")
        write_symbol_table(p, tab)
        assert read_symbol_table(p) == tab
        t = str(tmp_path / "text")
        open(t, "w").write("u1 hello world\nu2 world hello hello\n")
        got = read_text_transcripts(t, tab)
        assert got == {"u1": [1, 2], "u2": [2, 1, 1]}

    def test_unknown_token_strict_and_unk(self, tmp_path):
        import pytest

        from torchain_tpu.data.kaldi_compat import read_text_transcripts

        t = str(tmp_path / "text")
        open(t, "w").write("u1 hello mars\n")
        tab = {"hello": 1, "<unk>": 9}
        with pytest.raises(ValueError):
            read_text_transcripts(t, tab)
        got = read_text_transcripts(t, tab, strict=False)
        assert got == {"u1": [1, 9]}
