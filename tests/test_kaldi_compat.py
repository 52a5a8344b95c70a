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


class TestWavIO:
    """wav.scp front of the pipeline: PCM read/write + feature compute."""

    def test_wav_roundtrip_16bit(self, tmp_path):
        import numpy as np

        from torchain_tpu.data.kaldi_compat import read_wav, write_wav

        rng = np.random.default_rng(0)
        x = rng.integers(-32768, 32767, size=1600).astype(np.float32)
        p = str(tmp_path / "a.wav")
        write_wav(p, x, 16000)
        y, rate = read_wav(p)
        assert rate == 16000
        np.testing.assert_array_equal(x, y)

    def test_wav_channels_and_widths(self, tmp_path):
        import wave

        import numpy as np

        from torchain_tpu.data.kaldi_compat import read_wav

        # stereo 16-bit: channel selection
        left = np.arange(100, dtype="<i2")
        right = -np.arange(100, dtype="<i2")
        inter = np.empty(200, dtype="<i2")
        inter[0::2], inter[1::2] = left, right
        p = str(tmp_path / "st.wav")
        with wave.open(p, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(inter.tobytes())
        y0, _ = read_wav(p, channel=0)
        y1, _ = read_wav(p, channel=1)
        np.testing.assert_array_equal(y0, left.astype(np.float32))
        np.testing.assert_array_equal(y1, right.astype(np.float32))
        # 8-bit unsigned: DC (128) maps to 0
        p8 = str(tmp_path / "u8.wav")
        with wave.open(p8, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)
            w.setframerate(8000)
            w.writeframes(bytes([128, 255, 0]))
        y8, _ = read_wav(p8)
        assert y8[0] == 0.0 and y8[1] > 0 and y8[2] < 0

    def test_wav_scp_feats(self, tmp_path):
        import numpy as np
        import pytest

        from torchain_tpu.data.features import FbankOptions, fbank
        from torchain_tpu.data.kaldi_compat import (
            compute_feats_from_wav_scp,
            read_wav_scp,
            write_wav,
        )

        rng = np.random.default_rng(1)
        opts = FbankOptions(sample_rate=8000, num_mel_bins=10)
        paths = {}
        waves = {}
        for utt in ("u1", "u2"):
            x = np.round(rng.standard_normal(4000) * 1000).astype(np.float32)
            p = str(tmp_path / f"{utt}.wav")
            write_wav(p, x, 8000)
            paths[utt] = p
            waves[utt] = x
        scp = str(tmp_path / "wav.scp")
        open(scp, "w").write("".join(f"{u} {p}\n" for u, p in paths.items()))
        assert read_wav_scp(scp) == paths
        feats = compute_feats_from_wav_scp(scp, opts)
        assert set(feats) == {"u1", "u2"}
        ref = np.asarray(fbank(waves["u1"], opts))
        np.testing.assert_allclose(feats["u1"], ref, rtol=1e-5)
        assert feats["u1"].shape[1] == 10
        # pipe entries are rejected loudly
        open(scp, "a").write("u3 sox x.flac -t wav - |\n")
        with pytest.raises(ValueError, match="command pipe"):
            read_wav_scp(scp)

    def test_wav_scp_skip_pipes(self, tmp_path):
        from torchain_tpu.data.kaldi_compat import read_wav_scp, write_wav

        p = str(tmp_path / "u1.wav")
        write_wav(p, np.zeros(100, np.float32), 8000)
        scp = str(tmp_path / "wav.scp")
        open(scp, "w").write(f"u1 {p}\nu2 sph2pipe -f wav x.sph |\n")
        with pytest.raises(ValueError, match="command pipe"):
            read_wav_scp(scp)
        assert read_wav_scp(scp, skip_pipes=True) == {"u1": p}

    def test_write_wav_rounds_not_truncates(self, tmp_path):
        from torchain_tpu.data.kaldi_compat import read_wav, write_wav

        p = str(tmp_path / "r.wav")
        write_wav(p, np.array([0.6, -0.6, 99.5, -99.5], np.float32), 8000)
        x, _ = read_wav(p)
        np.testing.assert_array_equal(x, [1.0, -1.0, 100.0, -100.0])

    def test_unknown_feat_type_raises(self, tmp_path):
        from torchain_tpu.data.kaldi_compat import (
            compute_feats_from_wav_scp,
            write_wav,
        )

        p = str(tmp_path / "u1.wav")
        write_wav(p, np.zeros(4000, np.float32), 16000)
        scp = str(tmp_path / "wav.scp")
        open(scp, "w").write(f"u1 {p}\n")
        with pytest.raises(ValueError, match="feat_type"):
            compute_feats_from_wav_scp(scp, feat_type="plp")


class TestSpeakerStructure:
    def test_utt2spk_roundtrip_and_invert(self, tmp_path):
        from torchain_tpu.data.kaldi_compat import (
            read_utt2spk,
            spk2utt_from_utt2spk,
            write_utt2spk,
        )

        u2s = {"u2": "spkB", "u1": "spkA", "u3": "spkA"}
        p = str(tmp_path / "utt2spk")
        write_utt2spk(p, u2s)
        assert read_utt2spk(p) == u2s
        assert spk2utt_from_utt2spk(u2s) == {"spkA": ["u1", "u3"], "spkB": ["u2"]}

    def test_segments_parse_and_validate(self, tmp_path):
        from torchain_tpu.data.kaldi_compat import read_segments

        p = tmp_path / "segments"
        p.write_text("u1 rec1 0.0 1.5\nu2 rec1 1.5 3.0\nu3 rec2 0.25 0.75\n")
        segs = read_segments(str(p))
        assert segs["u2"] == ("rec1", 1.5, 3.0)
        p.write_text("u1 rec1 2.0 1.0\n")
        with pytest.raises(ValueError, match="segment times"):
            read_segments(str(p))

    def test_cmvn_stats_kaldi_layout_and_apply(self):
        from torchain_tpu.data.kaldi_compat import (
            apply_cmvn_stats_matrix,
            cmvn_stats_from_feats,
        )

        rng = np.random.default_rng(2)
        mats = [rng.normal(2.0, 3.0, size=(t, 4)) for t in (7, 11)]
        stats = cmvn_stats_from_feats(mats)
        # Kaldi [2, D+1] double layout: [sum|count] / [sumsq|0]
        assert stats.shape == (2, 5) and stats.dtype == np.float64
        cat = np.concatenate(mats)
        assert stats[0, -1] == 18
        np.testing.assert_allclose(stats[0, :-1], cat.sum(0))
        np.testing.assert_allclose(stats[1, :-1], (cat**2).sum(0))
        assert stats[1, -1] == 0
        out = apply_cmvn_stats_matrix(cat, stats, norm_var=True)
        np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-5)
        np.testing.assert_allclose(out.std(0), 1.0, atol=1e-4)
        # default matches apply-cmvn --norm-vars=false: mean only
        out = apply_cmvn_stats_matrix(cat, stats)
        np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-5)
        assert abs(out.std(0) - 1.0).max() > 0.1

    def test_per_speaker_stats_roundtrip_binary_ark(self, tmp_path):
        from torchain_tpu.data.kaldi_compat import (
            apply_cmvn_by_speaker,
            compute_cmvn_stats_per_spk,
        )
        from torchain_tpu.io import read_scp, write_ark_binary

        rng = np.random.default_rng(3)
        feats = {u: rng.normal(size=(10 + i, 5)).astype(np.float32) for i, u in enumerate("abcd")}
        u2s = {"a": "s1", "b": "s1", "c": "s2", "d": "s2"}
        stats = compute_cmvn_stats_per_spk(feats, u2s)
        assert set(stats) == {"s1", "s2"}
        # compute-cmvn-stats writes DM double matrices; round-trip ark,scp
        ark = str(tmp_path / "cmvn.ark")
        write_ark_binary(ark, stats, scp_path=str(tmp_path / "cmvn.scp"))
        loaded = read_scp(str(tmp_path / "cmvn.scp"))
        assert loaded["s1"].dtype == np.float64
        np.testing.assert_array_equal(loaded["s1"], stats["s1"])
        normed = apply_cmvn_by_speaker(feats, u2s, loaded)
        spk_mean = np.concatenate([feats["a"], feats["b"]]).mean(0)
        np.testing.assert_allclose(
            normed["a"], feats["a"] - spk_mean.astype(np.float32), atol=1e-5
        )
        with pytest.raises(ValueError, match="missing from utt2spk"):
            apply_cmvn_by_speaker(feats, {"a": "s1"}, loaded)

    def test_load_kaldi_dir_speaker_cmvn(self, tmp_path):
        from torchain_tpu.data.kaldi_compat import (
            compute_cmvn_stats_per_spk,
            write_utt2spk,
        )
        from torchain_tpu.io import write_ark_binary

        rng = np.random.default_rng(4)
        alis = {"u1": [(1, 10), (2, 5)], "u2": [(2, 8), (1, 8)]}
        feats = {}
        with MatrixWriter(str(tmp_path / "feats.ark")) as w:
            for utt, ali in alis.items():
                T = sum(d for _, d in ali)
                feats[utt] = (rng.normal(size=(T, 6)) * 3 + 5).astype(np.float32)
                w[utt] = feats[utt]
        # text ark storage rounds to %.7g; compare against the re-read copy
        from torchain_tpu.io import read_ark

        feats = read_ark(str(tmp_path / "feats.ark"))
        (tmp_path / "ali.txt").write_text(
            "u1 1:10 2:5\nu2 2:8 1:8\n"
        )
        u2s = {"u1": "spk", "u2": "spk"}
        write_utt2spk(str(tmp_path / "utt2spk"), u2s)
        stats = compute_cmvn_stats_per_spk(feats, u2s)
        write_ark_binary(
            str(tmp_path / "cmvn.ark"), stats, scp_path=str(tmp_path / "cmvn.scp")
        )
        utts = load_kaldi_dir(str(tmp_path), cmvn="speaker")
        mean = np.concatenate(list(feats.values())).mean(0)
        np.testing.assert_allclose(
            utts[0].feats, feats["u1"] - mean.astype(np.float32), atol=2e-4
        )
        # without cmvn.scp/cmvn.ark: stats accumulate from feats + utt2spk
        (tmp_path / "cmvn.scp").unlink()
        (tmp_path / "cmvn.ark").unlink()
        utts2 = load_kaldi_dir(str(tmp_path), cmvn="speaker")
        np.testing.assert_allclose(utts2[0].feats, utts[0].feats, atol=2e-4)
        # per-utterance mode and the error path
        utts3 = load_kaldi_dir(str(tmp_path), cmvn="utterance", norm_var=True)
        np.testing.assert_allclose(utts3[0].feats.mean(0), 0.0, atol=1e-4)
        np.testing.assert_allclose(utts3[0].feats.std(0), 1.0, atol=1e-3)
        with pytest.raises(ValueError, match="cmvn mode"):
            load_kaldi_dir(str(tmp_path), cmvn="global")

    def test_wav_scp_with_segments(self, tmp_path):
        from torchain_tpu.data.features import FbankOptions, fbank
        from torchain_tpu.data.kaldi_compat import (
            compute_feats_from_wav_scp,
            write_wav,
        )

        rng = np.random.default_rng(5)
        opts = FbankOptions(sample_rate=8000, num_mel_bins=8)
        x = np.round(rng.standard_normal(16000) * 1000).astype(np.float32)
        p = str(tmp_path / "rec1.wav")
        write_wav(p, x, 8000)
        scp = str(tmp_path / "wav.scp")
        open(scp, "w").write(f"rec1 {p}\n")
        segp = tmp_path / "segments"
        segp.write_text("u1 rec1 0.0 1.0\nu2 rec1 1.0 2.0\n")
        feats = compute_feats_from_wav_scp(scp, opts, segments_path=str(segp))
        assert set(feats) == {"u1", "u2"}
        # write_wav rounds+clips; slice the SAME stored samples for the ref
        from torchain_tpu.data.kaldi_compat import read_wav

        stored, _ = read_wav(p)
        np.testing.assert_allclose(
            feats["u2"], np.asarray(fbank(stored[8000:16000], opts)), rtol=1e-5
        )
        segp.write_text("u1 recX 0.0 1.0\n")
        with pytest.raises(ValueError, match="not in wav.scp"):
            compute_feats_from_wav_scp(scp, opts, segments_path=str(segp))
        segp.write_text("u1 rec1 5.0 6.0\n")
        with pytest.raises(ValueError, match="beyond recording"):
            compute_feats_from_wav_scp(scp, opts, segments_path=str(segp))
        # end past the recording must raise too, not silently truncate
        segp.write_text("u1 rec1 0.0 60.0\n")
        with pytest.raises(ValueError, match="ends at"):
            compute_feats_from_wav_scp(scp, opts, segments_path=str(segp))
