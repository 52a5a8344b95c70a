"""Speed perturbation: windowed-sinc resampler + alignment scaling +
3-way corpus tripling (Kaldi perturb_data_dir_speed_3way.sh role)."""

import numpy as np
import pytest

from torchain_tpu.data.augment import (
    SP_FACTORS_3WAY,
    perturb_alignment,
    resample_waveform,
    speed_perturb_key_map,
    speed_perturb_wavs,
)


class TestResampler:
    def test_identity_at_speed_1(self):
        x = np.random.default_rng(0).normal(size=777).astype(np.float32)
        np.testing.assert_array_equal(resample_waveform(x, 1.0), x)

    @pytest.mark.parametrize("speed", [0.9, 1.1])
    def test_length_scales_inversely(self, speed):
        x = np.zeros(9000, np.float32)
        y = resample_waveform(x, speed)
        assert y.shape[0] == int(9000 / speed) or y.shape[0] == 9000 * 10 // int(speed * 10)

    @pytest.mark.parametrize("speed", [0.9, 1.1, 1.25])
    def test_exact_reconstruction_of_bandlimited_tone(self, speed):
        """A band-limited tone must resample to the ANALYTIC shifted tone
        sample-for-sample, not just hit the right FFT peak (the round-3
        review found a filter-bank phase bug that peak checks missed:
        12% RMS error at speed 0.9)."""
        rate = 8000
        n = np.arange(2 * rate)
        x = np.sin(2 * np.pi * 440.0 * n / rate).astype(np.float32)
        y = resample_waveform(x, speed)
        m = np.arange(y.shape[0])
        ref = np.sin(2 * np.pi * 440.0 * (m * speed) / rate)
        body = slice(400, -400)
        err = np.sqrt(np.mean((y[body] - ref[body]) ** 2))
        assert err < 2e-3, f"RMS reconstruction error {err}"

    @pytest.mark.parametrize("speed", [0.9, 1.1])
    def test_tone_frequency_shifts(self, speed):
        """sox `speed f` raises pitch by f: a 440 Hz tone lands at 440*f."""
        rate = 8000
        t = np.arange(rate) / rate  # 1 second
        x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
        y = resample_waveform(x, speed)
        # dominant FFT bin of the interior (edges carry filter transients)
        yi = y[400:-400]
        spec = np.abs(np.fft.rfft(yi * np.hanning(yi.shape[0])))
        peak_hz = np.argmax(spec) * rate / yi.shape[0]
        assert peak_hz == pytest.approx(440.0 * speed, rel=0.01)
        # amplitude preserved (windowed sinc is ~unity gain in band)
        assert np.abs(yi).max() == pytest.approx(1.0, abs=0.05)

    def test_antialiasing_when_speeding_up(self):
        """Content above the post-speedup Nyquist must be attenuated, not
        folded: a 3.8 kHz tone at 8 kHz sped up 1.1x aliases to ~3.6 kHz
        without the low-pass."""
        rate = 8000
        t = np.arange(2 * rate) / rate
        x = np.sin(2 * np.pi * 3800.0 * t).astype(np.float32)
        y = resample_waveform(x, 1.1)[500:-500]
        rms_out = np.sqrt(np.mean(y**2))
        assert rms_out < 0.15  # vs 0.707 for a surviving tone

    def test_rejects_bad_input(self):
        with pytest.raises(ValueError, match="positive"):
            resample_waveform(np.zeros(10, np.float32), -1.0)
        with pytest.raises(ValueError, match="mono"):
            resample_waveform(np.zeros((10, 2), np.float32), 0.9)


class TestAlignmentPerturb:
    @pytest.mark.parametrize("speed", [0.9, 1.0, 1.1])
    def test_total_and_sequence_preserved(self, speed):
        ali = [(3, 12), (1, 6), (2, 21), (3, 3)]
        total = sum(d for _, d in ali)
        nf = int(total / speed)
        out = perturb_alignment(ali, speed, nf)
        assert sum(d for _, d in out) == nf
        assert [p for p, _ in out] == [p for p, _ in ali]
        assert all(d >= 1 for _, d in out)

    def test_boundaries_scale_proportionally(self):
        ali = [(1, 100), (2, 100)]
        out = perturb_alignment(ali, 2.0, 100)
        assert out == [(1, 50), (2, 50)]

    def test_tiny_spans_survive(self):
        ali = [(1, 1), (2, 1), (3, 30)]
        out = perturb_alignment(ali, 1.1, 29)
        assert [p for p, _ in out] == [1, 2, 3]
        assert sum(d for _, d in out) == 29

    def test_impossible_fit_raises(self):
        with pytest.raises(ValueError, match="cannot fit"):
            perturb_alignment([(1, 5), (2, 5), (3, 5)], 5.0, 2)


class TestCorpusTripling:
    def test_key_naming_and_factors(self):
        wavs = {"a": np.ones(1000, np.float32), "b": np.ones(2000, np.float32)}
        out = speed_perturb_wavs(wavs)
        assert set(out) == {"a", "b", "sp0.9-a", "sp0.9-b", "sp1.1-a", "sp1.1-b"}
        np.testing.assert_array_equal(out["a"], wavs["a"])  # 1.0 copy untouched
        assert out["sp1.1-a"].shape[0] < 1000 < out["sp0.9-a"].shape[0]
        km = speed_perturb_key_map(["a"], SP_FACTORS_3WAY)
        assert km == {"sp0.9-a": ("a", 0.9), "a": ("a", 1.0), "sp1.1-a": ("a", 1.1)}
