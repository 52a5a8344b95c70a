"""Filterbank / MFCC feature extraction in pure JAX.

Behavioral reference: Kaldi's compute-fbank-feats / compute-mfcc-feats
(kaldi/src/feat/): 25 ms povey-windowed frames every 10 ms, preemphasis
0.97, power spectrum, mel filterbank, log (DCT for MFCC), per-utterance
CMVN.  Re-designed as jit-able batched tensor ops: the mel filterbank and
DCT matrices are built host-side in numpy once, applied as device matmuls,
so feature extraction fuses into the training step when desired.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FbankOptions:
    sample_rate: int = 16000
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    num_mel_bins: int = 40
    num_ceps: int = 13  # MFCC only
    low_freq: float = 20.0
    high_freq: float = 0.0  # 0/negative = nyquist + high_freq
    preemphasis: float = 0.97
    dither: float = 0.0
    window: str = "povey"  # povey | hamming | hanning

    @property
    def frame_length(self) -> int:
        return int(self.sample_rate * self.frame_length_ms / 1000)

    @property
    def frame_shift(self) -> int:
        return int(self.sample_rate * self.frame_shift_ms / 1000)

    @property
    def fft_size(self) -> int:
        n = 1
        while n < self.frame_length:
            n *= 2
        return n


def _mel(freq):
    return 1127.0 * np.log1p(np.asarray(freq) / 700.0)


def mel_filterbank(opts: FbankOptions) -> np.ndarray:
    """[fft_size//2+1, num_mel_bins] triangular mel filterbank (host)."""
    nyquist = opts.sample_rate / 2.0
    high = nyquist + opts.high_freq if opts.high_freq <= 0 else opts.high_freq
    n_bins = opts.fft_size // 2 + 1
    mel_lo, mel_hi = _mel(opts.low_freq), _mel(high)
    centers = np.linspace(mel_lo, mel_hi, opts.num_mel_bins + 2)
    freqs = np.linspace(0, nyquist, n_bins)
    mels = _mel(freqs)
    fb = np.zeros((n_bins, opts.num_mel_bins), dtype=np.float32)
    for m in range(opts.num_mel_bins):
        left, center, right = centers[m], centers[m + 1], centers[m + 2]
        up = (mels - left) / (center - left)
        down = (right - mels) / (right - center)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb


def dct_matrix(opts: FbankOptions) -> np.ndarray:
    """[num_mel_bins, num_ceps] orthonormal DCT-II (host)."""
    n, k = opts.num_mel_bins, opts.num_ceps
    mat = np.zeros((n, k), dtype=np.float32)
    for j in range(k):
        scale = math.sqrt((1.0 if j == 0 else 2.0) / n)
        mat[:, j] = scale * np.cos(math.pi * j * (np.arange(n) + 0.5) / n)
    return mat


def _window(opts: FbankOptions) -> np.ndarray:
    n = opts.frame_length
    a = 2 * math.pi / (n - 1)
    i = np.arange(n)
    if opts.window == "povey":
        return (0.5 - 0.5 * np.cos(a * i)) ** 0.85
    if opts.window == "hamming":
        return 0.54 - 0.46 * np.cos(a * i)
    if opts.window == "hanning":
        return 0.5 - 0.5 * np.cos(a * i)
    raise ValueError(f"unknown window {opts.window}")


def num_frames(num_samples: int, opts: FbankOptions) -> int:
    if num_samples < opts.frame_length:
        return 0
    return 1 + (num_samples - opts.frame_length) // opts.frame_shift


def _frames(wave: jnp.ndarray, opts: FbankOptions) -> jnp.ndarray:
    """wave [..., N] -> frames [..., T, frame_length]."""
    T = num_frames(wave.shape[-1], opts)
    idx = (
        np.arange(T)[:, None] * opts.frame_shift + np.arange(opts.frame_length)
    )  # [T, L] static
    return wave[..., idx]


def fbank(
    wave: jnp.ndarray,  # [..., num_samples], float in [-1, 1] or int16 scale
    opts: FbankOptions = FbankOptions(),
) -> jnp.ndarray:
    """Log-mel filterbank features [..., T, num_mel_bins]."""
    x = _frames(wave.astype(jnp.float32), opts)
    # per-frame DC offset removal, then preemphasis (Kaldi order)
    x = x - jnp.mean(x, axis=-1, keepdims=True)
    if opts.preemphasis > 0:
        prev = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
        x = x - opts.preemphasis * prev
    x = x * jnp.asarray(_window(opts))
    spec = jnp.fft.rfft(x, n=opts.fft_size, axis=-1)
    power = jnp.square(jnp.abs(spec))
    mel = jnp.dot(power, jnp.asarray(mel_filterbank(opts)))
    return jnp.log(jnp.maximum(mel, 1e-10))


def mfcc(wave: jnp.ndarray, opts: FbankOptions = FbankOptions()) -> jnp.ndarray:
    """MFCC features [..., T, num_ceps]."""
    return jnp.dot(fbank(wave, opts), jnp.asarray(dct_matrix(opts)))


def append_ivectors(feats: jnp.ndarray, ivectors: jnp.ndarray) -> jnp.ndarray:
    """Append per-utterance auxiliary vectors (i-vectors / speaker
    embeddings) to every frame: feats [..., T, F] + ivectors [..., D] ->
    [..., T, F+D].  Kaldi chain egs carried ivectors as a separate NnetIo
    input consumed this way (SURVEY.md section 2.2 egs row)."""
    tiled = jnp.broadcast_to(
        ivectors[..., None, :], feats.shape[:-1] + (ivectors.shape[-1],)
    )
    return jnp.concatenate([feats, tiled], axis=-1)


def cmvn(feats: jnp.ndarray, norm_var: bool = True) -> jnp.ndarray:
    """Per-utterance cepstral mean (and variance) normalization over the
    time axis (axis -2), Kaldi apply-cmvn semantics."""
    mean = jnp.mean(feats, axis=-2, keepdims=True)
    out = feats - mean
    if norm_var:
        std = jnp.sqrt(jnp.var(feats, axis=-2, keepdims=True) + 1e-8)
        out = out / std
    return out


def compute_cmvn_stats(utterance_feats) -> tuple[np.ndarray, np.ndarray]:
    """Corpus-level CMVN statistics (Kaldi compute-cmvn-stats role):
    returns (mean [D], std [D]) accumulated over an iterable of [T, D]
    feature matrices."""
    n = 0
    s = None
    ss = None
    for f in utterance_feats:
        f = np.asarray(f, dtype=np.float64)
        if s is None:
            s = f.sum(axis=0)
            ss = (f * f).sum(axis=0)
        else:
            s += f.sum(axis=0)
            ss += (f * f).sum(axis=0)
        n += f.shape[0]
    if n == 0:
        raise ValueError("no frames")
    mean = s / n
    var = np.maximum(ss / n - mean * mean, 1e-8)
    return mean.astype(np.float32), np.sqrt(var).astype(np.float32)


def apply_cmvn_stats(
    feats: jnp.ndarray, mean: np.ndarray, std: np.ndarray, norm_var: bool = True
) -> jnp.ndarray:
    """Apply precomputed corpus/speaker CMVN stats (apply-cmvn with
    external stats)."""
    out = feats - jnp.asarray(mean)
    if norm_var:
        out = out / jnp.asarray(std)
    return out
