"""Kaldi-format corpus adapter: build Utterances from standard data dirs.

The reference consumed Kaldi egs archives; real deployments of this
framework instead read the PORTABLE pieces of a Kaldi data directory and
do the egs work in-process (data/loader.py):

  * features:     text ark (`feats.ark` written with ark,t: — see
                  torchain_tpu.io.read_ark_text), BINARY ark (FM/DM/
                  FV/DV/CM records — io.read_ark_binary) or .npy/.npz
  * alignments:   Kaldi `ali-to-phones --write-lengths=true` text output:
                  `utt_id phone1 ,dur1 ; phone2 ,dur2 ; ...`
                  (also accepts the simpler `utt phone:dur phone:dur ...`)
  * transcripts:  `text`-style `utt_id phone1 phone2 ...` (integer phones)
                  for the e2e/flat-start path
  * phone table:  `phones.txt` symbol table (symbol -> int)

No Kaldi binaries or compiled IO are required; everything is line-based
text that Kaldi tools can import/export losslessly.
"""

from __future__ import annotations

import pathlib

import numpy as np

from torchain_tpu.data.loader import Utterance
from torchain_tpu.io import read_ark


def read_phone_table(path: str) -> dict[str, int]:
    """phones.txt / words.txt: `symbol id` per line (OpenFst SymbolTable
    text format, as every Kaldi data/lang dir ships)."""
    table: dict[str, int] = {}
    for line in open(path):
        parts = line.split()
        if len(parts) >= 2:
            table[parts[0]] = int(parts[1])
    return table


#: words.txt has the identical format
read_symbol_table = read_phone_table


def write_symbol_table(path: str, table: dict[str, int]) -> None:
    """Write an OpenFst-format symbol table (id-sorted)."""
    with open(path, "w") as f:
        for sym, idx in sorted(table.items(), key=lambda kv: kv[1]):
            f.write(f"{sym} {idx}\n")


def read_text_transcripts(
    path: str, symtab: dict[str, int], strict: bool = True
) -> dict[str, list[int]]:
    """Kaldi `text` file with SYMBOLIC tokens (words or phones), mapped
    through a symbol table.  Unknown tokens raise (strict) or map to
    <unk>/<UNK> when the table defines one."""
    unk = symtab.get("<unk>", symtab.get("<UNK>"))
    out: dict[str, list[int]] = {}
    for line in open(path):
        parts = line.split()
        if len(parts) < 2:
            continue
        ids = []
        for tok in parts[1:]:
            if tok in symtab:
                ids.append(symtab[tok])
            elif unk is not None and not strict:
                ids.append(unk)
            else:
                raise ValueError(
                    f"token {tok!r} (utt {parts[0]}) not in symbol table"
                    + ("" if unk is None else "; pass strict=False for <unk>")
                )
        out[parts[0]] = ids
    return out


def parse_write_lengths_line(line: str) -> tuple[str, list[tuple[int, int]]]:
    """One line of `ali-to-phones --write-lengths=true` output:
    `utt 5 ,12 ; 28 ,5 ; 1 ,31`"""
    head, _, rest = line.strip().partition(" ")
    ali: list[tuple[int, int]] = []
    for seg in rest.split(";"):
        seg = seg.strip()
        if not seg:
            continue
        phone_s, _, dur_s = seg.partition(",")
        ali.append((int(phone_s.strip()), int(dur_s.strip())))
    return head, ali


def parse_colon_line(line: str) -> tuple[str, list[tuple[int, int]]]:
    """`utt phone:dur phone:dur ...`"""
    parts = line.split()
    ali = []
    for tok in parts[1:]:
        p, _, d = tok.partition(":")
        ali.append((int(p), int(d)))
    return parts[0], ali


def read_alignments(path: str) -> dict[str, list[tuple[int, int]]]:
    """Auto-detects the two text alignment formats above."""
    out: dict[str, list[tuple[int, int]]] = {}
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        try:
            if "," in line:
                utt, ali = parse_write_lengths_line(line)
            else:
                utt, ali = parse_colon_line(line)
        except ValueError as e:
            raise ValueError(f"bad alignment line {line!r}: {e}") from e
        if not ali or any(p < 1 or d < 1 for p, d in ali):
            raise ValueError(f"invalid alignment for {utt}: {ali}")
        out[utt] = ali
    return out


def read_transcripts(path: str) -> dict[str, list[int]]:
    """`text` file with integer phone ids."""
    out: dict[str, list[int]] = {}
    for line in open(path):
        parts = line.split()
        if len(parts) >= 2:
            out[parts[0]] = [int(p) for p in parts[1:]]
    return out


def load_kaldi_dir(
    data_dir: str,
    feats_file: str = "feats.ark",
    ali_file: str = "ali.txt",
    strict: bool = False,
) -> list[Utterance]:
    """Assemble Utterances from a directory holding `feats.ark` (text) and
    `ali.txt`.  Utterances missing either side are skipped (or raise when
    strict=True).  Feature length is cross-checked against the alignment."""
    root = pathlib.Path(data_dir)
    if feats_file.endswith(".scp"):
        from torchain_tpu.io import read_scp

        feats = read_scp(str(root / feats_file))
    else:
        feats = read_ark(str(root / feats_file))
    alis = read_alignments(str(root / ali_file))
    utts: list[Utterance] = []
    skipped = []
    for utt_id in sorted(feats):
        if utt_id not in alis:
            skipped.append(utt_id)
            continue
        f = feats[utt_id]
        ali = alis[utt_id]
        ali_len = sum(d for _, d in ali)
        if abs(ali_len - f.shape[0]) > 2:  # Kaldi-style off-by-a-couple slack
            skipped.append(utt_id)
            continue
        if ali_len != f.shape[0]:  # clip to the shorter
            t = min(ali_len, f.shape[0])
            f = f[:t]
            clipped, left = [], t
            for p, d in ali:
                d = min(d, left)
                if d <= 0:
                    break
                clipped.append((p, d))
                left -= d
            ali = clipped
        utts.append(Utterance(feats=f.astype(np.float32), alignment=ali, utt_id=utt_id))
    if skipped and strict:
        raise ValueError(f"missing/mismatched utterances: {skipped[:10]}...")
    return utts


# ---------------------------------------------------------------------------
# raw audio: wav files and wav.scp (the front of a Kaldi data dir)
# ---------------------------------------------------------------------------
#
# A real Kaldi data dir starts from `wav.scp`; features are DERIVED
# (compute-fbank-feats / compute-mfcc-feats, [K] src/featbin/).  With a
# PCM reader + the in-repo fbank/mfcc (data/features.py) the whole
# audio -> features -> egs -> training chain runs without Kaldi binaries.


def read_wav(path: str, channel: int = 0) -> tuple[np.ndarray, int]:
    """Read a PCM wav file with the stdlib `wave` module.

    Returns (samples float32 at int16 scale: values in [-32768, 32767]
    regardless of source bit depth — this repo's normalization choice
    (Kaldi's wave reader keeps raw integer magnitudes for non-16-bit PCM,
    so exact-value feature parity with Kaldi holds for 16-bit sources;
    other depths differ by a constant log offset that CMVN removes) —
    and sample_rate.  Supports 8/16/24/32-bit PCM; multi-channel files
    yield the requested channel (compute-*-feats --channel semantics)."""
    import wave

    with wave.open(path, "rb") as w:
        nch, width, rate, nframes = (
            w.getnchannels(),
            w.getsampwidth(),
            w.getframerate(),
            w.getnframes(),
        )
        raw = w.readframes(nframes)
    if width == 1:  # unsigned 8-bit -> centre, scale to int16 range
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
        x = (x - 128.0) * 256.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32)
    elif width == 3:  # packed 24-bit little-endian
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        x = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float32) / 256.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 65536.0
    else:
        raise ValueError(f"unsupported PCM sample width {width} in {path}")
    if nch > 1:
        if not 0 <= channel < nch:
            raise ValueError(f"channel {channel} out of range for {nch}-channel {path}")
        x = x[channel::nch]
    return np.ascontiguousarray(x), rate


def write_wav(path: str, samples: np.ndarray, sample_rate: int) -> None:
    """Write mono 16-bit PCM (samples at int16 scale, clipped)."""
    import wave

    x = np.clip(np.asarray(samples, np.float32), -32768.0, 32767.0)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(np.rint(x).astype("<i2").tobytes())


def read_wav_scp(path: str, skip_pipes: bool = False) -> dict[str, str]:
    """Parse `wav.scp` lines `utt_id /path/to/file.wav`.

    Command-pipe entries (`utt sox ... |`) need a shell and external
    tools; by default they are rejected with a clear error rather than
    silently mis-read — pre-extract such sources to plain wav files
    first.  Real corpora often mix plain-wav and piped entries
    (sph2pipe/sox lines); pass skip_pipes=True to consume the plain-wav
    subset and drop the piped entries instead of failing the whole file."""
    out: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split(None, 1)
            if not parts:
                continue
            if len(parts) != 2:
                raise ValueError(f"malformed wav.scp line: {line!r}")
            utt, target = parts
            if target.endswith("|"):
                if skip_pipes:
                    continue
                raise ValueError(
                    f"wav.scp entry for {utt!r} is a command pipe ({target!r});"
                    " pre-extract it to a plain wav file, or pass"
                    " skip_pipes=True to consume only the plain-wav entries"
                )
            out[utt] = target
    return out


def compute_feats_from_wav_scp(
    scp_path: str,
    opts=None,
    feat_type: str = "fbank",
    channel: int = 0,
) -> dict[str, np.ndarray]:
    """compute-fbank-feats / compute-mfcc-feats role: wav.scp -> per-utt
    feature matrices using the in-repo feature frontend (data/features.py,
    Povey window + mel bank + optional DCT).  Sample rates must match
    `opts.sample_rate` (Kaldi errors here too rather than resampling)."""
    from torchain_tpu.data.features import FbankOptions, fbank, mfcc

    if opts is None:
        opts = FbankOptions()
    if feat_type not in ("fbank", "mfcc"):
        raise ValueError(
            f"unsupported feat_type {feat_type!r}: expected 'fbank' or 'mfcc'"
        )
    fn = {"fbank": fbank, "mfcc": mfcc}[feat_type]
    feats: dict[str, np.ndarray] = {}
    for utt, path in read_wav_scp(scp_path).items():
        samples, rate = read_wav(path, channel=channel)
        if rate != opts.sample_rate:
            raise ValueError(
                f"{utt}: wav sample rate {rate} != FbankOptions.sample_rate"
                f" {opts.sample_rate}"
            )
        feats[utt] = np.asarray(fn(samples, opts), dtype=np.float32)
    return feats


# Kaldi `tree` files (ContextDependency text format) parse into TiedTree —
# the pdf-map import route for matching an existing Kaldi system's pdf
# inventory (kaldi/src/tree/; see graphs/tied_tree.py for the format).
from torchain_tpu.graphs.tied_tree import read_kaldi_tree, write_kaldi_tree  # noqa: E402,F401
