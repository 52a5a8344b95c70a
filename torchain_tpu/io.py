"""io — reader/writer/device-selection API (torchain `io.py` parity).

The reference's user-facing io module ([R] torchain/io.py, SURVEY.md
section 2.1) exposed: an egs example reader, per-utterance matrix writers
(for posterior export to Kaldi decoding), and GPU selection.  The
TPU-native equivalents:

  * example reading  -> torchain_tpu.data.ChainDataset / E2eChainDataset
                        (re-exported here for discoverability)
  * matrix writer    -> MatrixWriter: Kaldi TEXT ark format (readable by
                        copy-feats/latgen-faster-mapped ark,t: rspecifiers),
                        so posteriors still interoperate with external Kaldi
                        decoders when someone has them
  * set_kaldi_device -> select_device(): returns/validates the JAX backend
                        (device binding is automatic in JAX; this exists for
                        recipe-script parity and clear errors)
"""

from __future__ import annotations

import numpy as np

from torchain_tpu.data.loader import ChainDataset, E2eChainDataset  # noqa: F401


def select_device(platform: str | None = None):
    """Return the default device, optionally checking the platform matches
    (torchain's set_kaldi_device bound Kaldi to torch's GPU; in JAX there is
    one runtime, so this only validates and reports)."""
    import jax

    devices = jax.devices()
    if platform is not None and devices[0].platform != platform:
        raise RuntimeError(
            f"requested platform {platform!r} but default backend is "
            f"{devices[0].platform!r} ({devices[0]})"
        )
    return devices[0]


class MatrixWriter:
    """Write float matrices to a Kaldi TEXT archive (`ark,t:` format).

    Usage mirrors torchain's writer: `with MatrixWriter(path) as w:
    w[utt_id] = matrix`.  The output is consumable by Kaldi binaries via
    `ark,t:file`."""

    def __init__(self, path: str):
        self.path = path
        self._f = None

    def __enter__(self):
        self._f = open(self.path, "w")
        return self

    def __exit__(self, *exc):
        self.close()

    def close(self):
        if self._f is not None:
            self._f.close()
            self._f = None

    def write(self, utt_id: str, matrix: np.ndarray) -> None:
        if self._f is None:
            self._f = open(self.path, "w")
        if " " in utt_id:
            raise ValueError("utterance ids must not contain spaces")
        mat = np.asarray(matrix, dtype=np.float32)
        if mat.ndim != 2:
            raise ValueError("expected a [T, D] matrix")
        self._f.write(f"{utt_id}  [\n")
        for row in mat:
            self._f.write("  " + " ".join(f"{x:.7g}" for x in row) + " \n")
        self._f.write("]\n")

    def __setitem__(self, utt_id: str, matrix: np.ndarray) -> None:
        self.write(utt_id, matrix)


def read_ark_text(path: str) -> dict[str, np.ndarray]:
    """Read a Kaldi text archive of float matrices (round-trip for
    MatrixWriter; also reads Kaldi-produced `ark,t` output)."""
    out: dict[str, np.ndarray] = {}
    utt = None
    rows: list[list[float]] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.endswith("["):
                utt = line[:-1].strip()
                rows = []
            elif line.endswith("]"):
                body = line[:-1].strip()
                if body:
                    rows.append([float(x) for x in body.split()])
                if utt is None:
                    raise ValueError("malformed ark: ']' before any utterance")
                out[utt] = np.array(rows, dtype=np.float32)
                utt = None
            else:
                if utt is None:
                    raise ValueError(f"malformed ark line outside matrix: {line!r}")
                rows.append([float(x) for x in line.split()])
    if utt is not None:
        raise ValueError("malformed ark: unterminated matrix")
    return out
