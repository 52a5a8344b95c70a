"""ctypes bridge to the native decoder (csrc/decoder.cc).

Replaces the role of torchain's C FFI layer ([R] src/, SURVEY.md L1/L2) for
the host-side decode path: a flat C ABI over packed arrays, loaded with
ctypes (no pybind11 dependency).  Builds lazily with `make -C csrc` on
first use; callers fall back to the numpy reference implementation when no
toolchain is available.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_CSRC = pathlib.Path(__file__).resolve().parent.parent.parent / "csrc"
_SO = _CSRC / "libtorchain_tpu_native.so"
_lib = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_CSRC)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _SO.exists()
    except Exception:
        return False


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not _SO.exists() and not _build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        _load_failed = True
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.tt_viterbi_decode.restype = ctypes.c_int
    lib.tt_viterbi_decode.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        i32p, i32p, i32p, f32p, i32p,
        f32p, f32p,
        ctypes.c_float, ctypes.c_int,
        i32p, ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return _lib


def native_viterbi(graph, loglikes: np.ndarray, beam: float, use_final: bool):
    """Returns (phones, score) or None if the native library is missing."""
    lib = get_lib()
    if lib is None:
        return None
    T = loglikes.shape[0]
    out_phones = np.zeros(T, dtype=np.int32)
    out_len = ctypes.c_int32(0)
    out_score = ctypes.c_float(0.0)
    rc = lib.tt_viterbi_decode(
        graph.num_states,
        graph.src.shape[0],
        graph.num_pdfs,
        T,
        np.ascontiguousarray(graph.src, np.int32),
        np.ascontiguousarray(graph.dst, np.int32),
        np.ascontiguousarray(graph.pdf, np.int32),
        np.ascontiguousarray(graph.weight, np.float32),
        np.ascontiguousarray(graph.olabel, np.int32),
        np.ascontiguousarray(graph.final_logw, np.float32),
        np.ascontiguousarray(loglikes, np.float32),
        beam,
        int(use_final),
        out_phones,
        ctypes.byref(out_len),
        ctypes.byref(out_score),
    )
    if rc != 0:
        return None
    return [int(p) for p in out_phones[: out_len.value]], float(out_score.value)


def _src_csr(graph):
    """Cached src-sorted arc views (offsets, dst, pdf, weight, olabel)."""
    cached = getattr(graph, "_src_csr_cache", None)
    if cached is not None:
        return cached
    order = np.argsort(graph.src, kind="stable")
    src_sorted = np.ascontiguousarray(graph.src[order], np.int32)
    offsets = np.zeros(graph.num_states + 1, dtype=np.int32)
    np.add.at(offsets, src_sorted + 1, 1)
    np.cumsum(offsets, out=offsets)
    cached = (
        offsets.astype(np.int32),
        np.ascontiguousarray(graph.dst[order], np.int32),
        np.ascontiguousarray(graph.pdf[order], np.int32),
        np.ascontiguousarray(graph.weight[order], np.float32),
        np.ascontiguousarray(graph.olabel[order], np.int32),
    )
    try:
        object.__setattr__(graph, "_src_csr_cache", cached)
    except Exception:
        pass
    return cached


def native_viterbi_active(
    graph,
    loglikes: np.ndarray,
    beam: float,
    max_active: int,
    use_final: bool,
):
    """Active-token best path (faster-decoder role: only live states are
    expanded, max_active caps the frontier).  Returns (phones, score) or
    None if the native library is missing."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "tt_viterbi_decode_active"):
        return None
    if not getattr(lib, "_active_proto_set", False):
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.tt_viterbi_decode_active.restype = ctypes.c_int
        lib.tt_viterbi_decode_active.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            i32p, i32p, i32p, f32p, i32p, f32p,
            f32p,
            ctypes.c_float, ctypes.c_int, ctypes.c_int,
            i32p, ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ]
        lib._active_proto_set = True
    offsets, dst, pdf, weight, olabel = _src_csr(graph)
    T = loglikes.shape[0]
    out_phones = np.zeros(T, dtype=np.int32)
    out_len = ctypes.c_int32(0)
    out_score = ctypes.c_float(0.0)
    rc = lib.tt_viterbi_decode_active(
        graph.num_states,
        dst.shape[0],
        graph.num_pdfs,
        T,
        offsets, dst, pdf, weight, olabel,
        np.ascontiguousarray(graph.final_logw, np.float32),
        np.ascontiguousarray(loglikes, np.float32),
        beam,
        int(max_active),
        int(use_final),
        out_phones,
        ctypes.byref(out_len),
        ctypes.byref(out_score),
    )
    if rc != 0:
        return None
    return [int(p) for p in out_phones[: out_len.value]], float(out_score.value)


def native_lattice(
    graph,
    loglikes: np.ndarray,
    beam: float,
    max_active: int = 0,
    use_final: bool = True,
    phone_bonus: float = 0.0,
):
    """Active-token lattice generation (latgen-faster-mapped role).

    Returns an fstkit.Fst with the same contents as the numpy
    lattice_decode under equal beams (plus Kaldi's max_active frontier
    cap, which numpy doesn't implement), or None if the native library is
    missing."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "tt_lattice_decode"):
        return None
    if not getattr(lib, "_lattice_proto_set", False):
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        c_i32p = ctypes.POINTER(ctypes.c_int32)
        lib.tt_lattice_decode.restype = ctypes.c_void_p
        lib.tt_lattice_decode.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            i32p, i32p, i32p, f32p, i32p, f32p,
            f32p,
            ctypes.c_float, ctypes.c_int, ctypes.c_int,
            c_i32p, c_i32p, c_i32p, c_i32p,
        ]
        lib.tt_lattice_fetch.restype = ctypes.c_int
        lib.tt_lattice_fetch.argtypes = [
            ctypes.c_void_p, i32p, i32p, i32p, f32p, f32p, i32p, f32p,
        ]
        lib.tt_lattice_free.restype = None
        lib.tt_lattice_free.argtypes = [ctypes.c_void_p]
        lib._lattice_proto_set = True
    offsets, dst, pdf, weight, olabel = _src_csr(graph)
    if phone_bonus != 0.0:
        weight = (weight + phone_bonus * (olabel > 0)).astype(np.float32)
    T = loglikes.shape[0]
    n_states = ctypes.c_int32(0)
    n_arcs = ctypes.c_int32(0)
    n_finals = ctypes.c_int32(0)
    err = ctypes.c_int32(0)
    handle = lib.tt_lattice_decode(
        graph.num_states,
        dst.shape[0],
        graph.num_pdfs,
        T,
        offsets, dst, pdf, weight, olabel,
        np.ascontiguousarray(graph.final_logw, np.float32),
        np.ascontiguousarray(loglikes, np.float32),
        beam,
        int(max_active),
        int(use_final),
        ctypes.byref(n_states),
        ctypes.byref(n_arcs),
        ctypes.byref(n_finals),
        ctypes.byref(err),
    )
    if not handle:
        if err.value == 2:
            raise ValueError("all decoding tokens died (beam too small?)")
        return None
    try:
        NA, NF = n_arcs.value, n_finals.value
        arc_src = np.empty(NA, np.int32)
        arc_dst = np.empty(NA, np.int32)
        arc_ol = np.empty(NA, np.int32)
        arc_w = np.empty(NA, np.float32)
        arc_am = np.empty(NA, np.float32)
        fin_s = np.empty(NF, np.int32)
        fin_w = np.empty(NF, np.float32)
        rc = lib.tt_lattice_fetch(
            handle, arc_src, arc_dst, arc_ol, arc_w, arc_am, fin_s, fin_w
        )
        if rc != 0:
            return None
    finally:
        lib.tt_lattice_free(handle)
    from torchain_tpu.fstkit import Fst

    fst = Fst()
    fst.add_states(int(n_states.value))
    arcs = fst._arcs  # direct append: NA can be large, add_arc checks cost
    from torchain_tpu.fstkit.fst import Arc

    for i in range(NA):
        arcs[arc_src[i]].append(
            Arc(int(arc_ol[i]), float(arc_w[i]), int(arc_dst[i]), float(arc_am[i]))
        )
    for i in range(NF):
        fst.set_final(int(fin_s[i]), float(fin_w[i]))
    return fst
