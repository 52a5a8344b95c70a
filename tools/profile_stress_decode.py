"""Per-phase timing of the million-arc stress decode (VERDICT r4 #5).

Builds the same 2.66M-arc HCLG as tools/bench_decode.py --stress (cached
to /tmp as .npz so iteration doesn't pay the ~45 s graph build), then
times each phase of the lattice-mode loop separately:

  c++ decode     tt_lattice_decode (forward search + emission, in-native)
  fetch          array copy-out (tt_lattice_fetch)
  fst build      Python Fst/Arc construction in native_lattice
  best path      lattice_best_path over the raw arrays

Usage: timeout 1200 python tools/profile_stress_decode.py [--utts 8]
"""

import argparse
import ctypes
import json
import pathlib
import pickle
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

CACHE = "/tmp/stress_graph_cache.pkl"


def build_graph(vocab=30000, num_phones=40, lm_order=3, lm_sents=60000,
                extra_states=60000):
    from torchain_tpu.data.words import random_lexicon, train_word_lm
    from torchain_tpu.eval import make_word_decoding_graph
    from torchain_tpu.graphs import ContextTree

    rng = np.random.default_rng(0)
    lex = random_lexicon(vocab, num_phones, rng, max_pron_len=6)
    tree = ContextTree(num_phones, context_width=1)
    zipf = 1.0 / np.arange(1, vocab + 1)
    zipf /= zipf.sum()
    sents = [
        [int(w) + 1 for w in rng.choice(vocab, size=rng.integers(6, 18), p=zipf)]
        for _ in range(lm_sents)
    ]
    word_lm = train_word_lm(sents, order=lm_order, extra_states=extra_states)
    g = make_word_decoding_graph(word_lm, lex, tree)
    return g, tree.num_pdfs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--utts", type=int, default=8)
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--beam", type=float, default=16.0)
    ap.add_argument("--lattice-beam", type=float, default=8.0)
    ap.add_argument("--max-active", type=int, default=7000)
    ap.add_argument("--rebuild", action="store_true")
    args = ap.parse_args()

    if pathlib.Path(CACHE).exists() and not args.rebuild:
        with open(CACHE, "rb") as f:
            g, P = pickle.load(f)
        print(f"graph from cache: {g.num_states} states {len(g.src)} arcs",
              flush=True)
    else:
        t0 = time.perf_counter()
        g, P = build_graph()
        print(f"graph built in {time.perf_counter()-t0:.1f}s: "
              f"{g.num_states} states {len(g.src)} arcs", flush=True)
        with open(CACHE, "wb") as f:
            pickle.dump((g, P), f, protocol=4)

    rng = np.random.default_rng(0)
    T = args.frames
    posts = []
    for _ in range(args.utts):
        y = rng.standard_normal((T, P)).astype(np.float32)
        path = rng.integers(0, P, size=T)
        y[np.arange(T), path] += 8.0
        posts.append(y - np.log(np.exp(y).sum(-1, keepdims=True)))
    audio_s = args.utts * T * 3 * 0.010

    from torchain_tpu.eval import native as nat
    from torchain_tpu.eval.lattice import lattice_best_path, lattice_decode

    # warm: builds the .so + CSR caches
    lattice_decode(g, posts[0], beam=args.lattice_beam, backend="native",
                   max_active=args.max_active)

    lib = nat.get_lib()
    offsets, dst, pdf, weight, olabel = nat._src_csr(g)
    dofs, dsrc, dpdf, dweight, dolabel = nat._dst_csr(g)
    finw = np.ascontiguousarray(g.final_logw, np.float32)

    phases = dict(cxx=0.0, fetch=0.0, fst=0.0, best=0.0)
    arcs_total = 0
    t_all0 = time.perf_counter()
    for y in posts:
        y = np.ascontiguousarray(y, np.float32)
        n_states = ctypes.c_int32(0)
        n_arcs = ctypes.c_int32(0)
        n_finals = ctypes.c_int32(0)
        err = ctypes.c_int32(0)
        t0 = time.perf_counter()
        handle = lib.tt_lattice_decode(
            g.num_states, dst.shape[0], g.num_pdfs, T,
            offsets, dst, pdf, weight, olabel, finw,
            dofs, dsrc, dpdf, dweight, dolabel,
            y, args.lattice_beam, args.max_active, 1,
            ctypes.byref(n_states), ctypes.byref(n_arcs),
            ctypes.byref(n_finals), ctypes.byref(err),
        )
        t1 = time.perf_counter()
        phases["cxx"] += t1 - t0
        NA, NF = n_arcs.value, n_finals.value
        arcs_total += NA
        arc_src = np.empty(NA, np.int32)
        arc_dst = np.empty(NA, np.int32)
        arc_ol = np.empty(NA, np.int32)
        arc_w = np.empty(NA, np.float32)
        arc_am = np.empty(NA, np.float32)
        fin_s = np.empty(NF, np.int32)
        fin_w = np.empty(NF, np.float32)
        lib.tt_lattice_fetch(handle, arc_src, arc_dst, arc_ol, arc_w,
                             arc_am, fin_s, fin_w)
        times = np.empty(int(n_states.value), np.int32)
        lib.tt_lattice_fetch_times(handle, times)
        lib.tt_lattice_free(handle)
        t2 = time.perf_counter()
        phases["fetch"] += t2 - t1

        fst = nat.NativeLattice(int(n_states.value), arc_src, arc_dst,
                                arc_ol, arc_w, arc_am, fin_s, fin_w)
        fst._lattice_arrays = (arc_src, arc_dst, arc_ol, arc_w, fin_s,
                               fin_w, times)
        fst._eps_arrays = False
        t3 = time.perf_counter()
        phases["fst"] += t3 - t2
        lattice_best_path(fst)
        phases["best"] += time.perf_counter() - t3
    total = time.perf_counter() - t_all0

    out = {k: round(v * 1000 / args.utts, 2) for k, v in phases.items()}
    out["total_ms_per_utt"] = round(total * 1000 / args.utts, 2)
    out["rtf"] = round(audio_s / total, 1)
    out["arcs_per_utt"] = arcs_total // args.utts
    print(json.dumps(out))


if __name__ == "__main__":
    main()
