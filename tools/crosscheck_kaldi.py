"""One-shot cross-validation against REAL Kaldi artifacts (ADVICE r3 #2).

Byte-level Kaldi/OpenFst compatibility in this repo is pinned by
self-generated golden fixtures (the writer tests its own reader) because
the reference mount is empty and there is no network.  The day a real
Kaldi system is reachable, run this once per artifact class and record
the output in PARITY.md; until then the provenance caveat there stands.

For each supplied artifact the tool (a) reads it with this repo's
readers, (b) rewrites it with this repo's writers, and (c) byte-compares
the rewrite to the original (exact for deterministic formats; structural
round-trip equality where Kaldi's writer is not byte-canonical, e.g.
compressed matrices).

Usage:
  python tools/crosscheck_kaldi.py --den-fst den.fst --hclg HCLG.fst \
      --cegs ark:cegs.1.ark --lattice ark:lat.1.ark --ark feats.ark
Any subset of flags may be given.
"""

from __future__ import annotations

import argparse
import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _strip(rspec: str) -> str:
    return rspec.split(":", 1)[1] if ":" in rspec else rspec


def check_fst(path: str, name: str) -> bool:
    from torchain_tpu.fstkit.openfst_io import (
        CONST_ALIGNED_FILE_VERSION,
        FLAG_IS_ALIGNED,
        _read_header,
        read_fst_stream,
        write_fst_stream,
    )

    orig = open(path, "rb").read()
    _, _, version, flags, *_rest = _read_header(io.BytesIO(orig))
    aligned = version == CONST_ALIGNED_FILE_VERSION or bool(flags & FLAG_IS_ALIGNED)
    raw = read_fst_stream(io.BytesIO(orig))
    buf = io.BytesIO()
    write_fst_stream(buf, raw, fsttype=raw.fsttype, aligned=aligned)
    ok = buf.getvalue() == orig
    print(
        f"[{name}] {path}: fsttype={raw.fsttype} arctype={raw.arctype} "
        f"states={raw.num_states} byte-identical-rewrite={ok}"
    )
    if not ok:
        a, b = orig, buf.getvalue()
        i = next((k for k in range(min(len(a), len(b))) if a[k] != b[k]), min(len(a), len(b)))
        print(f"  first divergence at byte {i} (len {len(a)} vs {len(b)})")
    return ok


def check_cegs(path: str) -> bool:
    from torchain_tpu.data.cegs import (
        iter_cegs_ark,
        write_cegs_ark,
        example_to_batch,
    )

    path = _strip(path)
    egs = list(iter_cegs_ark(path))
    print(f"[cegs] {path}: {len(egs)} records")
    import tempfile, filecmp, os

    with tempfile.NamedTemporaryFile(suffix=".ark", delete=False) as tmp:
        out = tmp.name
    try:
        write_cegs_ark(out, egs)
        ok = filecmp.cmp(path, out, shallow=False)
        print(f"  byte-identical-rewrite={ok}")
        for key, eg in egs[:1]:
            if not eg.outputs[0].supervision.is_e2e:
                b = example_to_batch(eg)
                print(f"  {key}: batch feats {b.feats.shape} OK")
    finally:
        os.unlink(out)
    return ok


def check_lattice_ark(path: str) -> bool:
    from torchain_tpu.eval.lattice import (
        read_lattice_ark_binary,
        write_lattice_ark_binary,
    )

    path = _strip(path)
    lats = read_lattice_ark_binary(path)
    print(f"[lattice] {path}: {len(lats)} lattices")
    import tempfile, filecmp, os

    with tempfile.NamedTemporaryFile(suffix=".ark", delete=False) as tmp:
        out = tmp.name
    try:
        write_lattice_ark_binary(out, lats)
        ok = filecmp.cmp(path, out, shallow=False)
        print(f"  byte-identical-rewrite={ok}")
    finally:
        os.unlink(out)
    return ok


def check_ark(path: str) -> bool:
    from torchain_tpu.io import read_ark, write_ark_binary

    path = _strip(path)
    mats = dict(read_ark(path))
    print(f"[ark] {path}: {len(mats)} matrices")
    import tempfile, filecmp, os

    with tempfile.NamedTemporaryFile(suffix=".ark", delete=False) as tmp:
        out = tmp.name
    try:
        write_ark_binary(out, mats)
        ok = filecmp.cmp(path, out, shallow=False)
        print(f"  byte-identical-rewrite={ok} "
              "(False is expected for compressed (CM) sources; "
              "verify values round-trip instead)")
        if not ok:
            back = dict(read_ark(out))
            import numpy as np

            ok = all(np.allclose(mats[k], back[k], atol=1e-4) for k in mats)
            print(f"  value-round-trip={ok}")
    finally:
        os.unlink(out)
    return ok


def check_mdl(path: str) -> bool:
    """TransitionModel prefix of final.mdl: read, rewrite, byte-compare
    the TransitionModel span (the trailing nnet is not parsed)."""
    import io as _io

    from torchain_tpu.graphs.transition_model import TransitionModel
    from torchain_tpu.utils.kaldi_io import expect_binary_marker

    orig = open(path, "rb").read()
    f = _io.BytesIO(orig)
    binary = orig[:2] == b"\x00B"
    if binary:
        expect_binary_marker(f)
        tm = TransitionModel.read_binary(f)
        span = orig[2 : f.tell()]
        buf = _io.BytesIO()
        tm.write_binary(buf)
        ok = buf.getvalue() == span
    else:
        text = orig.decode()
        end = text.find("</TransitionModel>") + len("</TransitionModel>")
        tm = TransitionModel.read_text(text[:end])
        tm2 = TransitionModel.read_text(tm.write_text())
        ok = tm2.tuples == tm.tuples and tm2.topo.phones == tm.topo.phones
    print(
        f"[mdl] {path}: phones={len(tm.topo.phones)} tuples={len(tm.tuples)} "
        f"tids={tm.num_transition_ids} pdfs={tm.num_pdfs} "
        f"byte-identical-rewrite={ok}"
    )
    return ok


def check_mdl_forward(mdl: str, ark: str | None, n_frames: int = 20) -> bool:
    """Parse the nnet BODY of final.mdl (graphs/nnet3.py) and forward a
    few frames in numpy — the posterior-level cross-check for first real
    contact: compare the printed values against
    `nnet3-compute --use-priors=false final.mdl ark:feats.ark ark,t:-`.

    Without --ark, random features of the right dim are used (still
    proves the model parses and forwards end to end)."""
    import numpy as np

    from torchain_tpu.graphs.nnet3 import read_am_nnet

    try:
        tm, am = read_am_nnet(mdl)
    except Exception as e:  # noqa: BLE001
        print(f"[mdl-forward] {mdl}: nnet body FAILED to parse: {e}")
        return False
    nnet = am.nnet
    inp = {n.name: n for n in nnet.nodes.values() if n.kind == "input"}
    feat_dim = inp["input"].dim if "input" in inp else 0
    ivec_dim = inp["ivector"].dim if "ivector" in inp else 0
    print(
        f"[mdl-forward] {mdl}: parsed nnet with {len(nnet.nodes)} nodes / "
        f"{len(nnet.components)} components, feat_dim={feat_dim} "
        f"ivector_dim={ivec_dim} left={am.left_context} "
        f"right={am.right_context}"
    )
    if ark:
        from torchain_tpu.io import read_ark_binary, read_ark_text

        p = _strip(ark)
        try:
            mats = read_ark_binary(p)
        except Exception:  # noqa: BLE001
            mats = read_ark_text(p)
        key, feats = next(iter(mats.items()))
        print(f"  features: {key} {feats.shape}")
    else:
        rng = np.random.default_rng(0)
        feats = rng.standard_normal((n_frames + 8, feat_dim)).astype(
            np.float32
        )
        key = "(random)"
    inputs = {"input": np.asarray(feats, np.float32)}
    if ivec_dim:
        inputs["ivector"] = np.zeros((feats.shape[0], ivec_dim), np.float32)
    t0 = am.left_context
    t = np.arange(t0, min(t0 + 3 * 3, feats.shape[0] - am.right_context), 3)
    try:
        out = nnet.forward(inputs, t)
    except NotImplementedError as e:
        print(f"[mdl-forward] forward unsupported: {e}")
        return False
    print(f"  output[{key}] t={list(map(int, t))} dim={out.shape[1]}")
    for i, tt in enumerate(t):
        head = " ".join(f"{v:.4f}" for v in out[i, :8])
        print(f"    t={int(tt)}: {head} ...")
    return bool(np.all(np.isfinite(out)))


def check_ali(path: str, mdl: str | None) -> bool:
    import io as _io

    from torchain_tpu.graphs.transition_model import (
        read_ali_ark,
        read_transition_model,
        write_ali_ark,
    )

    alis = read_ali_ark(path)
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".ark", delete=False) as t:
        tmp = t.name
    write_ali_ark(tmp, alis, binary=True)
    ok = read_ali_ark(tmp) == alis
    msg = f"[ali] {path}: {len(alis)} utterances round-trip={ok}"
    if mdl:
        tm = read_transition_model(mdl)
        n_bad = sum(
            1
            for v in alis.values()
            if any(t < 1 or t > tm.num_transition_ids for t in v)
        )
        segs = sum(len(tm.ali_to_phones(v)) for v in alis.values() if not any(
            t < 1 or t > tm.num_transition_ids for t in v))
        msg += f" tid-range-violations={n_bad} phone-segments={segs}"
        ok = ok and n_bad == 0
    print(msg)
    return ok


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--den-fst")
    ap.add_argument("--hclg")
    ap.add_argument("--cegs")
    ap.add_argument("--lattice")
    ap.add_argument("--ark")
    ap.add_argument("--mdl", help="final.mdl / trans.mdl (TransitionModel)")
    ap.add_argument(
        "--forward",
        action="store_true",
        help="with --mdl: parse the trailing nnet3 AM and forward a few "
        "frames (compare vs nnet3-compute --use-priors=false)",
    )
    ap.add_argument("--ali", help="transition-id alignment archive (ark/.gz)")
    args = ap.parse_args()
    results = []
    if args.den_fst:
        results.append(check_fst(args.den_fst, "den.fst"))
    if args.hclg:
        results.append(check_fst(args.hclg, "HCLG"))
    if args.cegs:
        results.append(check_cegs(args.cegs))
    if args.lattice:
        results.append(check_lattice_ark(args.lattice))
    if args.ark:
        results.append(check_ark(args.ark))
    if args.mdl:
        results.append(check_mdl(args.mdl))
        if args.forward:
            results.append(check_mdl_forward(args.mdl, args.ark))
    if args.ali:
        results.append(check_ali(args.ali, args.mdl))
    if not results:
        print("nothing to check; pass at least one artifact flag")
        return 2
    print("CROSSCHECK:", "ALL OK" if all(results) else "DIVERGENCES FOUND")
    return 0 if all(results) else 1


if __name__ == "__main__":
    sys.exit(main())
