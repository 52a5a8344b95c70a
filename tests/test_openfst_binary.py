"""Binary OpenFst interchange: VectorFst/ConstFst containers, standard /
lattice4 / compactlattice44 arc types, den.fst round-trip into the den-graph
compiler, and golden-byte fixtures (same protocol as the binary-ark suite)."""

import io
import math
import pathlib
import struct

import numpy as np
import pytest

from torchain_tpu.fstkit import Fst
from torchain_tpu.fstkit.openfst_io import (
    ARC_TYPES,
    RawArc,
    RawFst,
    from_fstkit,
    read_fst_stream,
    read_openfst,
    read_openfst_raw,
    to_fstkit,
    write_fst_stream,
    write_openfst,
    write_openfst_raw,
)

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def small_raw(arctype="standard", start=0):
    def w(*vals):
        return vals + ((),) if ARC_TYPES[arctype][1] else vals

    if arctype == "standard":
        aw1, aw2, fw = w(0.5), w(1.25), w(0.75)
    else:
        aw1, aw2, fw = w(0.5, 0.25), w(1.25, -0.5), w(0.75, 0.125)
    if ARC_TYPES[arctype][1]:
        aw1 = aw1[:2] + ((3, 1, 4),)
        aw2 = aw2[:2] + ((),)
        fw = fw[:2] + ((1, 5),)
    inf = (float("inf"),) * ARC_TYPES[arctype][0]
    if ARC_TYPES[arctype][1]:
        inf = inf + ((),)
    return RawFst(
        fsttype="vector",
        arctype=arctype,
        start=start,
        finals=[inf, inf, fw],
        arcs=[
            [RawArc(1, 7, aw1, 1), RawArc(2, 0, aw2, 2)],
            [RawArc(3, 3, aw2, 2)],
            [],
        ],
    )


class TestRoundTrip:
    @pytest.mark.parametrize("arctype", ["standard", "lattice4", "compactlattice44"])
    def test_vector_roundtrip(self, arctype, tmp_path):
        raw = small_raw(arctype)
        p = str(tmp_path / "a.fst")
        write_openfst_raw(p, raw)
        got = read_openfst_raw(p)
        assert got.fsttype == "vector" and got.arctype == arctype
        assert got.start == raw.start
        assert got.finals == raw.finals
        assert got.arcs == raw.arcs

    @pytest.mark.parametrize("arctype", ["standard", "lattice4"])
    @pytest.mark.parametrize("aligned", [False, True])
    def test_const_roundtrip(self, arctype, aligned, tmp_path):
        raw = small_raw(arctype)
        p = str(tmp_path / "a.fst")
        write_openfst_raw(p, raw, fsttype="const", aligned=aligned)
        got = read_openfst_raw(p)
        assert got.fsttype == "const"
        assert got.finals == raw.finals
        assert got.arcs == raw.arcs

    def test_const_rejects_compactlattice(self, tmp_path):
        raw = small_raw("compactlattice44")
        with pytest.raises(ValueError, match="ConstFst"):
            write_openfst_raw(str(tmp_path / "a.fst"), raw, fsttype="const")

    def test_embedded_stream_read_stops_at_fst_end(self):
        # Kaldi archives embed FSTs mid-stream; the reader must consume
        # exactly the FST's bytes and leave trailing data untouched
        raw = small_raw("standard")
        buf = io.BytesIO()
        write_fst_stream(buf, raw)
        buf.write(b"TRAILING")
        buf.seek(0)
        got = read_fst_stream(buf)
        assert got.arcs == raw.arcs and got.finals == raw.finals
        assert buf.read() == b"TRAILING"

    def test_stream_counts_rejected_in_archives(self):
        # a stream-written header (numstates == -1) reads states to EOF;
        # inside a multi-record archive that would swallow every record
        # after it, so archive contexts must reject it loudly
        from torchain_tpu.fstkit.openfst_io import (
            VECTOR_FILE_VERSION,
            _read_weight,
            _write_header,
            _write_weight,
        )

        raw = small_raw("standard")
        buf = io.BytesIO()
        _write_header(
            buf, "vector", "standard", VECTOR_FILE_VERSION, 0, 0, raw.start, -1, -1
        )
        for s in range(raw.num_states):
            _write_weight(buf, "standard", raw.finals[s])
            buf.write(struct.pack("<q", len(raw.arcs[s])))
            for a in raw.arcs[s]:
                buf.write(struct.pack("<ii", a.ilabel, a.olabel))
                _write_weight(buf, "standard", a.weight)
                buf.write(struct.pack("<i", a.nextstate))
        # standalone stream read still works (runs to EOF)
        buf.seek(0)
        got = read_fst_stream(buf)
        assert got.arcs == raw.arcs and got.finals == raw.finals
        # archive context rejects instead of consuming to EOF
        buf.seek(0)
        with pytest.raises(ValueError, match="archive"):
            read_fst_stream(buf, allow_stream_counts=False)

    def test_bad_magic(self, tmp_path):
        p = tmp_path / "bad.fst"
        p.write_bytes(b"\x00" * 64)
        with pytest.raises(ValueError, match="magic"):
            read_openfst_raw(str(p))


class TestFstkitConversion:
    def test_start_state_swap(self):
        raw = small_raw("standard", start=2)
        raw.finals[0], raw.finals[2] = raw.finals[2], raw.finals[0]
        fst, ol = to_fstkit(raw)
        # start (old state 2, made non-final by the swap above) is now
        # state 0; old state 0 (made final) moved to slot 2
        assert fst.num_states == 3
        assert fst.is_final(2) and not fst.is_final(0)

    def test_sign_convention(self, tmp_path):
        fst = Fst()
        fst.add_states(2)
        fst.add_arc(0, 5, -0.25, 1)  # log-prob -0.25 -> cost 0.25
        fst.set_final(1, -1.5)
        p = str(tmp_path / "s.fst")
        write_openfst(p, fst)
        raw = read_openfst_raw(p)
        assert raw.arcs[0][0].weight == (0.25,)
        assert raw.finals[1] == (1.5,)
        back, ol = read_openfst(p)
        assert back.arcs(0)[0].weight == pytest.approx(-0.25)
        assert back.final(1) == pytest.approx(-1.5)
        assert ol == [5]

    def test_transducer_olabels(self, tmp_path):
        fst = Fst()
        fst.add_states(3)
        fst.add_arc(0, 1, 0.0, 1)
        fst.add_arc(0, 2, -0.5, 2)
        fst.add_arc(1, 3, 0.0, 2)
        fst.set_final(2)
        p = str(tmp_path / "t.fst")
        write_openfst(p, fst, arc_olabels=[10, 0, 20])
        back, ol = read_openfst(p)
        assert ol == [10, 0, 20]
        assert [a.label for _, a in back.all_arcs()] == [1, 2, 3]

    def test_lattice_weight_components(self, tmp_path):
        # fstkit convention: weight = total log-prob, weight2 = acoustic part
        lat = Fst()
        lat.add_states(2)
        lat.add_arc(0, 4, -3.0, 1, -2.0)  # graph cost 1.0, acoustic cost 2.0
        lat.set_final(1, -0.5, -0.5)  # graph 0, acoustic 0.5
        p = str(tmp_path / "l.fst")
        write_openfst(p, lat, arctype="lattice4")
        raw = read_openfst_raw(p)
        assert raw.arcs[0][0].weight == (1.0, 2.0)
        assert raw.finals[1] == (0.0, 0.5)
        back, _ = read_openfst(p)
        a = back.arcs(0)[0]
        assert (a.weight, a.weight2) == (-3.0, -2.0)


class TestDenFstRoundTrip:
    def test_den_fst_binary_to_den_graph(self, tmp_path):
        """VERDICT r2 gate: a binary den.fst round-trips into the den-graph
        compiler with identical packed tensors."""
        from torchain_tpu.graphs.den_graph import compile_den_graph, make_den_fst
        from torchain_tpu.graphs.phone_lm import PhoneLmOptions, estimate_phone_lm
        from torchain_tpu.graphs.topology import ContextTree

        rng = np.random.default_rng(0)
        sents = [
            [int(x) for x in rng.integers(1, 4, size=rng.integers(2, 7))]
            for _ in range(30)
        ]
        lm = estimate_phone_lm(sents, PhoneLmOptions(ngram_order=2))
        tree = ContextTree(3, context_width=1)
        den_fst = make_den_fst(lm, tree)
        p = str(tmp_path / "den.fst")
        write_openfst(p, den_fst)
        back, _ = read_openfst(p)
        g0 = compile_den_graph(den_fst, tree.num_pdfs)
        g1 = compile_den_graph(back, tree.num_pdfs)
        assert g0.num_states == g1.num_states
        np.testing.assert_array_equal(g0.in_src, g1.in_src)
        np.testing.assert_array_equal(g0.in_pdf, g1.in_pdf)
        np.testing.assert_allclose(g0.in_logw, g1.in_logw, atol=1e-6)
        np.testing.assert_allclose(g0.initial_probs, g1.initial_probs, atol=1e-6)

    def test_hclg_const_fst_decodes_identically(self, tmp_path):
        """HCLG.fst written/read as ConstFst (the mkgraph.sh container)
        preserves best-path decoding."""
        from torchain_tpu.data.words import random_lexicon, train_word_lm
        from torchain_tpu.eval.decoder import pack_decoding_graph, viterbi_decode
        from torchain_tpu.graphs.hclg import make_hclg
        from torchain_tpu.graphs.topology import ChainTopology, ContextTree

        rng = np.random.default_rng(1)
        lex = random_lexicon(vocab_size=5, num_phones=4, rng=rng)
        sents = [
            [int(x) for x in rng.integers(1, 6, size=rng.integers(1, 5))]
            for _ in range(30)
        ]
        wlm = train_word_lm(sents)
        tree = ContextTree(4, context_width=1)
        hclg, olab = make_hclg(wlm, lex, tree, ChainTopology())
        p = str(tmp_path / "HCLG.fst")
        write_openfst(p, hclg, arc_olabels=olab, fsttype="const", aligned=True)
        back, olab2 = read_openfst(p)
        assert olab2 == olab
        post = rng.standard_normal((40, tree.num_pdfs)).astype(np.float32)
        g0 = pack_decoding_graph(hclg, olab, tree.num_pdfs)
        g1 = pack_decoding_graph(back, olab2, tree.num_pdfs)
        r0 = viterbi_decode(g0, post, backend="numpy")
        r1 = viterbi_decode(g1, post, backend="numpy")
        assert r0[0] == r1[0]
        assert r0[1] == pytest.approx(r1[1], abs=1e-4)


class TestGoldenBytes:
    """Committed fixtures: regenerate with tools/make_openfst_fixtures.py.
    Guards against accidental format drift between rounds."""

    def test_golden_vector_standard(self):
        raw = read_openfst_raw(str(FIXTURES / "golden_vector_standard.fst"))
        want = small_raw("standard")
        assert raw.arcs == want.arcs and raw.finals == want.finals

    def test_golden_const_aligned(self):
        raw = read_openfst_raw(str(FIXTURES / "golden_const_aligned.fst"))
        want = small_raw("standard")
        assert raw.arcs == want.arcs and raw.finals == want.finals

    def test_golden_compactlattice(self):
        raw = read_openfst_raw(str(FIXTURES / "golden_compactlattice44.fst"))
        want = small_raw("compactlattice44")
        assert raw.arcs == want.arcs and raw.finals == want.finals

    @pytest.mark.parametrize(
        "name,arctype,fsttype,aligned",
        [
            ("golden_vector_standard.fst", "standard", "vector", False),
            ("golden_const_aligned.fst", "standard", "const", True),
            ("golden_compactlattice44.fst", "compactlattice44", "vector", False),
        ],
    )
    def test_writer_reproduces_golden_bytes(self, name, arctype, fsttype, aligned, tmp_path):
        raw = small_raw(arctype)
        p = tmp_path / name
        write_openfst_raw(str(p), raw, fsttype=fsttype, aligned=aligned)
        assert p.read_bytes() == (FIXTURES / name).read_bytes()
