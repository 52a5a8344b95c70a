"""HmmTopology / TransitionModel interchange + ali-to-phones.

Round-trip (binary + text), derived transition-id maps on the chain and
3-state Bakis topologies, SplitToPhones behavior under both --reorder
conventions, alignment archives (text / binary / .gz)."""

import io

import numpy as np
import pytest

from torchain_tpu.graphs.transition_model import (
    NO_PDF,
    HmmState,
    HmmTopology,
    TransitionModel,
    chain_transition_model,
    read_ali_ark,
    read_transition_model,
    write_ali_ark,
    write_transition_model,
)


def _bakis_tmodel(num_phones=3):
    """Classic 3-emitting-state Bakis topology, one pdf per state."""
    entry = [
        HmmState(0, 0, [(0, 0.5), (1, 0.5)]),
        HmmState(1, 1, [(1, 0.5), (2, 0.5)]),
        HmmState(2, 2, [(2, 0.5), (3, 0.5)]),
        HmmState(NO_PDF, NO_PDF, []),
    ]
    phones = list(range(1, num_phones + 1))
    phone2idx = [-1] + [0] * num_phones
    topo = HmmTopology(phones=phones, phone2idx=phone2idx, entries=[entry])
    tuples = []
    for p in phones:
        for s in range(3):
            pdf = (p - 1) * 3 + s
            tuples.append((p, s, pdf, pdf))
    n_ids = sum(2 for _ in tuples)
    lp = np.full(n_ids + 1, np.log(0.5), np.float32)
    return TransitionModel(topo=topo, tuples=tuples, log_probs=lp)


class TestDerivedMaps:
    def test_chain_tid_numbering(self):
        tm = chain_transition_model(4)
        # 2 transitions per phone, ids 1..8
        assert tm.num_transition_ids == 8
        assert tm.num_pdfs == 8
        for p in range(1, 5):
            self_tid = 2 * (p - 1) + 1  # gen_topo lists the self-loop first
            fwd_tid = self_tid + 1
            assert tm.transition_id_to_phone(fwd_tid) == p
            assert tm.transition_id_to_phone(self_tid) == p
            assert not tm.is_self_loop(fwd_tid)
            assert tm.is_self_loop(self_tid)
            assert tm.is_final(fwd_tid)
            assert not tm.is_final(self_tid)
            assert tm.transition_id_to_pdf(fwd_tid) == 2 * (p - 1)
            assert tm.transition_id_to_pdf(self_tid) == 2 * (p - 1) + 1

    def test_bakis_maps(self):
        tm = _bakis_tmodel(2)
        assert tm.num_transition_ids == 12
        assert tm.num_pdfs == 6
        # phone 2, hmm-state 1 tuple is index 4 -> ids 9,10? count:
        # tuples: (1,0)(1,1)(1,2)(2,0)(2,1)(2,2), 2 ids each
        tid = 9  # first id of tuple (2,1): self-loop listed first there
        assert tm.transition_id_to_phone(tid) == 2
        assert tm.transition_id_to_hmm_state(tid) == 1
        assert tm.is_self_loop(tid)
        assert tm.transition_id_to_pdf(tid) == 4


class TestRoundTrip:
    @pytest.mark.parametrize("tm_fn", [lambda: chain_transition_model(5), _bakis_tmodel])
    def test_binary_roundtrip(self, tm_fn, tmp_path):
        tm = tm_fn()
        p = str(tmp_path / "final.mdl")
        write_transition_model(p, tm, binary=True)
        tm2 = read_transition_model(p)
        assert tm2.tuples == tm.tuples
        assert np.allclose(tm2.log_probs, tm.log_probs)
        assert tm2.topo.phones == tm.topo.phones
        assert np.array_equal(tm2.id2pdf, tm.id2pdf)

    @pytest.mark.parametrize("tm_fn", [lambda: chain_transition_model(5), _bakis_tmodel])
    def test_text_roundtrip(self, tm_fn, tmp_path):
        tm = tm_fn()
        p = str(tmp_path / "final.txt.mdl")
        write_transition_model(p, tm, binary=False)
        tm2 = read_transition_model(p)
        assert tm2.tuples == tm.tuples
        assert np.allclose(tm2.log_probs, tm.log_probs, atol=1e-6)
        assert np.array_equal(tm2.id2pdf, tm.id2pdf)

    def test_trailing_nnet_ignored(self, tmp_path):
        """.mdl files carry the nnet after </TransitionModel>."""
        tm = chain_transition_model(3)
        p = str(tmp_path / "final.mdl")
        write_transition_model(p, tm, binary=True)
        with open(p, "ab") as f:
            f.write(b"<Nnet3> lots of bytes we never parse")
        tm2 = read_transition_model(p)
        assert tm2.tuples == tm.tuples

    def test_golden_bytes_pinned(self):
        """Byte layout stays fixed (self-written golden, as with the
        other binary-interchange modules)."""
        tm = chain_transition_model(2)
        buf = io.BytesIO()
        buf.write(b"\x00B")
        tm.write_binary(buf)
        b = buf.getvalue()
        assert b.startswith(b"\x00B<TransitionModel> <Topology> ")
        assert b"<Triples>" not in b  # chain pdfs differ -> <Tuples>
        assert b"<Tuples> " in b and b"</Tuples> " in b
        assert b"<LogProbs> FV " in b
        assert b.endswith(b"</TransitionModel> ")


class TestAliToPhones:
    def test_reordered_chain_alignment(self):
        tm = chain_transition_model(3)
        # reorder=true (modern default): fwd tid first, then self-loops
        slf, fwd = lambda p: 2 * (p - 1) + 1, lambda p: 2 * (p - 1) + 2
        ali = [fwd(1), slf(1), slf(1), fwd(2), fwd(1), slf(1)]
        assert tm.ali_to_phones(ali) == [(1, 3), (2, 1), (1, 2)]

    def test_nonreordered_chain_alignment(self):
        tm = chain_transition_model(3)
        slf, fwd = lambda p: 2 * (p - 1) + 1, lambda p: 2 * (p - 1) + 2
        ali = [slf(1), slf(1), fwd(1), fwd(2), slf(2), fwd(2)]
        assert tm.ali_to_phones(ali, reorder=False) == [(1, 3), (2, 1), (2, 2)]

    def test_repeated_phone_instances_split(self):
        """Back-to-back instances of the SAME phone must split (the case
        a bare phone-change test misses)."""
        tm = chain_transition_model(2)
        slf, fwd = lambda p: 2 * (p - 1) + 1, lambda p: 2 * (p - 1) + 2
        ali = [fwd(1), slf(1), fwd(1), fwd(1), slf(1), slf(1)]
        assert tm.ali_to_phones(ali) == [(1, 2), (1, 1), (1, 3)]

    def test_ali_to_pdfs(self):
        tm = chain_transition_model(2)
        # tid 2p-1 is the self-loop (pdf 2(p-1)+1), tid 2p the forward
        assert tm.ali_to_pdfs([1, 2, 3, 4]) == [1, 0, 3, 2]

    def test_out_of_range_raises(self):
        tm = chain_transition_model(2)
        with pytest.raises(ValueError):
            tm.ali_to_phones([99])


class TestAliArk:
    def test_text_binary_gz_roundtrip(self, tmp_path):
        alis = {"utt1": [1, 2, 2, 3], "utt2": [4, 4, 1]}
        for name, binary in (("a.ark", True), ("a.txt", False), ("a.gz", True)):
            p = str(tmp_path / name)
            write_ali_ark(p, alis, binary=binary)
            assert read_ali_ark(p) == alis

    def test_kaldi_dir_ladder(self, tmp_path):
        """final.mdl + ali.gz -> phone alignments consumable by
        read_alignments-format writers (the real-corpus prep path)."""
        tm = chain_transition_model(4)
        mdl = str(tmp_path / "final.mdl")
        write_transition_model(mdl, tm)
        slf, fwd = lambda p: 2 * (p - 1) + 1, lambda p: 2 * (p - 1) + 2
        alis = {"u1": [fwd(2), slf(2), fwd(3)], "u2": [fwd(4)]}
        ark = str(tmp_path / "ali.1.gz")
        write_ali_ark(ark, alis)
        tm2 = read_transition_model(mdl)
        got = {k: tm2.ali_to_phones(v) for k, v in read_ali_ark(ark).items()}
        assert got == {"u1": [(2, 2), (3, 1)], "u2": [(4, 1)]}


class TestTopologyBinaryLayout:
    """Byte-level goldens for [K] hmm-topology.cc Write: the extended
    (non-HMM) format carries an int32 -1 sentinel before the entry count
    and a per-state self_loop_pdf_class; the HMM format omits both.
    Expected bytes are derived independently here with struct.pack."""

    @staticmethod
    def _i32(v):
        import struct

        return b"\x04" + struct.pack("<i", v)

    @staticmethod
    def _f32(v):
        import struct

        return b"\x04" + struct.pack("<f", v)

    @classmethod
    def _ivec(cls, vals):
        import struct

        return b"\x04" + struct.pack("<i", len(vals)) + struct.pack(
            f"<{len(vals)}i", *vals
        )

    def test_chain_topology_nonhmm_bytes(self):
        topo = HmmTopology.chain([1, 2])
        assert not topo.is_hmm()
        buf = io.BytesIO()
        topo.write_binary(buf)
        i32, f32, ivec = self._i32, self._f32, self._ivec
        expect = (
            b"<Topology> "
            + ivec([1, 2])        # phones_
            + ivec([-1, 0, 0])    # phone2idx_
            + i32(-1)             # extended-format sentinel (non-HMM)
            + i32(1)              # num entries
            + i32(2)              # states in entry 0
            # state 0: fwd pdf-class 0, self-loop pdf-class 1,
            # transitions: self-loop first (gen_topo order)
            + i32(0) + i32(1)
            + i32(2)
            + i32(0) + f32(0.5)
            + i32(1) + f32(0.5)
            # state 1: non-emitting final, no transitions
            + i32(NO_PDF) + i32(NO_PDF)
            + i32(0)
            + b"</Topology> "
        )
        assert buf.getvalue() == expect
        buf.seek(0)
        topo2 = HmmTopology.read_binary(buf)
        assert topo2.entries == topo.entries
        assert topo2.phones == topo.phones

    def test_hmm_topology_compact_bytes(self):
        topo = _bakis_tmodel(1).topo
        assert topo.is_hmm()
        buf = io.BytesIO()
        topo.write_binary(buf)
        data = buf.getvalue()
        i32, f32, ivec = self._i32, self._f32, self._ivec
        head = b"<Topology> " + ivec([1]) + ivec([-1, 0])
        # NO -1 sentinel: entry count follows directly
        assert data.startswith(head + i32(1) + i32(4))
        # state 0: single pdf-class (no self-loop field), 2 transitions
        st0 = i32(0) + i32(2) + i32(0) + f32(0.5) + i32(1) + f32(0.5)
        assert data[len(head + i32(1) + i32(4)) :].startswith(st0)
        buf.seek(0)
        topo2 = HmmTopology.read_binary(buf)
        assert topo2.entries == topo.entries
