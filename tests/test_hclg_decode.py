"""Real-HCLG decoding path: epsilon-arc decoder support + transition-id
relabeling through the TransitionModel, verified against brute-force
path enumeration over the eps-bearing transducer."""

import itertools

import numpy as np
import pytest

from torchain_tpu.eval import hclg_decoding_graph, viterbi_decode
from torchain_tpu.eval.decoder import DecodingGraph, pack_decoding_graph
from torchain_tpu.fstkit import Fst
from torchain_tpu.fstkit.fst import NEG_INF
from torchain_tpu.graphs.transition_model import chain_transition_model


def _brute_best_path(fst, olabels, loglikes, use_final=True):
    """Enumerate ALL T-emitting-frame paths (eps arcs free) by DFS;
    return (best olabel sequence, best score)."""
    T = loglikes.shape[0]
    arcs_by_src = {}
    for i, (s, a) in enumerate(fst.all_arcs()):
        arcs_by_src.setdefault(s, []).append((a, olabels[i]))
    best = [None, NEG_INF]

    def dfs(state, t, score, words, eps_depth=0):
        if eps_depth > fst.num_states:
            return  # eps cycle guard
        if t == T:
            fw = fst.final(state) if use_final else 0.0
            if fst.is_final(state) or not use_final:
                tot = score + (fw if use_final else 0.0)
                if tot > best[1]:
                    best[0], best[1] = list(words), tot
            # continue relaxing eps arcs at the end too
        for a, ol in arcs_by_src.get(state, ()):
            nw = words + ([ol] if ol > 0 else [])
            if a.label == 0:
                dfs(a.dst, t, score + a.weight, nw, eps_depth + 1)
            elif t < T:
                dfs(
                    a.dst, t + 1,
                    score + a.weight + loglikes[t, a.label - 1], nw, 0,
                )

    dfs(0, 0, 0.0, [])
    return best[0], best[1]


def _eps_fixture(seed=0):
    """Small transducer over 3 pdfs with eps word/backoff-style arcs,
    including a 2-arc eps CHAIN (tests level ordering)."""
    rng = np.random.default_rng(seed)
    f = Fst()
    f.add_states(6)
    olab = []

    def arc(s, lab, w, d, ol):
        f.add_arc(s, lab, w, d)
        olab.append(ol)

    # emitting arcs (labels are pdf+1)
    arc(0, 1, -0.1, 1, 0)
    arc(1, 1, -0.2, 1, 0)   # self-loop-ish
    arc(1, 2, -0.3, 2, 0)
    arc(2, 3, -0.1, 2, 0)
    arc(4, 2, -0.2, 1, 0)
    arc(5, 3, -0.15, 2, 0)
    # eps arcs: word emission + a 2-step chain 2 -> 4 -> 5
    arc(2, 0, -0.05, 3, 7)   # word 7
    arc(2, 0, -0.4, 4, 8)    # word 8
    arc(4, 0, -0.1, 5, 9)    # chain: word 9 after word 8
    arc(3, 0, -0.2, 0, 0)    # loop back (through emitting 0->1 next frame)
    f.set_final(3, -0.1)
    f.set_final(5, -0.3)
    loglikes = rng.normal(size=(5, 3)).astype(np.float32)
    return f, olab, loglikes


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_eps_viterbi_matches_brute_force(seed):
    f, olab, ll = _eps_fixture(seed)
    graph = pack_decoding_graph(f, olab, 3, allow_eps=True)
    assert graph.num_eps == 4
    words, score = viterbi_decode(graph, ll, beam=1e9, backend="numpy")
    bwords, bscore = _brute_best_path(f, olab, ll)
    assert abs(score - bscore) < 1e-4
    assert words == bwords


def test_eps_free_packing_unchanged():
    f = Fst()
    f.add_states(2)
    f.add_arc(0, 1, -0.1, 1)
    f.set_final(1)
    g = pack_decoding_graph(f, [0], 1)
    assert g.num_eps == 0


def test_eps_requires_flag():
    f = Fst()
    f.add_states(2)
    f.add_arc(0, 0, -0.1, 1)
    f.add_arc(0, 1, -0.1, 1)
    f.set_final(1)
    with pytest.raises(ValueError, match="epsilon"):
        pack_decoding_graph(f, [0, 0], 1)


def test_eps_cycle_rejected():
    f = Fst()
    f.add_states(3)
    f.add_arc(0, 1, -0.1, 1)
    f.add_arc(1, 0, -0.1, 2)
    f.add_arc(2, 0, -0.1, 1)  # pure-eps cycle 1 <-> 2
    f.set_final(1)
    with pytest.raises(ValueError, match="cycle"):
        pack_decoding_graph(f, [0, 0, 0], 1, allow_eps=True)


class TestRealHclgLadder:
    """Binary HCLG.fst (transition-id ilabels, word olabels) + final.mdl
    -> hclg_decoding_graph -> viterbi, fully through the interchange
    readers — the nnet3-latgen-faster day-1 path."""

    def _build(self, tmp_path):
        from torchain_tpu.fstkit.openfst_io import read_openfst, write_openfst
        from torchain_tpu.graphs.transition_model import (
            read_transition_model,
            write_transition_model,
        )

        tm = chain_transition_model(3)
        slf = lambda p: 2 * (p - 1) + 1  # gen_topo lists the self-loop first
        fwd = lambda p: 2 * (p - 1) + 2
        # tid-labeled HCLG for "word = one phone", grammar: w1 w2 | w1 w3,
        # with reordered self-loops (fwd arc then self-loop on the dst)
        f = Fst()
        f.add_states(5)
        olab = []

        def arc(s, lab, w, d, ol):
            f.add_arc(s, lab, w, d, 0.0)
            olab.append(ol)

        arc(0, fwd(1), -0.1, 1, 101)   # word 101 = phone 1
        arc(1, slf(1), -0.1, 1, 0)
        arc(1, 0, -0.6, 2, 0)          # eps word-boundary arc
        arc(2, fwd(2), -0.2, 3, 102)
        arc(2, fwd(3), -0.3, 4, 103)
        arc(3, slf(2), -0.1, 3, 0)
        arc(4, slf(3), -0.1, 4, 0)
        f.set_final(3, -0.05)
        f.set_final(4, -0.05)

        hclg_path = str(tmp_path / "HCLG.fst")
        write_openfst(hclg_path, f, olab, arctype="standard")
        mdl_path = str(tmp_path / "final.mdl")
        write_transition_model(mdl_path, tm)
        fst2, olab2 = read_openfst(hclg_path)
        tm2 = read_transition_model(mdl_path)
        return fst2, olab2, tm2

    def test_decode_words(self, tmp_path):
        fst, olab, tm = self._build(tmp_path)
        graph = hclg_decoding_graph(fst, olab, tm)
        assert graph.num_pdfs == 6
        assert graph.num_eps == 1
        # loglikes favoring phone1 x2 then phone2 x2 (pdfs: fwd=2(p-1), slf odd)
        ll = np.full((4, 6), -5.0, np.float32)
        ll[0, 0] = ll[1, 1] = 0.0   # phone1 fwd, self
        ll[2, 2] = ll[3, 3] = 0.0   # phone2 fwd, self
        words, score = viterbi_decode(graph, ll, backend="numpy")
        assert words == [101, 102]
        assert np.isfinite(score)

    def test_word_103_wins_when_favored(self, tmp_path):
        fst, olab, tm = self._build(tmp_path)
        graph = hclg_decoding_graph(fst, olab, tm)
        ll = np.full((4, 6), -5.0, np.float32)
        ll[0, 0] = ll[1, 1] = 0.0
        ll[2, 4] = ll[3, 5] = 0.0   # phone3
        words, _ = viterbi_decode(graph, ll, backend="numpy")
        assert words == [101, 103]


def _brute_all_paths(fst, olabels, loglikes, use_final=True):
    """All complete T-frame paths (eps arcs free): list of (words, score)."""
    T = loglikes.shape[0]
    arcs_by_src = {}
    for i, (s, a) in enumerate(fst.all_arcs()):
        arcs_by_src.setdefault(s, []).append((a, olabels[i]))
    out = []

    def dfs(state, t, score, words, eps_depth=0):
        if eps_depth > fst.num_states:
            return
        if t == T and (fst.is_final(state) or not use_final):
            fw = fst.final(state) if use_final else 0.0
            out.append((list(words), score + fw))
        for a, ol in arcs_by_src.get(state, ()):
            nw = words + ([ol] if ol > 0 else [])
            if a.label == 0:
                dfs(a.dst, t, score + a.weight, nw, eps_depth + 1)
            elif t < T:
                dfs(
                    a.dst, t + 1,
                    score + a.weight + loglikes[t, a.label - 1], nw, 0,
                )

    dfs(0, 0, 0.0, [])
    return out


class TestEpsLattice:
    """lattice_decode over eps-bearing graphs: numpy reference against
    brute-force path enumeration, native against numpy."""

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_numpy_lattice_matches_brute_force(self, seed):
        from torchain_tpu.eval.lattice import lattice_best_path, lattice_decode
        from torchain_tpu.fstkit import shortest_distance

        f, olab, ll = _eps_fixture(seed)
        graph = pack_decoding_graph(f, olab, 3, allow_eps=True)
        lat = lattice_decode(graph, ll, beam=1e9, backend="numpy")
        paths = _brute_all_paths(f, olab, ll)
        assert paths
        # tropical total == best path == viterbi
        bwords, bscore = max(paths, key=lambda p: p[1])
        words, score = lattice_best_path(lat)
        assert score == pytest.approx(bscore, abs=1e-4)
        assert words == bwords
        # log-semiring total == logsumexp over ALL complete paths
        mass = shortest_distance(lat, reverse_dir=True, semiring="log")[0]
        ref_mass = np.logaddexp.reduce([s for _, s in paths])
        assert mass == pytest.approx(ref_mass, abs=1e-4)
        # state_times attached and consistent: emitting arcs advance one
        # frame, eps arcs stay within the boundary
        times = lat.state_times
        assert len(times) == lat.num_states
        for s, a in lat.all_arcs():
            if a.weight2 == 0.0 and times[a.dst] == times[s]:
                continue  # eps arc
            assert times[a.dst] == times[s] + 1

    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("beam", [2.0, 5.0, 1e9])
    def test_native_matches_numpy(self, seed, beam):
        from torchain_tpu.eval.lattice import lattice_best_path, lattice_decode
        from torchain_tpu.eval.native import get_lib
        from torchain_tpu.fstkit import shortest_distance

        if get_lib() is None:
            pytest.skip("native toolchain unavailable")
        f, olab, ll = _eps_fixture(seed)
        graph = pack_decoding_graph(f, olab, 3, allow_eps=True)
        ref = lattice_decode(graph, ll, beam=beam, backend="numpy")
        nat = lattice_decode(graph, ll, beam=beam, backend="native")
        assert nat.num_arcs == ref.num_arcs
        assert nat.num_states == ref.num_states
        p0, s0 = lattice_best_path(ref)
        p1, s1 = lattice_best_path(nat)
        assert p0 == p1
        assert s1 == pytest.approx(s0, abs=1e-4)
        m0 = shortest_distance(ref, reverse_dir=True, semiring="log")[0]
        m1 = shortest_distance(nat, reverse_dir=True, semiring="log")[0]
        assert m1 == pytest.approx(m0, abs=1e-4)
        assert sorted(nat.state_times) == sorted(ref.state_times)

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_native_viterbi_matches_numpy(self, seed):
        from torchain_tpu.eval.native import get_lib

        if get_lib() is None:
            pytest.skip("native toolchain unavailable")
        f, olab, ll = _eps_fixture(seed)
        graph = pack_decoding_graph(f, olab, 3, allow_eps=True)
        w0, s0 = viterbi_decode(graph, ll, beam=1e9, backend="numpy")
        w1, s1 = viterbi_decode(graph, ll, beam=1e9, backend="native")
        assert w1 == w0
        assert s1 == pytest.approx(s0, abs=1e-4)

    def test_ctm_times_on_real_hclg(self, tmp_path):
        from torchain_tpu.eval.lattice import best_path_ctm, lattice_decode

        fst, olab, tm = TestRealHclgLadder()._build(tmp_path)
        graph = hclg_decoding_graph(fst, olab, tm)
        ll = np.full((4, 6), -5.0, np.float32)
        ll[0, 0] = ll[1, 1] = 0.0   # phone1 frames 0-1
        ll[2, 2] = ll[3, 3] = 0.0   # phone2 frames 2-3
        for backend in ("numpy", "native"):
            if backend == "native":
                from torchain_tpu.eval.native import get_lib

                if get_lib() is None:
                    continue
            lat = lattice_decode(graph, ll, beam=1e9, backend=backend)
            ctm = best_path_ctm(lat, frame_shift_s=1.0)
            assert [e.word for e in ctm] == [101, 102]
            # word labels sit on phone-ENTRY arcs in this HCLG, so under
            # the documented convention (span ends at the emitting arc)
            # word 101 covers frame 0 and word 102 frames 1-2; eps arcs
            # consume no time (the walk crosses the boundary-2 eps arc
            # without advancing)
            assert ctm[0].start_s == 0.0
            assert ctm[0].dur_s == pytest.approx(1.0)
            assert ctm[1].start_s == pytest.approx(1.0)
            assert ctm[1].dur_s == pytest.approx(2.0)


def test_cli_decode_with_real_hclg(tmp_path):
    """cli.decode --hclg HCLG.fst --mdl final.mdl: the full
    nnet3-latgen-faster day-1 command with zero graph-building inputs."""
    from torchain_tpu import io as tio
    from torchain_tpu.cli.decode import main as decode_main
    from torchain_tpu.fstkit.openfst_io import write_openfst
    from torchain_tpu.graphs.transition_model import write_transition_model

    tm = chain_transition_model(3)
    slf = lambda p: 2 * (p - 1) + 1  # gen_topo lists the self-loop first
    fwd = lambda p: 2 * (p - 1) + 2
    f = Fst()
    f.add_states(5)
    olab = []

    def arc(s, lab, w, d, ol):
        f.add_arc(s, lab, w, d, 0.0)
        olab.append(ol)

    arc(0, fwd(1), -0.1, 1, 101)
    arc(1, slf(1), -0.1, 1, 0)
    arc(1, 0, -0.6, 2, 0)
    arc(2, fwd(2), -0.2, 3, 102)
    arc(3, slf(2), -0.1, 3, 0)
    f.set_final(3, -0.05)
    hclg = str(tmp_path / "HCLG.fst")
    write_openfst(hclg, f, olab, arctype="standard")
    mdl = str(tmp_path / "final.mdl")
    write_transition_model(mdl, tm)

    ll = np.full((4, 6), -5.0, np.float32)
    ll[0, 0] = ll[1, 1] = 0.0
    ll[2, 2] = ll[3, 3] = 0.0
    ark = str(tmp_path / "post.ark")
    tio.write_ark_binary(ark, {"utt0": ll})
    hyp = str(tmp_path / "hyp.txt")
    res = decode_main(
        [
            "--posteriors", ark,
            "--hclg", hclg,
            "--mdl", mdl,
            "--backend", "numpy",
            "--hyp-out", hyp,
        ]
    )
    assert res["hyps"]["utt0"] == [101, 102]
    with open(hyp) as fh:
        assert fh.read().strip() == "utt0 101 102"

    # the full scoring ladder over the same real HCLG: lattices, LMWT
    # sweep, MBR, CTM, words.txt symbols, symbolic refs
    words = str(tmp_path / "words.txt")
    with open(words, "w") as fh:
        fh.write("<eps> 0\nalpha 101\nbeta 102\n")
    ref = str(tmp_path / "ref.txt")
    with open(ref, "w") as fh:
        fh.write("utt0 alpha beta\n")
    ctm = str(tmp_path / "hyp.ctm")
    res = decode_main(
        [
            "--posteriors", ark,
            "--hclg", hclg,
            "--mdl", mdl,
            "--word-symbols", words,
            "--ref", ref,
            "--lmwt-min", "1",
            "--lmwt-max", "3",
            "--mbr",
            "--ctm-out", ctm,
            "--hyp-out", hyp,
        ]
    )
    assert res["wer"] == 0.0
    assert res["mbr"] is True
    with open(hyp) as fh:
        assert fh.read().strip() == "utt0 alpha beta"
    rows = [ln.split() for ln in open(ctm)]
    assert [r[4] for r in rows] == ["alpha", "beta"]
