"""Binary NnetChainExample (cegs) interchange: stream primitives, index
vectors, supervision embedding, merge/split exactness, batch conversion, a
one-step training gate, and golden-byte fixtures."""

import io
import math
import pathlib

import numpy as np
import pytest

from torchain_tpu.data.cegs import (
    KaldiSupervision,
    NnetChainExample,
    NnetChainSupervision,
    NnetIo,
    example_to_batch,
    iter_cegs_ark,
    make_chain_example,
    merge_supervision_fsts,
    read_chain_example,
    read_index_vector,
    read_supervision,
    split_merged_supervision_fst,
    write_cegs_ark,
    write_chain_example,
    write_index_vector,
    write_supervision,
)
from torchain_tpu.fstkit import Fst, compose, enumerate_paths
from torchain_tpu.graphs.den_graph import (
    compile_den_graph,
    make_den_fst,
    make_normalization_fst,
)
from torchain_tpu.graphs.phone_lm import PhoneLmOptions, estimate_phone_lm
from torchain_tpu.graphs.supervision import (
    SupervisionOptions,
    alignment_to_supervision_fst,
    compile_supervision,
    pad_and_stack_supervisions,
)
from torchain_tpu.graphs.topology import ContextTree
from torchain_tpu.ops import oracle

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def total_logprob(fst, y):
    """Brute-force logsumexp over paths with emission scores y[t, pdf]."""
    scores = [
        w + sum(y[t, lab - 1] for t, lab in enumerate(labels))
        for labels, w in enumerate_paths(fst)
    ]
    m = max(scores)
    return m + math.log(sum(math.exp(s - m) for s in scores))


def setup_chunks(num_chunks=3, T=6, seed=0, normalize=True):
    """Per-sequence supervision FSTs (normalization-composed, as get-egs
    stores them) + den graph + tree."""
    rng = np.random.default_rng(seed)
    num_phones = 3
    sents = [
        [int(x) for x in rng.integers(1, num_phones + 1, size=rng.integers(2, 6))]
        for _ in range(30)
    ]
    lm = estimate_phone_lm(sents, PhoneLmOptions(ngram_order=2))
    tree = ContextTree(num_phones, context_width=1)
    den_fst = make_den_fst(lm, tree)
    graph = compile_den_graph(den_fst, tree.num_pdfs)
    norm = make_normalization_fst(den_fst, graph.initial_probs)
    opts = SupervisionOptions(left_tolerance=1, right_tolerance=1)
    chunks = []
    for _ in range(num_chunks):
        while True:
            n_seg = int(rng.integers(2, 4))
            phones = rng.integers(1, num_phones + 1, size=n_seg)
            durs = rng.multinomial(T - n_seg, np.ones(n_seg) / n_seg) + 1
            ali = [(int(p), int(d)) for p, d in zip(phones, durs)]
            fst = alignment_to_supervision_fst(ali, tree, opts)
            if normalize:
                fst = compose(fst, norm)
            if fst.num_states:
                break
        chunks.append(fst)
    return chunks, tree, graph


class TestIndexVector:
    @pytest.mark.parametrize(
        "indexes",
        [
            [(0, t, 0) for t in range(-3, 10)],
            [(n, t, 0) for n in range(3) for t in range(5)],
            [(0, 0, 0), (0, 200, 0), (1, -200, 0), (1, -199, 2)],
            [],
            [(0, -124, 0), (0, 0, 0), (0, 124, 0), (0, 125, 0)],
        ],
    )
    def test_roundtrip(self, indexes):
        buf = io.BytesIO()
        write_index_vector(buf, indexes)
        buf.seek(0)
        assert read_index_vector(buf) == indexes

    def test_one_byte_compression(self):
        # consecutive same-n small-dt indexes cost one byte each
        buf = io.BytesIO()
        write_index_vector(buf, [(0, t, 0) for t in range(100)])
        # "<I1V> " + 5-byte count + 100 single bytes
        assert len(buf.getvalue()) == 6 + 5 + 100


class TestSupervisionRoundTrip:
    def test_standard(self):
        chunks, tree, _ = setup_chunks(num_chunks=2)
        merged = merge_supervision_fsts(chunks, 6)
        sup = KaldiSupervision(
            weight=1.0,
            num_sequences=2,
            frames_per_sequence=6,
            label_dim=tree.num_pdfs,
            fst=merged,
        )
        buf = io.BytesIO()
        write_supervision(buf, sup)
        buf.seek(0)
        got = read_supervision(buf)
        assert got.num_sequences == 2 and got.frames_per_sequence == 6
        assert got.label_dim == tree.num_pdfs and not got.is_e2e
        assert got.fst.num_states == merged.num_states
        assert got.fst.num_arcs == merged.num_arcs
        for s in range(merged.num_states):
            for a, b in zip(merged.arcs(s), got.fst.arcs(s)):
                assert (a.label, a.dst) == (b.label, b.dst)
                assert a.weight == pytest.approx(b.weight, abs=1e-6)

    def test_e2e(self):
        chunks, tree, _ = setup_chunks(num_chunks=2, normalize=False)
        sup = KaldiSupervision(
            weight=0.5,
            num_sequences=2,
            frames_per_sequence=6,
            label_dim=tree.num_pdfs,
            e2e_fsts=chunks,
        )
        buf = io.BytesIO()
        write_supervision(buf, sup)
        buf.seek(0)
        got = read_supervision(buf)
        assert got.is_e2e and len(got.e2e_fsts) == 2
        assert got.weight == pytest.approx(0.5)
        for orig, back in zip(chunks, got.e2e_fsts):
            assert back.num_arcs == orig.num_arcs


class TestMergeSplit:
    def test_split_is_exact(self):
        """Sum of per-sequence numerator log-probs is invariant under
        merge + split (the objf-relevant exactness property)."""
        T = 6
        chunks, tree, _ = setup_chunks(num_chunks=4, T=T, seed=3)
        merged = merge_supervision_fsts(chunks, T)
        pieces = split_merged_supervision_fst(merged, 4, T)
        rng = np.random.default_rng(11)
        for trial in range(3):
            y = rng.normal(size=(T, tree.num_pdfs))
            orig = sum(total_logprob(c, y) for c in chunks)
            split = sum(total_logprob(p, y) for p in pieces)
            assert split == pytest.approx(orig, abs=1e-5)

    def test_split_label_sequences_preserved(self):
        T = 6
        chunks, _, _ = setup_chunks(num_chunks=3, T=T, seed=4)
        merged = merge_supervision_fsts(chunks, T)
        pieces = split_merged_supervision_fst(merged, 3, T)
        for orig, piece in zip(chunks, pieces):
            p0 = {labels for labels, _ in enumerate_paths(orig)}
            p1 = {labels for labels, _ in enumerate_paths(piece)}
            assert p0 == p1

    def test_single_sequence_passthrough(self):
        chunks, _, _ = setup_chunks(num_chunks=1)
        assert split_merged_supervision_fst(chunks[0], 1, 6) == [chunks[0]]

    def test_non_merged_fst_rejected(self):
        # an FST whose boundary states differ structurally must be refused
        bad = Fst()
        bad.add_states(5)
        bad.add_arc(0, 1, 0.0, 1)
        bad.add_arc(0, 2, 0.0, 2)
        bad.add_arc(1, 1, 0.0, 3)
        bad.add_arc(2, 2, -0.5, 4)  # different label structure at depth 1
        bad.add_arc(1, 2, 0.0, 4)
        bad.set_final(3)
        bad.set_final(4)
        with pytest.raises(ValueError, match="disagree"):
            split_merged_supervision_fst(bad, 2, 1)


class TestExampleRoundTrip:
    def make_example(self, B=3, T=6, fsf=3, seed=5, with_ivector=False):
        chunks, tree, graph = setup_chunks(num_chunks=B, T=T, seed=seed)
        rng = np.random.default_rng(seed + 1)
        T_in = T * fsf + 4  # +left/right acoustic context
        feats = rng.standard_normal((B, T_in, 8)).astype(np.float32)
        ivecs = (
            rng.standard_normal((B, 5)).astype(np.float32) if with_ivector else None
        )
        eg = make_chain_example(
            feats,
            chunks,
            label_dim=tree.num_pdfs,
            frame_subsampling_factor=fsf,
            left_context=2,
            ivectors=ivecs,
        )
        return eg, chunks, tree, graph, feats, ivecs

    @pytest.mark.parametrize("compress", [False, True])
    def test_binary_roundtrip(self, compress):
        eg, *_ = self.make_example(with_ivector=True)
        buf = io.BytesIO()
        write_chain_example(buf, eg, compress=compress)
        buf.seek(0)
        got = read_chain_example(buf)
        assert [i.name for i in got.inputs] == ["input", "ivector"]
        assert got.outputs[0].name == "output"
        tol = 0.05 if compress else 1e-6
        np.testing.assert_allclose(
            got.io("input").features, eg.io("input").features, atol=tol
        )
        assert got.io("input").indexes == eg.io("input").indexes
        sup = got.outputs[0].supervision
        assert sup.num_sequences == 3 and sup.frames_per_sequence == 6

    def test_ark_roundtrip_with_scp(self, tmp_path):
        eg, *_ = self.make_example()
        ark = str(tmp_path / "cegs.1.ark")
        scp = str(tmp_path / "cegs.1.scp")
        write_cegs_ark(ark, {"eg-0": eg, "eg-1": eg}, scp_path=scp)
        keys = [k for k, _ in iter_cegs_ark(ark)]
        assert keys == ["eg-0", "eg-1"]
        lines = open(scp).read().splitlines()
        assert len(lines) == 2 and lines[0].startswith("eg-0 ")

    def test_example_to_batch_matches_direct_compile(self):
        """The interchange gate: converting a merged cegs record yields the
        same objf as compiling the original per-sequence FSTs directly."""
        eg, chunks, tree, graph, feats, _ = self.make_example(B=4, seed=7)
        buf = io.BytesIO()
        write_chain_example(buf, eg)
        buf.seek(0)
        batch = example_to_batch(read_chain_example(buf))
        assert batch.feats.shape == feats.shape
        np.testing.assert_allclose(batch.feats, feats, atol=1e-6)

        direct = pad_and_stack_supervisions(
            [compile_supervision(c, tree.num_pdfs) for c in chunks]
        )
        rng = np.random.default_rng(13)
        y = rng.normal(size=(6, tree.num_pdfs))
        num_direct = sum(
            oracle.num_forward_backward(
                compile_supervision(c, tree.num_pdfs), y
            )[0]
            for c in chunks
        )
        num_cegs = 0.0
        for b in range(4):
            sup_b = compile_supervision(
                split_merged_supervision_fst(
                    eg.outputs[0].supervision.fst, 4, 6
                )[b],
                tree.num_pdfs,
            )
            num_cegs += oracle.num_forward_backward(sup_b, y)[0]
        assert num_cegs == pytest.approx(num_direct, abs=1e-4)
        assert direct.in_src.shape[0] == batch.sup.in_src.shape[0] == 4

    def test_ivector_appended(self):
        eg, *_rest = self.make_example(with_ivector=True)
        batch = example_to_batch(eg)
        assert batch.feats.shape[2] == 8 + 5
        batch2 = example_to_batch(eg, append_ivector=False)
        assert batch2.feats.shape[2] == 8

    def test_online_ivector_nearest_row(self):
        """Egs made with --online-ivector-period carry several ivector rows
        per sequence; Kaldi selects the nearest-t row per frame."""
        from torchain_tpu.data.cegs import NnetIo

        eg, *_rest = self.make_example(B=3, T=6, with_ivector=True)
        rng = np.random.default_rng(11)
        rows = rng.standard_normal((3, 2, 5)).astype(np.float32)
        eg.inputs = [i for i in eg.inputs if i.name != "ivector"] + [
            NnetIo(
                name="ivector",
                indexes=[(n, t, 0) for n in range(3) for t in (0, 12)],
                features=rows.reshape(6, 5),
            )
        ]
        batch = example_to_batch(eg)
        ivec = batch.feats[:, :, 8:]
        in_ts = np.array(sorted({i[1] for i in eg.io("input").indexes}))
        want_row1 = np.abs(in_ts - 12) < np.abs(in_ts - 0)
        for n in range(3):
            for ti, use1 in enumerate(want_row1):
                np.testing.assert_array_equal(ivec[n, ti], rows[n, 1 if use1 else 0])

    def test_trains_one_step(self):
        """VERDICT r2 'Done' gate: a cegs record trains one step."""
        import jax
        import jax.numpy as jnp

        from torchain_tpu.ops import (
            ChainLossOptions,
            DeviceDenGraph,
            DeviceSupervision,
            chain_loss,
        )

        eg, chunks, tree, graph, feats, _ = self.make_example(B=2, seed=9)
        batch = example_to_batch(eg)
        den = DeviceDenGraph.from_host(graph)
        sup = DeviceSupervision.from_host(batch.sup)
        B, T = 2, 6
        params = jnp.zeros((batch.feats.shape[2], tree.num_pdfs), jnp.float32)
        x = jnp.asarray(batch.feats[:, : T * 3 : 3, :])  # crude subsample

        def loss_fn(w):
            y = jnp.einsum("btf,fp->btp", x, w)
            return chain_loss(y, None, den, sup, ChainLossOptions())[0]

        loss, grad = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        assert np.isfinite(np.asarray(grad)).all()
        assert float(jnp.abs(grad).max()) > 0


class TestGoldenBytes:
    def test_golden_cegs_ark(self):
        """Committed fixture (tools/make_openfst_fixtures.py regenerates);
        guards the byte format between rounds."""
        egs = dict(iter_cegs_ark(str(FIXTURES / "golden_cegs.ark")))
        assert list(egs) == ["eg-golden"]
        eg = egs["eg-golden"]
        sup = eg.outputs[0].supervision
        assert sup.num_sequences == 2
        assert eg.io("input").features.shape[1] == 4

    def test_writer_reproduces_golden_bytes(self, tmp_path):
        eg = _golden_example()
        p = tmp_path / "golden_cegs.ark"
        write_cegs_ark(str(p), {"eg-golden": eg})
        assert p.read_bytes() == (FIXTURES / "golden_cegs.ark").read_bytes()


def _golden_example() -> NnetChainExample:
    """Deterministic tiny example for the golden fixture (do not change —
    the committed bytes pin this content)."""
    fst1 = Fst()
    fst1.add_states(3)
    fst1.add_arc(0, 1, -0.125, 1)
    fst1.add_arc(1, 2, -0.25, 2)
    fst1.set_final(2, -0.5)
    fst2 = Fst()
    fst2.add_states(3)
    fst2.add_arc(0, 2, -0.0625, 1)
    fst2.add_arc(1, 1, -0.375, 2)
    fst2.set_final(2, 0.0)
    T, fsf, B = 2, 3, 2
    T_in = T * fsf + 2
    feats = np.arange(B * T_in * 4, dtype=np.float32).reshape(B, T_in, 4) / 16.0
    return make_chain_example(
        feats,
        [fst1, fst2],
        label_dim=4,
        frame_subsampling_factor=fsf,
        left_context=1,
    )


class TestDatasetExport:
    """dataset_to_cegs + the egs CLI roles (get/copy/shuffle/merge/info)."""

    def _dataset(self, seed=0):
        from torchain_tpu.data import ChainDataset, synthetic_dataset
        from torchain_tpu.graphs import SupervisionOptions

        corpus = synthetic_dataset(
            num_utts=10, num_phones=8, feat_dim=12,
            utt_frames_out=(18, 24), seed=seed,
        )
        ds = ChainDataset(
            corpus.utts, corpus.tree, corpus.norm_fst,
            chunk_frames_out=15, left_context=6, right_context=6,
            sup_opts=SupervisionOptions(left_tolerance=2, right_tolerance=2),
        )
        return corpus, ds

    def test_export_features_match_loader(self, tmp_path):
        """Every exported sequence's feature rows are exactly one of the
        loader's own chunk-feature slices (same context, same padding)."""
        from torchain_tpu.data.cegs import batches_from_cegs, dataset_to_cegs

        corpus, ds = self._dataset()
        path = str(tmp_path / "egs.ark")
        n = dataset_to_cegs(ds, path, batch_size=4)
        assert n >= 1
        loader_feats = {}
        for ui, c0, t, *_rest in ds.chunks:
            f = ds._chunk_feats(ds.utts[ui], c0, t)
            loader_feats.setdefault(f.shape, []).append(f)
        n_seq = 0
        for _key, batch in batches_from_cegs(path):
            for b in range(batch.feats.shape[0]):
                f = batch.feats[b]
                cands = loader_feats.get(f.shape, [])
                assert any(
                    np.allclose(f, c, atol=1e-6) for c in cands
                ), "exported features not produced by the loader"
                n_seq += 1
        assert n_seq == n * 4

    def test_export_matches_loader_supervision(self, tmp_path):
        """The exported supervision FSTs score identically to the loader's
        own compiled supervisions (same chunks, same normalization)."""
        from torchain_tpu.data.cegs import dataset_to_cegs, iter_cegs_ark
        from torchain_tpu.graphs.supervision import compile_supervision

        corpus, ds = self._dataset()
        path = str(tmp_path / "egs.ark")
        dataset_to_cegs(ds, path, batch_size=2)
        rng = np.random.default_rng(4)
        for _key, eg in iter_cegs_ark(path):
            sup = eg.outputs[0].supervision
            pieces = split_merged_supervision_fst(
                sup.fst, sup.num_sequences, sup.frames_per_sequence
            )
            y = rng.standard_normal(
                (sup.frames_per_sequence, corpus.tree.num_pdfs)
            ).astype(np.float64) * 0.2
            for piece in pieces:
                c = compile_supervision(piece, corpus.tree.num_pdfs)
                logp, _ = oracle.num_forward_backward(c, y)
                assert np.isfinite(logp)

    def test_cli_roundtrip(self, tmp_path):
        from torchain_tpu.cli.egs import main as egs_main
        from torchain_tpu.data.cegs import read_cegs_ark

        ark = str(tmp_path / "a.ark")
        rc = egs_main([
            "get", ark, "--synthetic", "--num-utts", "8", "--num-phones", "6",
            "--chunk-frames", "12", "--left-context", "4",
            "--right-context", "4", "--batch-size", "2",
        ])
        assert rc == 0
        orig = read_cegs_ark(ark)
        assert len(orig) >= 2
        shuf = str(tmp_path / "s.ark")
        assert egs_main(["shuffle", ark, shuf, "--seed", "1"]) == 0
        assert len(read_cegs_ark(shuf)) == len(orig)
        merged = str(tmp_path / "m.ark")
        assert egs_main(["merge", ark, merged, "--batch-size", "4"]) == 0
        m = read_cegs_ark(merged)
        assert all(
            eg.outputs[0].supervision.num_sequences == 4 for eg in m.values()
        )
        # total sequences conserved up to the trailing partial group
        n_in = sum(e.outputs[0].supervision.num_sequences for e in orig.values())
        n_out = sum(e.outputs[0].supervision.num_sequences for e in m.values())
        assert n_out == (n_in // 4) * 4
        sub = str(tmp_path / "c.ark")
        assert egs_main(["copy", ark, sub, "--subset", "1", "--prefix", "x-"]) == 0
        c = read_cegs_ark(sub)
        assert len(c) == 1 and next(iter(c)).startswith("x-")

    def test_merged_archive_trains_one_step(self, tmp_path):
        """The re-merged archive trains a step through example_to_batch +
        chain_loss: the end-to-end gate for the merge role."""
        import jax.numpy as jnp

        from torchain_tpu.cli.egs import main as egs_main
        from torchain_tpu.data.cegs import batches_from_cegs, dataset_to_cegs
        from torchain_tpu.ops import (
            ChainLossOptions, DeviceDenseDenGraph, DeviceSupervision, chain_loss,
        )

        corpus, ds = self._dataset(seed=2)
        ark = str(tmp_path / "a.ark")
        dataset_to_cegs(ds, ark, batch_size=2)
        merged = str(tmp_path / "m.ark")
        assert egs_main(["merge", ark, merged, "--batch-size", "4"]) == 0
        den = DeviceDenseDenGraph.from_host(corpus.dense_den)
        for _key, batch in batches_from_cegs(merged):
            sup = DeviceSupervision.from_host(batch.sup)
            B, T_in = batch.feats.shape[:2]
            T = batch.sup.num_frames
            y = jnp.zeros((B, T, corpus.tree.num_pdfs), jnp.float32)
            loss, aux = chain_loss(
                y, None, den, sup,
                ChainLossOptions(leaky_hmm_coefficient=0.1),
            )
            assert np.isfinite(float(loss))
            break
