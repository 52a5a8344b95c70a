"""Training DIRECTLY from a completed Kaldi chain prep (merged cegs
archives + binary den.fst) through CegsDataset and the train CLI — the
reference's own example workflow ([R] example/train.py + src/io.cc)."""

import numpy as np
import pytest

from torchain_tpu.data import CegsDataset
from torchain_tpu.data.cegs import make_chain_example, write_cegs_ark
from torchain_tpu.fstkit.openfst_io import write_openfst

from tests.test_cegs import setup_chunks


def _kaldi_prep(tmp_path, n_archives=2, records_per=2, B=3, T=6, seed=0):
    """Simulate the artifacts a Kaldi system ships: binary den.fst +
    merged cegs archives.  Egs geometry matches TdnnfConfig(num_layers=2):
    context (2, 4) at fsf 3."""
    left, right, fsf = 2, 4, 3
    t_in = T * fsf + left + right
    rng = np.random.default_rng(seed)
    graph = tree = None
    paths = []
    for a in range(n_archives):
        egs = {}
        for r in range(records_per):
            chunks, tree, graph = setup_chunks(
                num_chunks=B, T=T, seed=seed + 13 * a + r
            )
            feats = rng.standard_normal((B, t_in, 8)).astype(np.float32)
            egs[f"eg-{a}-{r}"] = make_chain_example(
                feats,
                chunks,
                label_dim=tree.num_pdfs,
                frame_subsampling_factor=fsf,
                left_context=left,
            )
        p = str(tmp_path / f"cegs.{a + 1}.ark")
        write_cegs_ark(p, egs)
        paths.append(p)
    den_path = str(tmp_path / "den.fst")
    # den.fst ships as a binary OpenFst acceptor over pdf+1 labels; our
    # make_den_fst output has exactly that form
    from torchain_tpu.graphs.den_graph import make_den_fst
    from torchain_tpu.graphs.phone_lm import PhoneLmOptions, estimate_phone_lm

    sents = [
        [int(x) for x in rng.integers(1, 4, size=rng.integers(2, 6))]
        for _ in range(30)
    ]
    lm = estimate_phone_lm(sents, PhoneLmOptions(ngram_order=2))
    den_fst = make_den_fst(lm, tree)
    olab = [a.label for _s, a in den_fst.all_arcs()]
    write_openfst(den_path, den_fst, olab, arctype="standard")
    return paths, den_path, tree, graph


class TestCegsDataset:
    def test_peek_and_batches(self, tmp_path):
        paths, _den, tree, _g = _kaldi_prep(tmp_path)
        ds = CegsDataset(paths)
        feat_dim, label_dim, bsz, t_out = ds.peek()
        assert (feat_dim, label_dim, bsz, t_out) == (8, tree.num_pdfs, 3, 6)
        batches = list(ds.batches(0, shuffle=False))
        assert len(batches) == 4
        for b in batches:
            assert b.feats.shape == (3, 24, 8)
            assert b.sup.num_frames == 6

    def test_glob_and_comma_paths(self, tmp_path):
        paths, _den, _t, _g = _kaldi_prep(tmp_path)
        ds = CegsDataset(str(tmp_path / "cegs.*.ark"))
        assert ds.paths == sorted(paths)
        ds2 = CegsDataset(",".join(paths))
        assert ds2.paths == paths
        with pytest.raises(FileNotFoundError):
            CegsDataset(str(tmp_path / "missing.ark"))

    def test_epoch_shuffle_is_deterministic(self, tmp_path):
        paths, *_ = _kaldi_prep(tmp_path)
        ds = CegsDataset(paths, seed=3)
        a = [b.feats.sum() for b in ds.batches(0, epoch=1)]
        b = [b.feats.sum() for b in ds.batches(0, epoch=1)]
        c = [b.feats.sum() for b in ds.batches(0, epoch=2)]
        assert a == b
        assert sorted(a) == sorted(c)

    def test_process_sharding_partitions_records(self, tmp_path):
        paths, *_ = _kaldi_prep(tmp_path)
        ds = CegsDataset(paths)
        caps = ds.estimate_sup_caps()
        got = []
        for pi in range(2):
            got += [
                float(b.feats.sum())
                for b in ds.batches(
                    0, shuffle=False, process_index=pi, process_count=2,
                    sup_caps=caps,
                )
            ]
        want = [float(b.feats.sum()) for b in ds.batches(0, shuffle=False)]
        assert sorted(got) == sorted(want)

    def test_process_sharding_equal_counts_nondivisible(self, tmp_path):
        """4 records over 3 processes: every process must yield exactly
        4 // 3 = 1 batch (NOT 2/1/1) — unequal counts hang the collective
        train step at epoch end in real multi-host runs."""
        paths, *_ = _kaldi_prep(tmp_path)
        ds = CegsDataset(paths)
        assert ds.count_records() == 4
        counts = [
            len(list(ds.batches(
                0, shuffle=False, process_index=pi, process_count=3)))
            for pi in range(3)
        ]
        assert counts == [1, 1, 1]

    def test_sup_caps_fix_shapes(self, tmp_path):
        paths, *_ = _kaldi_prep(tmp_path)
        ds = CegsDataset(paths)
        caps = ds.estimate_sup_caps()
        shapes = {
            b.sup.in_src.shape for b in ds.batches(0, sup_caps=caps)
        }
        assert len(shapes) == 1
        s = shapes.pop()
        assert s[2] == caps[0] and s[3] == caps[1]


def test_cli_trains_from_kaldi_prep(tmp_path):
    """The headline interchange gate: cli.train --cegs + --den-fst runs
    the full trainer on foreign artifacts with zero corpus stages."""
    from torchain_tpu.cli.train import main as train_main

    paths, den_path, tree, _g = _kaldi_prep(
        tmp_path, n_archives=2, records_per=3
    )
    res = train_main(
        [
            "--cegs", str(tmp_path / "cegs.*.ark"),
            "--den-fst", den_path,
            "--model", "tdnnf",
            "--hidden-dim", "32",
            "--bottleneck-dim", "8",
            "--num-layers", "2",
            "--epochs", "2",
        ]
    )
    assert res["steps"] == 12  # 2 epochs x 6 records
    assert np.isfinite(res["objf"])


# ---------------------------------------------------------------------------
# e2e (flat-start) cegs: records carrying per-sequence cyclic e2e_fsts
# ---------------------------------------------------------------------------


def _kaldi_e2e_prep(tmp_path, n_archives=2, records_per=2, B=3, T=6, seed=0):
    """Simulate a flat-start Kaldi prep: binary den.fst + merged cegs
    archives whose supervision is a counted list of cyclic e2e FSTs
    ([K] nnet-chain-example.h e2e branch)."""
    from torchain_tpu.graphs.den_graph import (
        compile_den_graph,
        make_den_fst,
        make_normalization_fst,
    )
    from torchain_tpu.graphs.e2e import make_e2e_supervision_fst
    from torchain_tpu.graphs.phone_lm import PhoneLmOptions, estimate_phone_lm
    from torchain_tpu.graphs.topology import ContextTree
    from torchain_tpu.data.cegs import make_e2e_chain_example

    left, right, fsf = 2, 4, 3
    t_in = T * fsf + left + right
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
    paths = []
    for a in range(n_archives):
        egs = {}
        for r in range(records_per):
            fsts = []
            while len(fsts) < B:
                n_seg = int(rng.integers(2, min(4, T)))
                phones = [int(p) for p in rng.integers(1, num_phones + 1, size=n_seg)]
                try:
                    fsts.append(make_e2e_supervision_fst(phones, tree, norm))
                except ValueError:
                    continue
            feats = rng.standard_normal((B, t_in, 8)).astype(np.float32)
            egs[f"eg-{a}-{r}"] = make_e2e_chain_example(
                feats,
                fsts,
                label_dim=tree.num_pdfs,
                frames_per_sequence=T,
                frame_subsampling_factor=fsf,
                left_context=left,
            )
        p = str(tmp_path / f"cegs.{a + 1}.ark")
        write_cegs_ark(p, egs)
        paths.append(p)
    den_path = str(tmp_path / "den.fst")
    from torchain_tpu.graphs.den_graph import make_den_fst as _mdf  # noqa: F401

    olab = [arc.label for _s, arc in den_fst.all_arcs()]
    write_openfst(den_path, den_fst, olab, arctype="standard")
    return paths, den_path, tree, graph


class TestE2eCegs:
    def test_roundtrip_batch(self, tmp_path):
        """Written e2e records read back into E2eSupervision batches the
        trainer dispatches on, byte-identical FST content."""
        from torchain_tpu.graphs.e2e import E2eSupervision

        paths, _den, tree, _g = _kaldi_e2e_prep(tmp_path, n_archives=1)
        ds = CegsDataset(paths)
        feat_dim, label_dim, bsz, t_out = ds.peek()
        assert (feat_dim, label_dim, bsz, t_out) == (8, tree.num_pdfs, 3, 6)
        batches = list(ds.batches(0, shuffle=False))
        assert len(batches) == 2
        for b in batches:
            assert isinstance(b.sup, E2eSupervision)
            assert b.sup.in_src.shape[0] == 3
            assert b.sup.num_frames == 6

    def test_e2e_loss_matches_in_process_pipeline(self, tmp_path):
        """chain objf computed from a read-back e2e record equals the objf
        of the directly-compiled supervision (write->read is lossless)."""
        import jax.numpy as jnp

        from torchain_tpu.graphs.e2e import (
            compile_e2e_supervision,
            pad_and_stack_e2e,
        )
        from torchain_tpu.data.cegs import example_to_batch, iter_cegs_ark
        from torchain_tpu.graphs.den_graph import make_dense_den_graph
        from torchain_tpu.ops import DeviceDenseDenGraph, chain_loss
        from torchain_tpu.ops.num_e2e import DeviceE2eSupervision

        paths, _den, tree, graph = _kaldi_e2e_prep(tmp_path, n_archives=1, records_per=1)
        key, eg = next(iter_cegs_ark(paths[0]))
        b = example_to_batch(eg)
        direct = pad_and_stack_e2e(
            [
                compile_e2e_supervision(f, 6, tree.num_pdfs)
                for f in eg.outputs[0].supervision.e2e_fsts
            ]
        )
        rng = np.random.default_rng(7)
        y = jnp.asarray(rng.standard_normal((3, 6, tree.num_pdfs)), jnp.float32)
        den = DeviceDenseDenGraph.from_host(make_dense_den_graph(graph, pad_to=8))
        r1 = chain_loss(y, None, den, DeviceE2eSupervision.from_host(b.sup))[1]
        r2 = chain_loss(y, None, den, DeviceE2eSupervision.from_host(direct))[1]
        np.testing.assert_allclose(
            float(r1["objf"]), float(r2["objf"]), rtol=1e-6
        )

    def test_cli_trains_from_e2e_prep(self, tmp_path):
        from torchain_tpu.cli.train import main as train_main

        paths, den_path, _tree, _g = _kaldi_e2e_prep(
            tmp_path, n_archives=2, records_per=2
        )
        res = train_main(
            [
                "--cegs", str(tmp_path / "cegs.*.ark"),
                "--den-fst", den_path,
                "--model", "tdnnf",
                "--hidden-dim", "32",
                "--bottleneck-dim", "8",
                "--num-layers", "2",
                "--epochs", "2",
            ]
        )
        assert res["steps"] == 8  # 2 epochs x 4 records
        assert np.isfinite(res["objf"])


def test_compute_prob_cli(tmp_path):
    """nnet3-chain-compute-prob role: objf over cegs archives with no
    updates; restores a trainer checkpoint when given one."""
    from torchain_tpu.cli.compute_prob import main as cp_main
    from torchain_tpu.cli.train import main as train_main

    paths, den_path, tree, _g = _kaldi_prep(tmp_path, n_archives=1, records_per=2)
    common = [
        "--cegs", paths[0], "--den-fst", den_path,
        "--model", "tdnnf", "--hidden-dim", "32",
        "--bottleneck-dim", "8", "--num-layers", "2",
    ]
    r0 = cp_main(common)
    assert np.isfinite(r0["objf"]) and not r0["restored"]
    assert r0["frames"] == 2 * 3 * 6  # records x B x T

    ck = str(tmp_path / "ck")
    train_main(common + ["--epochs", "3", "--checkpoint-dir", ck])
    r1 = cp_main(common + ["--checkpoint-dir", ck])
    assert r1["restored"]
    # the trained model must beat the random init it started from
    assert r1["objf"] > r0["objf"]


def test_deriv_weights_applied_and_ignorable(tmp_path):
    """Non-uniform deriv_weights now have real parity: they scale the
    chain-derivative rows exactly ([K] nnet-chain-training.cc
    ApplyDerivWeights), and --ignore-deriv-weights forces 1.0."""
    import jax
    import jax.numpy as jnp

    from torchain_tpu.cli.train import main as train_main
    from torchain_tpu.data.cegs import iter_cegs_ark, example_to_batch
    from torchain_tpu.graphs.den_graph import make_dense_den_graph
    from torchain_tpu.ops import (
        ChainLossOptions,
        DeviceDenseDenGraph,
        DeviceSupervision,
        chain_loss,
    )

    paths, den_path, tree, graph = _kaldi_prep(tmp_path, n_archives=1, records_per=1)
    _key, eg = next(iter_cegs_ark(paths[0]))
    dw = eg.outputs[0].deriv_weights
    ramp = np.linspace(0.5, 1.0, dw.size).astype(np.float32)
    eg.outputs[0].deriv_weights = ramp
    write_cegs_ark(paths[0], {"eg-0": eg})

    b_w = example_to_batch(eg)
    assert b_w.sup.frame_weights is not None
    np.testing.assert_allclose(
        b_w.sup.frame_weights.reshape(-1), ramp, atol=1e-6
    )
    b_i = example_to_batch(eg, ignore_deriv_weights=True)
    assert b_i.sup.frame_weights is None

    # gradient parity: dy rows scale by exactly the frame weights —
    # including the l2/oor regularizer components, which Kaldi adds into
    # nnet_output_deriv BEFORE ApplyDerivWeights scales the rows
    opts = ChainLossOptions(l2_regularize=1e-3)
    den = DeviceDenseDenGraph.from_host(make_dense_den_graph(graph, pad_to=8))
    rng = np.random.default_rng(5)
    y = jnp.asarray(rng.standard_normal((3, 6, tree.num_pdfs)), jnp.float32)
    g_w = jax.grad(
        lambda yy: chain_loss(
            yy, None, den, DeviceSupervision.from_host(b_w.sup), opts
        )[0]
    )(y)
    g_p = jax.grad(
        lambda yy: chain_loss(
            yy, None, den, DeviceSupervision.from_host(b_i.sup), opts
        )[0]
    )(y)
    fw = b_w.sup.frame_weights[:, :, None]
    np.testing.assert_allclose(
        np.asarray(g_w), np.asarray(g_p) * fw, atol=1e-6
    )

    args = [
        "--cegs", paths[0], "--den-fst", den_path,
        "--model", "tdnnf", "--hidden-dim", "32",
        "--bottleneck-dim", "8", "--num-layers", "2", "--epochs", "1",
    ]
    res = train_main(args)
    assert res["steps"] == 1 and np.isfinite(res["objf"])
    res = train_main(args + ["--ignore-deriv-weights"])
    assert res["steps"] == 1 and np.isfinite(res["objf"])
