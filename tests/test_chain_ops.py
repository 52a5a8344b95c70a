"""JAX chain kernels vs the NumPy oracle: den scan, den dense, num scan,
and the fused chain_loss custom VJP (config-1 milestone of BASELINE.json:
'chain loss fwd-bwd on a toy denominator graph, batch=4 CPU, allclose vs
reference')."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchain_tpu.fstkit import compose
from torchain_tpu.graphs import (
    ContextTree,
    PhoneLmOptions,
    SupervisionOptions,
    alignment_to_supervision_fst,
    compile_den_graph,
    compile_supervision,
    estimate_phone_lm,
    make_den_fst,
    make_dense_den_graph,
    make_normalization_fst,
)
from torchain_tpu.graphs.supervision import pad_and_stack_supervisions
from torchain_tpu.ops import (
    ChainLossOptions,
    DeviceDenGraph,
    DeviceDenseDenGraph,
    DeviceSupervision,
    chain_loss,
)
from torchain_tpu.ops import den_dense, den_scan, num_scan, oracle


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    num_phones = 3
    sents = [
        list(map(int, rng.integers(1, num_phones + 1, size=rng.integers(3, 8))))
        for _ in range(30)
    ]
    lm = estimate_phone_lm(sents, PhoneLmOptions(ngram_order=2, num_extra_lm_states=20))
    tree = ContextTree(num_phones)
    den_fst = make_den_fst(lm, tree)
    graph = compile_den_graph(den_fst, tree.num_pdfs)
    dense = make_dense_den_graph(graph, pad_to=8)
    norm = make_normalization_fst(den_fst, graph.initial_probs)

    B, T = 4, 8
    alis = []
    for b in range(B):
        sent = sents[b]
        durs = rng.integers(1, 3, size=len(sent))
        # trim to T frames total
        ali = []
        left = T
        for p, d in zip(sent, durs):
            d = int(min(d, left - (len(sent) - len(ali) - 1)))
            if d <= 0 or left <= 0:
                break
            ali.append((int(p), d))
            left -= d
        if left > 0:
            ali[-1] = (ali[-1][0], ali[-1][1] + left)
        alis.append(ali)
    sups = []
    for ali in alis:
        fst = alignment_to_supervision_fst(
            ali, tree, SupervisionOptions(left_tolerance=1, right_tolerance=1)
        )
        sups.append(compile_supervision(compose(fst, norm), tree.num_pdfs))
    batch = pad_and_stack_supervisions(sups)

    y = rng.normal(size=(B, T, tree.num_pdfs)).astype(np.float32) * 0.7
    return dict(
        graph=graph, dense=dense, tree=tree, sups=sups, batch=batch, y=y, B=B, T=T
    )


class TestDenScan:
    @pytest.mark.parametrize("leaky", [0.0, 0.1])
    def test_matches_oracle(self, setup, leaky):
        g = DeviceDenGraph.from_host(setup["graph"])
        y = jnp.asarray(setup["y"])
        log_z, alphas = jax.jit(den_scan.den_forward, static_argnums=2)(y, g, leaky)
        gamma = jax.jit(den_scan.den_backward, static_argnums=4)(
            y, g, log_z, alphas, leaky
        )
        for b in range(setup["B"]):
            oz, og = oracle.den_forward_backward(
                setup["graph"], setup["y"][b], leaky=leaky
            )
            assert float(log_z[b]) == pytest.approx(oz, abs=2e-4)
            np.testing.assert_allclose(np.asarray(gamma[b]), og, atol=2e-4)


class TestDenDense:
    @pytest.mark.parametrize("leaky", [0.0, 0.1])
    def test_matches_oracle(self, setup, leaky):
        g = DeviceDenseDenGraph.from_host(setup["dense"])
        y = jnp.asarray(setup["y"])
        log_z, res = jax.jit(den_dense.den_forward, static_argnums=2)(y, g, leaky)
        gamma = den_dense.den_backward(g, res, leaky)
        for b in range(setup["B"]):
            oz, og = oracle.den_forward_backward(
                setup["graph"], setup["y"][b], leaky=leaky
            )
            assert float(log_z[b]) == pytest.approx(oz, abs=2e-4)
            np.testing.assert_allclose(np.asarray(gamma[b]), og, atol=2e-4)

    def test_gamma_rows_sum_to_one(self, setup):
        g = DeviceDenseDenGraph.from_host(setup["dense"])
        y = jnp.asarray(setup["y"])
        log_z, res = den_dense.den_forward(y, g, 0.1)
        gamma = den_dense.den_backward(g, res, 0.1)
        np.testing.assert_allclose(
            np.asarray(gamma.sum(axis=-1)), 1.0, atol=1e-4
        )


class TestNumScan:
    def test_matches_oracle(self, setup):
        sup = DeviceSupervision.from_host(setup["batch"])
        y = jnp.asarray(setup["y"])
        log_p, alphas = jax.jit(num_scan.num_forward)(y, sup)
        gamma = jax.jit(num_scan.num_backward)(y, sup, log_p, alphas)
        for b in range(setup["B"]):
            op, og = oracle.num_forward_backward(setup["sups"][b], setup["y"][b])
            # padded batch shares S, K; oracle ran on per-chunk packing:
            # values must agree regardless of padding
            assert float(log_p[b]) == pytest.approx(op, abs=2e-4)
            np.testing.assert_allclose(np.asarray(gamma[b]), og, atol=2e-4)


class TestChainLoss:
    def test_gradients_match_occupancy_identity(self, setup):
        den = DeviceDenseDenGraph.from_host(setup["dense"])
        sup = DeviceSupervision.from_host(setup["batch"])
        y = jnp.asarray(setup["y"])
        opts = ChainLossOptions(
            l2_regularize=1e-3, leaky_hmm_coefficient=0.1, xent_regularize=0.0
        )

        def loss_fn(y):
            return chain_loss(y, None, den, sup, opts)[0]

        loss, grad = jax.jit(jax.value_and_grad(loss_fn))(y)
        assert np.isfinite(float(loss))
        # expected gradient: -(w*(gamma_num - gamma_den) - l2*y)/weight
        T, B = setup["T"], setup["B"]
        weight = B * T
        expected = np.zeros_like(setup["y"])
        for b in range(setup["B"]):
            _, gn = oracle.num_forward_backward(setup["sups"][b], setup["y"][b])
            _, gd = oracle.den_forward_backward(
                setup["graph"], setup["y"][b], leaky=0.1
            )
            expected[b] = -(gn - gd - 1e-3 * setup["y"][b]) / weight
        np.testing.assert_allclose(np.asarray(grad), expected, atol=2e-5)

    def test_finite_diff(self, setup):
        den = DeviceDenseDenGraph.from_host(setup["dense"])
        sup = DeviceSupervision.from_host(setup["batch"])
        y64 = setup["y"].astype(np.float64)
        opts = ChainLossOptions(leaky_hmm_coefficient=0.1)

        def loss_np(y):
            return float(chain_loss(jnp.asarray(y, dtype=jnp.float32), None, den, sup, opts)[0])

        grad = jax.grad(lambda y: chain_loss(y, None, den, sup, opts)[0])(
            jnp.asarray(setup["y"])
        )
        rng = np.random.default_rng(3)
        for _ in range(5):
            b = rng.integers(setup["B"])
            t = rng.integers(setup["T"])
            j = rng.integers(setup["graph"].num_pdfs)
            eps = 1e-2
            yp = y64.copy()
            yp[b, t, j] += eps
            ym = y64.copy()
            ym[b, t, j] -= eps
            fd = (loss_np(yp) - loss_np(ym)) / (2 * eps)
            assert float(grad[b, t, j]) == pytest.approx(fd, abs=3e-4)

    def test_xent_head(self, setup):
        den = DeviceDenseDenGraph.from_host(setup["dense"])
        sup = DeviceSupervision.from_host(setup["batch"])
        y = jnp.asarray(setup["y"])
        xent = jnp.asarray(setup["y"] * 0.5)
        opts = ChainLossOptions(leaky_hmm_coefficient=0.1, xent_regularize=0.1)
        (loss, aux), grads = jax.value_and_grad(
            lambda y, x: chain_loss(y, x, den, sup, opts), argnums=(0, 1), has_aux=True
        )(y, xent)
        assert np.isfinite(float(loss))
        assert float(aux["xent_objf"]) < 0.0
        # xent grad = -xent_scale * w * (gamma - softmax(xent)) / weight
        gx = np.asarray(grads[1])
        assert np.all(np.isfinite(gx))
        # per-frame xent grads sum to ~0 (gamma and softmax both sum to 1)
        np.testing.assert_allclose(gx.sum(axis=-1), 0.0, atol=1e-5)

    def test_objf_is_negative_and_bounded(self, setup):
        # num is a subset of den: objf <= 0 strictly (plus small leaky slack)
        den = DeviceDenseDenGraph.from_host(setup["dense"])
        sup = DeviceSupervision.from_host(setup["batch"])
        y = jnp.asarray(setup["y"])
        _, aux = chain_loss(y, None, den, sup, ChainLossOptions())
        assert float(aux["objf"]) < 0.1
        assert float(aux["num_failed"]) == 0.0

    def test_scan_and_dense_paths_agree(self, setup):
        y = jnp.asarray(setup["y"])
        sup = DeviceSupervision.from_host(setup["batch"])
        opts = ChainLossOptions(leaky_hmm_coefficient=0.05)
        outs = []
        for den in (
            DeviceDenseDenGraph.from_host(setup["dense"]),
            DeviceDenGraph.from_host(setup["graph"]),
        ):
            loss, aux = chain_loss(y, None, den, sup, opts)
            grad = jax.grad(lambda y: chain_loss(y, None, den, sup, opts)[0])(y)
            outs.append((float(loss), np.asarray(grad)))
        assert outs[0][0] == pytest.approx(outs[1][0], abs=1e-4)
        np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-5)


class TestDenTable:
    @pytest.mark.parametrize("leaky", [0.0, 0.1])
    def test_matches_oracle(self, setup, leaky):
        from torchain_tpu.ops import den_table

        g = den_table.DeviceDenTableGraph.from_host(setup["graph"])
        y = jnp.asarray(setup["y"])
        log_z, alphas = den_table.den_forward(y, g, leaky)
        gamma = den_table.den_backward(y, g, log_z, alphas, leaky)
        for b in range(setup["B"]):
            oz, og = oracle.den_forward_backward(
                setup["graph"], setup["y"][b], leaky=leaky
            )
            assert float(log_z[b]) == pytest.approx(oz, abs=2e-4)
            np.testing.assert_allclose(np.asarray(gamma[b]), og, atol=2e-4)

    def test_chain_loss_with_table_graph(self, setup):
        from torchain_tpu.ops import den_table

        den = den_table.DeviceDenTableGraph.from_host(setup["graph"])
        sup = DeviceSupervision.from_host(setup["batch"])
        y = jnp.asarray(setup["y"])
        opts = ChainLossOptions(leaky_hmm_coefficient=0.05)
        loss_t, _ = chain_loss(y, None, den, sup, opts)
        grad_t = jax.grad(lambda y: chain_loss(y, None, den, sup, opts)[0])(y)
        dense = DeviceDenseDenGraph.from_host(setup["dense"])
        loss_d, _ = chain_loss(y, None, dense, sup, opts)
        grad_d = jax.grad(lambda y: chain_loss(y, None, dense, sup, opts)[0])(y)
        assert float(loss_t) == pytest.approx(float(loss_d), abs=1e-4)
        np.testing.assert_allclose(np.asarray(grad_t), np.asarray(grad_d), atol=1e-5)


class TestBetaPullbackStability:
    """Regression for the r1 advisor finding: the numerator beta pullback
    must stabilize with a PER-SRC-SLOT max, not a frame-global max — with a
    global max any src state whose best in-arc weight is > ~88 nats below
    the frame maximum underflows to -inf in float32, silently zeroing its
    gamma contributions at earlier frames."""

    def test_frame_vocab_tables_index_every_arc(self):
        # the gather-free numerator routes every emission through the
        # per-frame pdf vocabulary; verify the vocabulary covers exactly
        # the valid arcs' pdfs and pdf_local round-trips each arc
        from torchain_tpu.ops.device_graphs import _frame_vocab_tables

        in_src = np.array([[[[0, 1], [0, -1]]]], dtype=np.int32)  # [1,1,2,2]
        in_pdf = np.array([[[[7, 2], [7, 9]]]], dtype=np.int32)
        vocab, local = _frame_vocab_tables(in_src, in_pdf, round_to=1)
        assert vocab.shape[:2] == (1, 1) and local.shape == in_pdf.shape
        # valid pdfs {7, 2} -> sorted vocabulary [2, 7]
        assert vocab[0, 0, 0] == 2 and vocab[0, 0, 1] == 7
        # each VALID arc's local index points at its pdf
        valid = in_src >= 0
        got = vocab[0, 0][local[0, 0]]
        np.testing.assert_array_equal(got[valid[0, 0]], in_pdf[0, 0][valid[0, 0]])
        # pad arcs harmlessly reference slot 0
        assert local[0, 0, 1, 1] == 0

    def test_huge_spread_gradients_match_oracle(self, setup):
        # supervision backward with an extreme-spread y: the float64 oracle
        # keeps every path; the fixed pullback must agree
        batch = setup["batch"]
        sup = DeviceSupervision.from_host(batch)
        rng = np.random.default_rng(7)
        y = rng.normal(size=setup["y"].shape).astype(np.float32)
        y[:, :, 0] += 150.0  # one pdf dominates every frame by ~150 nats
        yj = jnp.asarray(y)
        log_p, alphas = num_scan.num_forward(yj, sup)
        gamma = num_scan.num_backward(yj, sup, log_p, alphas)
        assert np.isfinite(np.asarray(gamma)).all()
        for b in range(setup["B"]):
            olp, og = oracle.num_forward_backward(setup["sups"][b], y[b])
            np.testing.assert_allclose(
                np.asarray(gamma[b]), og, atol=3e-4,
                err_msg="per-slot-stabilized beta pullback must match oracle",
            )


class TestPallasVocabKernels:
    """The TPU Pallas vocab gather/scatter kernels (num_scan._gather_vocab /
    _scatter_vocab) must agree with the XLA fallback.  On CPU they run in
    interpret mode (TORCHAIN_NUM_PALLAS=force), so keep shapes tiny."""

    def test_gather_and_backward_match_fallback(self, setup, monkeypatch):
        batch = setup["batch"]
        sup = DeviceSupervision.from_host(batch)
        yj = jnp.asarray(setup["y"])

        monkeypatch.setenv("TORCHAIN_NUM_PALLAS", "0")
        ys_ref = num_scan._gather_vocab(yj, sup)
        lp_ref, al_ref = num_scan.num_forward(yj, sup, ysmall=ys_ref)
        g_ref = num_scan.num_backward(yj, sup, lp_ref, al_ref, ysmall=ys_ref)

        monkeypatch.setenv("TORCHAIN_NUM_PALLAS", "force")
        ys_pl = num_scan._gather_vocab(yj, sup)
        np.testing.assert_allclose(
            np.asarray(ys_pl), np.asarray(ys_ref), atol=1e-6,
            err_msg="Pallas vocab gather must match take_along_axis",
        )
        g_pl = num_scan.num_backward(yj, sup, lp_ref, al_ref, ysmall=ys_pl)
        np.testing.assert_allclose(
            np.asarray(g_pl), np.asarray(g_ref), atol=1e-6,
            err_msg="Pallas vocab scatter must match the unique-index scatter",
        )


class TestResidentNumKernels:
    """The steady-frame resident Pallas kernels (ops/num_resident) must
    match the lax.scan path bit-for-bit in math (same formulation, f32).
    On CPU they run in interpret mode (TORCHAIN_NUM_RESIDENT=force)."""

    def _both(self, sup, yj, monkeypatch):
        monkeypatch.setenv("TORCHAIN_NUM_RESIDENT", "0")
        lp0, al0 = num_scan.num_forward(yj, sup)
        g0 = num_scan.num_backward(yj, sup, lp0, al0)
        monkeypatch.setenv("TORCHAIN_NUM_RESIDENT", "force")
        lp1, al1 = num_scan.num_forward(yj, sup)
        g1 = num_scan.num_backward(yj, sup, lp1, al1)
        return (lp0, al0, g0), (lp1, al1, g1)

    def test_matches_scan(self, setup, monkeypatch):
        sup = DeviceSupervision.from_host(setup["batch"])
        yj = jnp.asarray(setup["y"])
        (lp0, al0, g0), (lp1, al1, g1) = self._both(sup, yj, monkeypatch)
        np.testing.assert_allclose(
            np.asarray(lp1), np.asarray(lp0), atol=1e-5
        )
        a0, a1 = np.asarray(al0), np.asarray(al1)
        assert (np.isfinite(a0) == np.isfinite(a1)).all()
        fin = np.isfinite(a0)
        np.testing.assert_allclose(a1[fin], a0[fin], atol=1e-5)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-5)

    def test_invalid_sequence_zeroes_gamma(self, setup, monkeypatch):
        """A sequence whose supervision rejects the outputs (log_p = -inf)
        must produce exactly zero occupancies, matching the scan path's
        numeric-failure containment."""
        sup = DeviceSupervision.from_host(setup["batch"])
        yj = jnp.asarray(setup["y"])
        monkeypatch.setenv("TORCHAIN_NUM_RESIDENT", "force")
        lp, al = num_scan.num_forward(yj, sup)
        bad_lp = lp.at[1].set(jnp.nan)
        g = num_scan.num_backward(yj, sup, bad_lp, al)
        assert np.all(np.asarray(g)[1] == 0.0)
        assert np.isfinite(np.asarray(g)).all()

    def test_single_frame_skips_kernel(self, setup, monkeypatch):
        """T=1 has no steady frames; the resident path must not be hit."""
        sup_full = DeviceSupervision.from_host(setup["batch"])
        yj = jnp.asarray(setup["y"][:, :1])
        import dataclasses as _dc

        sup1 = _dc.replace(
            sup_full,
            in_src_r=sup_full.in_src_r[:, :0],
            in_logw_r=sup_full.in_logw_r[:, :0],
            pdf_local_r=sup_full.pdf_local_r[:, :0],
            frame_vocab=sup_full.frame_vocab[:, :1],
            num_frames=1,
        )
        monkeypatch.setenv("TORCHAIN_NUM_RESIDENT", "force")
        lp, al = num_scan.num_forward(yj, sup1)
        g = num_scan.num_backward(yj, sup1, lp, al)
        assert np.asarray(g).shape == yj.shape


class TestKernelLayoutTables:
    def test_pretransposed_matches_live(self, setup, monkeypatch):
        """with_kernel_tables (placement-time [T-1,Kr,S,B] tables) must be
        bit-equal to the in-step transpose path."""
        monkeypatch.setenv("TORCHAIN_NUM_RESIDENT", "force")
        sup = DeviceSupervision.from_host(setup["batch"])
        supk = sup.with_kernel_tables()
        assert supk.src_k is not None
        yj = jnp.asarray(setup["y"])
        lp0, al0 = num_scan.num_forward(yj, sup)
        g0 = num_scan.num_backward(yj, sup, lp0, al0)
        lp1, al1 = num_scan.num_forward(yj, supk)
        g1 = num_scan.num_backward(yj, supk, lp1, al1)
        np.testing.assert_array_equal(np.asarray(lp1), np.asarray(lp0))
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g0))
