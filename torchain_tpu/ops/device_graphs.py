"""Device-side (jnp) containers for the packed graphs.

These are the JAX pytree twins of the host-side `graphs.DenGraph` /
`graphs.DenseDenGraph` / `graphs.Supervision` (the moral equivalent of
Kaldi's DenominatorGraph CuArrays and NnetChainSupervision —
kaldi/src/chain/chain-den-graph.h, kaldi/src/nnet3/nnet-chain-example.h —
re-packed for XLA).  Static shape metadata lives in meta_fields so jit
caches on it."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from jax.tree_util import register_dataclass

from torchain_tpu.graphs.den_graph import DenGraph, DenseDenGraph
from torchain_tpu.graphs.supervision import Supervision


@register_dataclass
@dataclasses.dataclass
class DeviceDenGraph:
    """Sparse arc-list denominator graph for the log-semiring scan path.

    THREE sorted views of the same arc multiset so every segment reduction
    runs with indices_are_sorted=True: by dst (alpha), by src (beta), and
    by pdf (gamma accumulation)."""

    # view sorted by dst (forward: reduce over in-arcs)
    in_src: jnp.ndarray  # int32 [A]
    in_pdf: jnp.ndarray  # int32 [A]
    in_logw: jnp.ndarray  # float32 [A]
    in_dst: jnp.ndarray  # int32 [A] (sorted)
    # view sorted by src (backward beta: reduce over out-arcs)
    out_src: jnp.ndarray  # int32 [A] (sorted)
    out_dst: jnp.ndarray  # int32 [A]
    out_pdf: jnp.ndarray  # int32 [A]
    out_logw: jnp.ndarray  # float32 [A]
    # view sorted by pdf (gamma: reduce into pdf bins)
    pdf_pdf: jnp.ndarray  # int32 [A] (sorted)
    pdf_src: jnp.ndarray  # int32 [A]
    pdf_dst: jnp.ndarray  # int32 [A]
    pdf_logw: jnp.ndarray  # float32 [A]
    log_init: jnp.ndarray  # float32 [S]
    num_states: int = dataclasses.field(metadata=dict(static=True))
    num_pdfs: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def from_host(g: DenGraph) -> "DeviceDenGraph":
        in_dst = np.repeat(
            np.arange(g.num_states, dtype=np.int32), np.diff(g.in_offsets)
        )
        out_src = np.repeat(
            np.arange(g.num_states, dtype=np.int32), np.diff(g.out_offsets)
        )
        order = np.argsort(g.in_pdf, kind="stable")
        with np.errstate(divide="ignore"):
            log_init = np.log(g.initial_probs.astype(np.float64)).astype(np.float32)
        return DeviceDenGraph(
            in_src=jnp.asarray(g.in_src),
            in_pdf=jnp.asarray(g.in_pdf),
            in_logw=jnp.asarray(g.in_logw),
            in_dst=jnp.asarray(in_dst),
            out_src=jnp.asarray(out_src),
            out_dst=jnp.asarray(g.out_dst),
            out_pdf=jnp.asarray(g.out_pdf),
            out_logw=jnp.asarray(g.out_logw),
            pdf_pdf=jnp.asarray(g.in_pdf[order]),
            pdf_src=jnp.asarray(g.in_src[order]),
            pdf_dst=jnp.asarray(in_dst[order]),
            pdf_logw=jnp.asarray(g.in_logw[order]),
            log_init=jnp.asarray(log_init),
            num_states=int(g.num_states),
            num_pdfs=int(g.num_pdfs),
        )


@register_dataclass
@dataclasses.dataclass
class DeviceDenseDenGraph:
    """Dense Moore-machine denominator graph for the MXU matmul path.

    One-hot matrices E_mat [E, S] (expanded -> original segment sum) and
    P_mat [P, E] (pdf broadcast) turn every irregular gather/scatter of the
    recursion into a dense matmul."""

    V: jnp.ndarray  # float32 [S, E]
    E_mat: jnp.ndarray  # float32 [E, S] one-hot
    P_mat: jnp.ndarray  # float32 [P, E] one-hot
    init_orig: jnp.ndarray  # float32 [S]
    num_orig: int = dataclasses.field(metadata=dict(static=True))
    num_exp: int = dataclasses.field(metadata=dict(static=True))
    num_pdfs: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def from_host(d: DenseDenGraph, dtype=jnp.float32) -> "DeviceDenseDenGraph":
        E_mat = np.zeros((d.num_exp, d.num_orig), dtype=np.float32)
        E_mat[np.arange(d.real_exp), d.orig_of_exp[: d.real_exp]] = 1.0
        P_mat = np.zeros((d.num_pdfs, d.num_exp), dtype=np.float32)
        P_mat[d.pdf_of_exp[: d.real_exp], np.arange(d.real_exp)] = 1.0
        return DeviceDenseDenGraph(
            V=jnp.asarray(d.V, dtype=dtype),
            E_mat=jnp.asarray(E_mat, dtype=dtype),
            P_mat=jnp.asarray(P_mat, dtype=dtype),
            init_orig=jnp.asarray(d.initial_probs),
            num_orig=int(d.num_orig),
            num_exp=int(d.num_exp),
            num_pdfs=int(d.num_pdfs),
        )


#: dense-path budget for the transition matrix V [S, E] in bytes.
#: Measured on TPU v5e: with V at 37 MB the dense/MXU path runs the full
#: step in ~0.8-1 ms (XLA keeps the loop-invariant V on-chip); at 101 MB
#: it falls off a cliff (50 ms den-only) and the sparse log-semiring scan
#: wins ~2x (23 ms) — BENCH_NOTES.md.  The chain topology guarantees
#: E = 2S (every state has exactly two in-pdf classes), so V bytes =
#: 8*S^2*4.
DENSE_V_BYTES_THRESHOLD = 48 * 1024 * 1024

#: de Bruijn lift budget: fall back to sparse/dense paths beyond this many
#: contexts (residual memory is ~2 * T * B * C * 4 bytes; 200k contexts at
#: B=64 T=50 is ~5 GB of HBM residuals — alpha checkpointing shrinks this)
DEBRUIJN_MAX_CONTEXTS = 200_000


def auto_den_graph(
    host_graph,
    pad_to: int = 128,
    max_v_bytes: int | None = None,
    phone_lm=None,
    tree=None,
    topo=None,
    max_contexts: int | None = None,
    batch_hint: int = 64,
    data_shards: int = 1,
):
    """Pick the TPU-appropriate denominator representation.

    Preference order:
      1. VMEM-resident slot-dense Pallas kernel (ops/den_resident.py) on a
         real TPU backend, whenever the slot matrix fits VMEM (bf16 past
         the f32 budget) — the production fast path: 9.1 ms den fwd-bwd at
         the 4-gram left-biphone graph vs 71.7 ms for the sparse scan
         (B=64, T=50, v5e; BENCH_NOTES.md round 2).
      2. de Bruijn lift (gather-free dense recursion, ops/den_debruijn.py)
         when the phone LM + tree are provided, the LM is truncation-
         estimated, and the context space fits the budget.
      3. dense Moore factorization (MXU matmuls) while V fits on chip.
      4. sparse CSR log-semiring scan (fully general fallback).

    `data_shards` declares the data-parallel factor the training step
    will run with.  With data_shards > 1 the resident Pallas path is
    still selected (sized against the PER-SHARD batch) because the loss
    dispatcher routes multi-device execution through the shard_map
    wrapper (ops/sharded.py): each chip runs the single-chip kernel on
    its own batch shard.  Only the undeclared case — multiple devices
    visible but data_shards left at 1 — falls back to the einsum-based
    dense path, which GSPMD partitions cleanly on the batch axis (a
    Pallas custom call under plain GSPMD would be all-gathered and
    replicated on every chip: correct but scaling-destroying).
    """
    import jax as _jax

    declared = data_shards > 1
    single = data_shards <= 1 and len(_jax.devices()) == 1
    if _jax.default_backend() == "tpu" and (single or declared):
        from torchain_tpu.ops import den_resident

        try:
            gr = den_resident.DeviceResidentDenGraph.from_host(
                host_graph, pad_to=pad_to
            )
            # a batch too big for one pass runs batch-chunked (grid
            # (B/chunk, T), V still resident) — only a graph whose
            # 1-sequence working set exceeds VMEM falls through.  Under
            # data parallelism the kernel sees the per-shard batch.
            per_shard = max(1, batch_hint // max(1, data_shards))
            if den_resident.batch_chunk(gr, per_shard) > 0:
                return gr
        except ValueError:
            pass  # fall through to the XLA paths
    # the de Bruijn lift exists for the MXU (gather-free dense recursion);
    # on the CPU backend its XLA lowering compiles pathologically slowly
    # (>10 min for a T=30 toy train step vs seconds for dense/scan), so
    # auto-selection considers it on TPU only — explicit construction via
    # DeviceDeBruijnDenGraph.from_host stays available everywhere
    if (
        phone_lm is not None
        and tree is not None
        and _jax.default_backend() == "tpu"
    ):
        if getattr(phone_lm, "debruijn_compatible", False):
            from torchain_tpu.graphs.debruijn import make_debruijn_den_graph
            from torchain_tpu.graphs.topology import ChainTopology
            from torchain_tpu.ops.den_debruijn import DeviceDeBruijnDenGraph

            order = getattr(phone_lm, "ngram_order")
            tail = 2 if (tree.context_dependent(0) or tree.context_dependent(1)) else 1
            m = max(order - 1, tail, 1)
            C = (tree.num_phones + 1) ** m
            limit = DEBRUIJN_MAX_CONTEXTS if max_contexts is None else max_contexts
            if C <= limit:
                dbj = make_debruijn_den_graph(
                    phone_lm, tree, topo or ChainTopology()
                )
                return DeviceDeBruijnDenGraph.from_host(dbj)
    from torchain_tpu.graphs.den_graph import make_dense_den_graph

    limit = DENSE_V_BYTES_THRESHOLD if max_v_bytes is None else max_v_bytes
    # size V BEFORE materializing it: E = unique (dst, pdf) pairs; a graph
    # far past the budget would otherwise exhaust host memory just to learn
    # it should use the sparse path
    S = host_graph.num_states
    dst = np.repeat(np.arange(S, dtype=np.int64), np.diff(host_graph.in_offsets))
    key = dst * host_graph.num_pdfs + host_graph.in_pdf.astype(np.int64)
    E = int(np.unique(key).shape[0])
    pad = lambda n: -(-n // pad_to) * pad_to
    if pad(S) * pad(E) * 4 <= limit:
        dense = make_dense_den_graph(host_graph, pad_to=pad_to)
        return DeviceDenseDenGraph.from_host(dense)
    # NOTE: the padded-table path (den_table.DeviceDenTableGraph) measured
    # 125x SLOWER than the segment scan at this scale on TPU v5e (its
    # [B, S, K] constant-index gathers lower pathologically); the segment
    # scan is the large-graph default
    return DeviceDenGraph.from_host(host_graph)


def _frame_vocab_tables(in_src, in_pdf, round_to=8, pad_to=None):
    """Per-frame pdf vocabulary for the gather-free numerator.

    For each (b, t) row the supervision references only a handful of
    distinct pdfs (the tolerance window's phones x pdf-classes), so the
    emission lookup can run over a tiny local vocabulary instead of the
    full [B, T, P] output: returns

      frame_vocab [B, T, W] int32 — the sorted distinct pdfs of each row
        (0-padded; unused slots harmlessly re-reference pdf 0),
      pdf_local   [B, T, S, K] int32 — each arc's index into its row's
        vocabulary (0 for pad arcs).

    W is the max row cardinality rounded up to `round_to` (or forced to
    `pad_to` for cross-process shape agreement)."""
    B, T, S, K = in_pdf.shape
    flat = in_pdf.reshape(B * T, S * K).astype(np.int64)
    valid = in_src.reshape(B * T, S * K) >= 0
    BIG = np.int64(1) << 40
    a = np.where(valid, flat, BIG)
    order = np.argsort(a, axis=1, kind="stable")
    s = np.take_along_axis(a, order, axis=1)
    new = np.ones_like(s, dtype=bool)
    new[:, 1:] = s[:, 1:] != s[:, :-1]
    new &= s < BIG
    rank_sorted = np.cumsum(new, axis=1) - 1  # rank among row uniques
    w_needed = int(max(1, new.sum(axis=1).max()))
    W = ((w_needed + round_to - 1) // round_to) * round_to
    if pad_to is not None:
        if w_needed > pad_to:
            raise ValueError(
                f"frame pdf vocabulary needs {w_needed} slots > "
                f"vocab cap {pad_to}"
            )
        W = pad_to
    vocab = np.zeros((B * T, W), dtype=np.int32)
    rows = np.broadcast_to(np.arange(B * T)[:, None], s.shape)
    vocab[rows[new], rank_sorted[new]] = s[new].astype(np.int32)
    local_sorted = np.where(s < BIG, np.maximum(rank_sorted, 0), 0)
    local = np.zeros_like(flat, dtype=np.int32)
    np.put_along_axis(local, order, local_sorted.astype(np.int32), axis=1)
    return vocab.reshape(B, T, W), local.reshape(B, T, S, K)


def frame_vocab_width(in_src, in_pdf) -> int:
    """Max distinct pdfs in any (b, t) supervision row (unrounded) — the
    quantity estimate_sup_caps aggregates for multi-host shape agreement."""
    B, T, S, K = in_pdf.shape
    flat = in_pdf.reshape(B * T, S * K).astype(np.int64)
    valid = in_src.reshape(B * T, S * K) >= 0
    BIG = np.int64(1) << 40
    s = np.sort(np.where(valid, flat, BIG), axis=1)
    new = np.ones_like(s, dtype=bool)
    new[:, 1:] = s[:, 1:] != s[:, :-1]
    new &= s < BIG
    return int(max(1, new.sum(axis=1).max()))


@register_dataclass
@dataclasses.dataclass
class DeviceSupervision:
    """Batched packed numerator supervision, SPLIT at the frame-0 /
    steady-state boundary (see graphs.supervision.Supervision for the
    host layout contract).

    Frame 0 concentrates the normalization FST's initial fan-in (up to
    ~50 arcs/state) while frames >= 1 need only 2-12 (arcs are
    left-packed per (b, t, s) row, so the static split is exact).  The
    r2 design stored full-K [B, T, S, K] tensors and sliced
    [..., :steady_arcs] ON DEVICE; r5 splits them HOST-side into a
    frame-0 triple [B, S, K] plus a steady triple [B, T-1, S, Kst] —
    identical kernels, but the H2D transfer and device residency shrink
    ~3-4x at production scale (55 -> 17 MB/batch), which matters because
    relay/host-mediated transfers burn host CPU the sustained loader
    needs (BENCH_NOTES r5).

    `frame_vocab`/`pdf_local*` are the per-frame pdf vocabulary tables
    for the gather-free numerator (ops/num_scan.py)."""

    in_src0: jnp.ndarray  # int16/int32 [B, S, K] (int16 when S fits)
    in_logw0: jnp.ndarray  # float32 [B, S, K]
    pdf_local0: jnp.ndarray  # int16/int32 [B, S, K]
    in_src_r: jnp.ndarray  # [B, T-1, S, Kst]
    in_logw_r: jnp.ndarray  # [B, T-1, S, Kst]
    pdf_local_r: jnp.ndarray  # [B, T-1, S, Kst]
    final_logw: jnp.ndarray  # float32 [B, S]
    weight: jnp.ndarray  # float32 [B]
    #: per-frame pdf vocabulary for the gather-free numerator (round 2):
    #: the [B, T, P] emission gather/scatter collapses to W-sized lookups
    frame_vocab: jnp.ndarray  # int32 [B, T, W]
    num_frames: int = dataclasses.field(metadata=dict(static=True))
    max_states: int = dataclasses.field(metadata=dict(static=True))
    max_arcs: int = dataclasses.field(metadata=dict(static=True))
    num_pdfs: int = dataclasses.field(metadata=dict(static=True))
    #: arc-slot width of the steady triple (frames >= 1), rounded
    steady_arcs: int = dataclasses.field(default=0, metadata=dict(static=True))
    #: optional per-frame DERIVATIVE weights [B, T] (deriv_weights
    #: semantics, [K] nnet-chain-training.cc ApplyDerivWeights): scale the
    #: output-derivative rows and the xent term, not the objf.  None =
    #: all-ones; only cegs interchange sets them.
    frame_weights: "jnp.ndarray | None" = None
    #: OPTIONAL kernel-layout steady tables [T-1, Kr, S, B] (int32/f32) —
    #: the exact block layout the resident numerator kernels consume
    #: (ops/num_resident.py: lanes = batch).  Populated by
    #: `with_kernel_tables()` for batches that are REPLAYED (the bench's
    #: batch replay; device-materialized epochs, data/materialize.py), so
    #: the per-step in-jit transposes disappear; None (the live-loader
    #: default) keeps the transpose in-step, where it runs once per fresh
    #: batch anyway.  NOTE the batch axis is LAST here — ops/sharded.py
    #: special-cases these fields' shard specs.
    src_k: "jnp.ndarray | None" = None
    pdf_local_k: "jnp.ndarray | None" = None
    logw_k: "jnp.ndarray | None" = None

    def with_kernel_tables(self) -> "DeviceSupervision":
        """A copy carrying the resident kernels' [T-1, Kr, S, B] int32/f32
        steady tables (one device transpose each, paid once)."""
        if self.in_src_r.shape[1] == 0:
            return self
        return dataclasses.replace(
            self,
            src_k=jnp.transpose(
                self.in_src_r.astype(jnp.int32), (1, 3, 2, 0)
            ),
            pdf_local_k=jnp.transpose(
                self.pdf_local_r.astype(jnp.int32), (1, 3, 2, 0)
            ),
            logw_k=jnp.transpose(self.in_logw_r, (1, 3, 2, 0)),
        )

    @staticmethod
    def from_host(s: Supervision) -> "DeviceSupervision":
        """From a batched (pad_and_stack_supervisions) or single supervision;
        a single one gets a leading batch dim of 1."""
        in_src = s.in_src if s.in_src.ndim == 4 else s.in_src[None]
        # in_pdf may be absent (stacked with materialize_pdf=False): the
        # gather-free scans consume only the precomputed tables, which
        # must then be present
        in_pdf = None
        if s.in_pdf is not None:
            in_pdf = s.in_pdf if s.in_pdf.ndim == 4 else s.in_pdf[None]
        in_logw = s.in_logw if s.in_logw.ndim == 4 else s.in_logw[None]
        final = s.final_logw if s.final_logw.ndim == 2 else s.final_logw[None]
        B = in_src.shape[0]
        pre_fv = getattr(s, "frame_vocab", None)
        pre_pl = getattr(s, "pdf_local", None)
        pre_need = getattr(s, "steady_need", None)
        cap_v = getattr(s, "vocab_cap", None)
        if (
            pre_fv is not None
            and pre_pl is not None
            and pre_need is not None
            and (cap_v is None or pre_fv.shape[-1] == cap_v)
        ):
            # tables precomputed at supervision-compile time (per chunk,
            # stacked by pad_and_stack_supervisions) — no per-batch sorting
            frame_vocab = pre_fv if pre_fv.ndim == 3 else pre_fv[None]
            pdf_local = pre_pl if pre_pl.ndim == 4 else pre_pl[None]
            if cap_v is None and frame_vocab.shape[-1] % 8:
                # single-chunk tables carry the unrounded W; round to 8 so
                # shapes match the batched/fallback derivation
                W8 = -(-frame_vocab.shape[-1] // 8) * 8
                pad = W8 - frame_vocab.shape[-1]
                frame_vocab = np.pad(frame_vocab, ((0, 0), (0, 0), (0, pad)))
            need = int(pre_need)
        else:
            if in_pdf is None:
                raise ValueError(
                    "supervision stacked with materialize_pdf=False but "
                    "without precomputed numerator tables; cannot derive "
                    "frame_vocab/pdf_local"
                )
            frame_vocab, pdf_local = _frame_vocab_tables(
                np.asarray(in_src), np.asarray(in_pdf),
                pad_to=getattr(s, "vocab_cap", None),
            )
            need = 1
            if in_src.shape[1] > 1:
                need = int(
                    max(1, (np.asarray(in_src[:, 1:]) >= 0).sum(-1).max())
                )
        K = in_src.shape[-1]
        steady = min(K, -(-need // 4) * 4)  # round to 4, capped at K
        cap = getattr(s, "steady_cap", None)
        if cap is not None:  # multi-host: forced cross-process agreement
            if need > cap:
                raise ValueError(
                    f"steady frames need {need} arc slots > steady cap {cap}"
                )
            steady = min(K, int(cap))
        # narrow index dtypes where ranges allow: in_src holds state slots
        # in [-1, S), pdf_local indexes the W-wide row vocab — int16 halves
        # the dominant H2D transfer terms; the scans compare against iota of
        # the array's own dtype, so no device-side conversion is needed
        if in_src.shape[2] <= np.iinfo(np.int16).max:
            in_src = np.asarray(in_src, dtype=np.int16)
        if frame_vocab.shape[-1] <= np.iinfo(np.int16).max:
            pdf_local = np.asarray(pdf_local, dtype=np.int16)
        # frame-0 / steady split (see class docstring): numpy slice-copies
        # here, so only ~1/4 of the full-K tensors ever reach the device
        in_src = np.asarray(in_src)
        in_logw = np.asarray(in_logw)
        pdf_local = np.asarray(pdf_local)
        return DeviceSupervision(
            in_src0=jnp.asarray(in_src[:, 0]),
            in_logw0=jnp.asarray(in_logw[:, 0]),
            pdf_local0=jnp.asarray(pdf_local[:, 0]),
            in_src_r=jnp.asarray(np.ascontiguousarray(in_src[:, 1:, :, :steady])),
            in_logw_r=jnp.asarray(np.ascontiguousarray(in_logw[:, 1:, :, :steady])),
            pdf_local_r=jnp.asarray(
                np.ascontiguousarray(pdf_local[:, 1:, :, :steady])
            ),
            final_logw=jnp.asarray(final),
            frame_vocab=jnp.asarray(frame_vocab),
            weight=jnp.broadcast_to(
                jnp.asarray(s.weight, dtype=jnp.float32), (B,)
            ),
            num_frames=int(s.num_frames),
            max_states=int(s.max_states),
            max_arcs=int(s.max_arcs),
            num_pdfs=int(s.num_pdfs),
            steady_arcs=steady,
            frame_weights=(
                None
                if getattr(s, "frame_weights", None) is None
                else jnp.asarray(s.frame_weights, dtype=jnp.float32)
            ),
        )
