"""Denominator forward-backward, v3: VMEM-resident Pallas kernel.

Behavioral reference: kaldi/src/chain/chain-denominator.{h,cc} +
chain-kernels.cu (probability space, per-frame "arbitrary scale"
renormalization, leaky HMM).  Numerics and scale bookkeeping mirror
ops/den_dense.py exactly (same Moore-machine recursion, oracle-tested);
what changes is the execution strategy:

  * the whole T-loop runs INSIDE one Pallas kernel (grid=(T,), sequential
    on TPU), so there is no per-frame XLA while-loop overhead;
  * the transition matrix V stays RESIDENT in VMEM across all T grid steps
    (this v5e accepts ~120 MiB of VMEM scratch/operands — tools/probe_vmem)
    — the fix for the r1 dense path falling off its HBM-residency cliff at
    V > 48 MB (BENCH_NOTES.md production-scale table);
  * the E-axis is laid out in K class-major SLOTS of S_pad columns each
    (slot e = (k, s): k-th distinct in-pdf of state s), so the Moore
    segment-sum (E_mat) and its transpose become K aligned slice-sums /
    concats instead of one-hot matmuls.  K = 2 (forward pdf + self-loop
    pdf); states entered through more distinct pdfs (backoff targets under
    aggressive LM pruning, tied trees) are clone-split in the packer;
  * the per-frame pdf broadcast (P_mat) and the slot->pdf gamma
    projection both run IN-KERNEL as one-hot matmuls against the
    resident [KS, P] table (round 3: the host-side pe gather used to
    materialize a [T, B, KS] stream plus a relayout copy for the forward
    and a transposed copy for the reversed-t backward — ~0.5 ms/step of
    HBM glue at trigram B=128); only p [T, B, P] and ah stream from HBM.

Per-frame cost is therefore two [B,S]x[S,K*S] MXU matmuls (fwd alpha, bwd
beta pullback; the backward reads the forward's stored normalized per-slot
alphas instead of recomputing them), with ~B*(3K+1)*S*4 bytes of HBM
traffic per frame.  At the production 4-gram
left-biphone graph (S~4k) V no longer fits VMEM in f32, so it is held in
bf16 with f32 accumulation — the same trade as TORCHAIN_DEN_PRECISION=
default on the XLA path (~1e-3 occupancy error, training-stable); smaller
graphs keep f32 end to end.
"""

from __future__ import annotations

import dataclasses
import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.tree_util import register_dataclass

from torchain_tpu.graphs.den_graph import DenGraph

#: explicit overrides (tests monkeypatch these; None = derive per device)
VMEM_BUDGET: "int | None" = None
F32_V_BUDGET: "int | None" = None
PE_INKERNEL_MAX_P: "int | None" = None

_MIB = 1024 * 1024

#: usable VMEM budget per device KIND (bytes).  "v5 lite" (this machine's
#: v5e) is MEASURED: tools/probe_vmem.py bisect accepted ~120 MiB of
#: kernel operands+scratch; 110 MiB leaves headroom for Mosaic's own
#: buffers.  Same-VMEM-class kinds (v5p/v6: 128 MiB architectural VMEM)
#: inherit the measured margin; small-VMEM generations get their
#: architectural size minus the proportional margin.  An unmatched kind
#: falls back conservatively — override with TORCHAIN_VMEM_BUDGET, or run
#: tools/probe_vmem.py on the new part and extend this table.
_VMEM_BUDGET_BY_KIND = (
    ("v5 lite", 110 * _MIB),  # measured (probe + production kernels)
    ("v5e", 110 * _MIB),
    ("v5p", 110 * _MIB),
    ("v5", 110 * _MIB),
    ("v6", 110 * _MIB),
    ("v4", 24 * _MIB),  # 32 MiB architectural VMEM
    ("v3", 12 * _MIB),  # 16 MiB
    ("v2", 12 * _MIB),
)
_FALLBACK_VMEM_BUDGET = 24 * _MIB

#: pe-expansion crossover (see inkernel_pe): the in-kernel one-hot matmul
#: costs 2*P*KS FLOP/frame-row vs ~10*KS bytes of stream+glue for the
#: host-side gather; the break-even P tracks the device's FLOP/byte
#: ratio.  1024 is MEASURED on this v5e (trigram P=80: 6.24 -> 5.81
#: ms/step; production P=1680: 11.4 -> 12.3 ms REGRESSION).  Scaled to
#: other kinds by their bf16-FLOPs/HBM-BW ratio relative to v5e
#: (~197 TFLOP/s / 819 GB/s): a part with more FLOPs per byte of HBM
#: should keep streaming to a higher P.
_PE_MAX_P_BY_KIND = (
    ("v5 lite", 1024),  # measured
    ("v5e", 1024),
    ("v5p", 1024),      # 459/2765 ~ 0.69x ratio; keep the measured value
    ("v6", 1536),       # ~918/1640 ~ 2.3x FLOPs/byte of v5e
    ("v4", 1024),
)
_FALLBACK_PE_MAX_P = 1024


@functools.lru_cache(maxsize=1)
def _device_kind() -> str:
    import jax as _jax

    try:
        return _jax.devices()[0].device_kind.lower()
    except Exception:  # pragma: no cover - backend init failure
        return "unknown"


def _by_kind(table, fallback: int) -> int:
    kind = _device_kind()
    for sub, val in table:
        if sub in kind:
            return val
    return fallback


def _disk_probe_cache() -> "int | None":
    """Result of a previously-run tools/probe_vmem.py --save for this
    device kind (repo-local cache; the probe costs minutes of relay
    compiles, so it is explicit, never automatic)."""
    import json
    import pathlib

    p = (
        pathlib.Path(__file__).resolve().parents[2]
        / ".cache"
        / "vmem_budget.json"
    )
    try:
        data = json.loads(p.read_text())
        v = data.get(_device_kind())
        return int(v) if v else None
    except Exception:
        return None


def vmem_budget() -> int:
    """Usable VMEM budget (bytes): explicit override > env > probed cache
    > device-kind table > conservative fallback."""
    if VMEM_BUDGET is not None:
        return VMEM_BUDGET
    env = _os.environ.get("TORCHAIN_VMEM_BUDGET")
    if env:
        return int(env)
    probed = _disk_probe_cache()
    if probed:
        return probed
    return _by_kind(_VMEM_BUDGET_BY_KIND, _FALLBACK_VMEM_BUDGET)


def f32_v_budget() -> int:
    """Keep V in f32 while it fits this many bytes; bf16 beyond.  Scales
    with the VMEM budget (the v5e-measured 68 MiB crossover is ~62% of
    its 110 MiB budget: V plus the slot one-hot and streams must still
    fit)."""
    if F32_V_BUDGET is not None:
        return F32_V_BUDGET
    env = _os.environ.get("TORCHAIN_RESIDENT_F32_V")
    if env:
        return int(env)
    return int(vmem_budget() * 68 / 110)


def pe_inkernel_max_p() -> int:
    if PE_INKERNEL_MAX_P is not None:
        return PE_INKERNEL_MAX_P
    env = _os.environ.get("TORCHAIN_PE_INKERNEL_MAX_P")
    if env:
        return int(env)
    return _by_kind(_PE_MAX_P_BY_KIND, _FALLBACK_PE_MAX_P)


def inkernel_pe(g) -> bool:
    return g.num_pdfs <= pe_inkernel_max_p()


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@register_dataclass
@dataclasses.dataclass
class DeviceResidentDenGraph:
    """Slot-dense denominator graph for the VMEM-resident Pallas path.

    Slot layout: expanded state e = k * S_pad + s; slot (k, s) receives all
    arcs into state s whose emission pdf is the k-th distinct in-pdf of s.
    Padding slots/states have zero V columns and pdf 0."""

    V: jnp.ndarray  # [S_pad, K*S_pad] f32 or bf16, transition probs
    slot_pdf: jnp.ndarray  # int32 [K*S_pad] pdf per slot
    slot_onehot: jnp.ndarray  # f32 [K*S_pad, P] one-hot of slot_pdf (zero rows for dead slots)
    init: jnp.ndarray  # f32 [1, S_pad] initial probs (stationary + boost)
    num_states: int = dataclasses.field(metadata=dict(static=True))  # S_pad
    real_states: int = dataclasses.field(metadata=dict(static=True))
    num_slots: int = dataclasses.field(metadata=dict(static=True))  # K
    num_pdfs: int = dataclasses.field(metadata=dict(static=True))

    @property
    def vmem_bytes(self) -> int:
        return int(self.V.size) * self.V.dtype.itemsize

    @staticmethod
    def from_host(
        g: DenGraph,
        pad_to: int = 128,
        dtype=None,
        max_slots: int = 2,
    ) -> "DeviceResidentDenGraph":
        S = g.num_states
        dst = np.repeat(np.arange(S, dtype=np.int64), np.diff(g.in_offsets))
        pdf = g.in_pdf.astype(np.int64)
        src = g.in_src.astype(np.int64)
        prob = np.exp(g.in_logw.astype(np.float64)).astype(np.float32)
        # k-th distinct (dst, pdf) pair per dst: states entered through more
        # than max_slots distinct pdfs (backoff-target states when the LM
        # pruning breaks bigram closure) are SPLIT into clones sharing the
        # original's out-arc row — the forward dynamics are unchanged
        # because clones of s carry identical outgoing rows and alpha mass
        # just distributes across them; only clone 0 carries s's initial
        # probability
        key = dst * (g.num_pdfs + 1) + pdf
        uniq_keys, inv = np.unique(key, return_inverse=True)
        uniq_dst = (uniq_keys // (g.num_pdfs + 1)).astype(np.int64)
        uniq_pdf = (uniq_keys % (g.num_pdfs + 1)).astype(np.int32)
        first_of_dst = np.searchsorted(uniq_dst, np.arange(S))
        slot_of_uniq = np.arange(uniq_keys.shape[0]) - first_of_dst[uniq_dst]
        K = min(int(slot_of_uniq.max()) + 1 if uniq_keys.size else 1, max_slots)

        # clone table: (dst, group_rank) -> (state_id, slot)
        clone_rank = slot_of_uniq // K  # which clone of dst
        uniq_slot = (slot_of_uniq % K).astype(np.int64)
        n_clones_of = np.zeros(S, dtype=np.int64)
        np.maximum.at(n_clones_of, uniq_dst, clone_rank + 1)
        n_clones_of = np.maximum(n_clones_of, 1)
        extra = n_clones_of - 1
        clone_base = S + np.concatenate([[0], np.cumsum(extra)[:-1]])
        S_tot = S + int(extra.sum())
        # state id of each unique (dst, group): clone 0 = the original
        uniq_state = np.where(
            clone_rank == 0, uniq_dst, clone_base[uniq_dst] + clone_rank - 1
        )

        S_pad = _round_up(S_tot, pad_to)
        KS = K * S_pad
        slot_pdf = np.zeros(KS, dtype=np.int32)
        slot_live = np.zeros(KS, dtype=bool)
        e_of_uniq = uniq_slot * S_pad + uniq_state
        slot_pdf[e_of_uniq] = uniq_pdf
        slot_live[e_of_uniq] = True

        V = np.zeros((S_pad, KS), dtype=np.float32)
        np.add.at(V, (src, e_of_uniq[inv]), prob)
        # clones replicate their original's outgoing row
        for s in np.flatnonzero(extra):
            for c in range(int(extra[s])):
                V[clone_base[s] + c] = V[s]

        onehot = np.zeros((KS, g.num_pdfs), dtype=np.float32)
        onehot[slot_live, slot_pdf[slot_live]] = 1.0

        init = np.zeros((1, S_pad), dtype=np.float32)
        init[0, :S] = g.initial_probs
        if dtype is None:
            dtype = (
                jnp.float32 if V.nbytes <= f32_v_budget() else jnp.bfloat16
            )
        return DeviceResidentDenGraph(
            V=jnp.asarray(V, dtype=dtype),
            slot_pdf=jnp.asarray(slot_pdf),
            slot_onehot=jnp.asarray(onehot),
            init=jnp.asarray(init),
            num_states=S_pad,
            real_states=S,
            num_slots=K,
            num_pdfs=int(g.num_pdfs),
        )


def fits_vmem(g: DeviceResidentDenGraph, batch: int) -> bool:
    """Conservative VMEM feasibility check for this graph + batch size."""
    S, KS = g.num_states, g.num_states * g.num_slots
    it = g.V.dtype.itemsize
    # resident: V [S, KS] + slot one-hot [KS, P] (in-kernel slot expansion
    # in BOTH kernels + the backward's gamma projection)
    resident = g.vmem_bytes + KS * g.num_pdfs * it
    if inkernel_pe(g):
        # double-buffered streams: p in + ah in/out (V.dtype), gamma (f32)
        stream = 2 * batch * (it * (g.num_pdfs + KS) + 4 * g.num_pdfs)
    else:
        # streamed pe [Bc, KS] + ah (V.dtype), gamma out (f32)
        stream = 2 * batch * (2 * it * KS + 4 * g.num_pdfs)
    scratch = 4 * batch * (S + KS + S)
    # live f32 [Bc, KS] temporaries of the backward body (pe/occupancies/
    # beta pullback operand): Mosaic stack-allocates these, and at the
    # production graph they pushed Bc=128 9 MB past the budget (round-3
    # compile OOM); the kernels' scoped limit carries 17 MB of headroom
    # over this conservative model (VMEM_BUDGET + 17 MiB, measured to
    # load at 120.75 MB used)
    temps = 4 * batch * KS * 3
    return resident + stream + scratch + temps <= vmem_budget()


def batch_chunk(g: DeviceResidentDenGraph, batch: int) -> int:
    """Largest divisor of `batch` whose per-chunk working set fits VMEM.

    Sequences are independent in the denominator recursion, so a batch too
    large for one kernel pass runs as a leading batch-grid dimension
    (grid = (B/chunk, T)) with V still resident across the whole grid —
    only the pe/ah/gamma stream blocks shrink.  A PARTIAL chunk (c < batch)
    puts c on the sublane axis of every stream block, so it must be
    8-divisible (Mosaic block rule — see the LANE comment); the full batch
    is always layout-legal since the blocks then cover the whole axis.
    Returns 0 if no legal chunk fits the budget (the graph itself is too
    big; callers fall back to the sparse scan)."""
    if fits_vmem(g, batch):
        return batch
    for c in range(batch - 1, 0, -1):
        if batch % c == 0 and c % 8 == 0 and fits_vmem(g, c):
            return c
    return 0


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


#: per-batch scalars ride as broadcast [B, LANE] tiles (Mosaic requires the
#: last two block dims be (8, 128)-divisible or full; a [T, B] stream with B
#: on lanes violates the sublane rule, and all-equal lanes let the kernel
#: recover the scalar with a max instead of a sub-lane slice)
LANE = 128


def _fwd_body(
    leaky, K, S, pe, v_ref, init_ref, alpha0_ref, logc_ref, ah_ref, carry_ref
):
    # grid = (B/Bc, T): t innermost so the carry is valid within a batch
    # block and re-initialized at each block's frame 0
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        carry_ref[...] = alpha0_ref[...]

    sh = carry_ref[...]
    if leaky > 0.0:
        sig = sh + leaky * jnp.sum(sh, axis=-1, keepdims=True) * init_ref[...]
    else:
        sig = sh
    h = jax.lax.dot_general(
        sig.astype(v_ref.dtype),
        v_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, KS]
    alpha = h * pe
    c = jnp.sum(alpha, axis=-1, keepdims=True)  # [B, 1]
    logc_ref[0] = jnp.broadcast_to(jnp.log(c), (c.shape[0], LANE))
    alpha_hat = alpha / c
    ah_ref[0] = alpha_hat.astype(ah_ref.dtype)
    nxt = alpha_hat[:, 0:S]
    for k in range(1, K):
        nxt = nxt + alpha_hat[:, k * S : (k + 1) * S]
    carry_ref[...] = nxt


def _fwd_kernel_inkernel(
    leaky: float,
    K: int,
    S: int,
    p_ref,  # [1, B, P] frame t emission probs per pdf (V.dtype)
    v_ref,  # [S, KS] resident
    oh_ref,  # [KS, P] resident slot->pdf one-hot (V.dtype)
    init_ref,  # [1, S] f32
    alpha0_ref,  # [B, S] f32 initial sigma_hat
    logc_ref,  # [1, B, LANE] out (broadcast lanes)
    ah_ref,  # [1, B, KS] out: normalized per-slot alpha of frame t
    carry_ref,  # scratch [Bc, S] f32
):
    # slot expansion IN-KERNEL (pe = p[slot_pdf] as a one-hot matmul):
    # streams [T, B, P] instead of the ~4.7x bigger [T, B, KS] pe and
    # kills its relayout copies (see _p_of); small-P graphs only
    pe = jax.lax.dot_general(
        p_ref[0], oh_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, KS]
    _fwd_body(
        leaky, K, S, pe, v_ref, init_ref, alpha0_ref, logc_ref, ah_ref, carry_ref
    )


def _fwd_kernel_stream(
    leaky: float,
    K: int,
    S: int,
    pe_ref,  # [1, B, KS] frame t emission probs per slot (V.dtype)
    v_ref,  # [S, KS] resident
    init_ref,  # [1, S] f32
    alpha0_ref,  # [B, S] f32 initial sigma_hat
    logc_ref,  # [1, B, LANE] out (broadcast lanes)
    ah_ref,  # [1, B, KS] out: normalized per-slot alpha of frame t
    carry_ref,  # scratch [Bc, S] f32
):
    _fwd_body(
        leaky, K, S, pe_ref[0].astype(jnp.float32), v_ref, init_ref,
        alpha0_ref, logc_ref, ah_ref, carry_ref,
    )


def _bwd_kernel(
    leaky: float,
    K: int,
    S: int,
    ik_pe: bool,  # static: first ref is p [1, B, P] (expand in-kernel) or
    #               pe [1, B, KS] (streamed), both in V.dtype, reversed t
    p_ref,
    ah_ref,  # [1, B, KS] normalized per-slot alpha of frame t (reversed)
    f_ref,  # [1, B, LANE] F_t = cumsum(logc + ymax), broadcast lanes (rev)
    ymax_ref,  # [1, B, LANE] (reversed)
    v_ref,  # [S, KS] resident
    oh_ref,  # [KS, P] resident slot->pdf one-hot (V.dtype)
    init_ref,  # [1, S]
    logz_ref,  # [B, LANE]
    gamma_ref,  # [1, B, P] out: per-frame pdf occupancies (reversed t)
    bh_ref,  # scratch [Bc, KS] f32
    g_ref,  # scratch [Bc, LANE] f32
):
    # grid = (B/Bc, T): reversed-t innermost, scratch reset per batch block
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        bh_ref[...] = jnp.ones_like(bh_ref)
        g_ref[...] = jnp.full_like(g_ref, float(np.log1p(leaky)) if leaky > 0.0 else 0.0)

    def col(tile):  # all-equal broadcast lanes -> [B, 1] scalar column
        return jnp.max(tile, axis=-1, keepdims=True)

    if ik_pe:
        # in-kernel slot expansion (see _fwd_kernel_inkernel/_p_of), kept
        # in V.dtype: pe only feeds the V^T matmul below, and the
        # production-scale kernel sits within ~3 MB of the VMEM budget —
        # every [B, KS] f32 temporary counts (round-3 compile OOM)
        pe = jax.lax.dot_general(
            p_ref[0], oh_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,  # Mosaic: acc must be 32-bit
        ).astype(v_ref.dtype)  # [B, KS]
    else:
        pe = p_ref[0]  # streamed pe, already [B, KS] in V.dtype
    ah = ah_ref[0].astype(jnp.float32)  # = (pe * (L sh_prev) @ V) / c_t
    bh = bh_ref[...]
    # scale folds the stored normalization back in:
    # ah_unnorm * bh * exp(F_{t-1} + ymax_t + G - logZ)
    #   = ah * bh * exp(F_t + G - logZ)        (F_t = F_{t-1} + ymax + logc)
    scale = jnp.exp(col(f_ref[0]) + col(g_ref[...]) - col(logz_ref[...]))  # [B, 1]
    occ = ah * bh * scale  # [B, KS] slot occupancies of frame t
    # slot -> pdf projection IN-KERNEL: the [B, KS] occupancies never
    # leave VMEM (the [T, B, KS] occ stream was the largest HBM term of
    # the backward at production scale; BENCH_NOTES round 2)
    gamma_ref[0] = jax.lax.dot_general(
        occ.astype(oh_ref.dtype), oh_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # beta pullback: v = (pe * bh) @ V^T, then leak^T, broadcast to slots
    w = (pe * bh.astype(pe.dtype)).astype(v_ref.dtype)
    v = jax.lax.dot_general(
        w, v_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, S]
    if leaky > 0.0:
        v = v + leaky * jnp.sum(v * init_ref[...], axis=-1, keepdims=True)
    d = jnp.max(v, axis=-1, keepdims=True)
    d = jnp.where(d > 0, d, 1.0)
    vn = v / d  # the K slot copies are identical: write slices, no
    for k in range(K):  # [B, KS] concat temporary (VMEM headroom)
        bh_ref[:, k * S : (k + 1) * S] = vn
    g_new = col(g_ref[...]) + col(ymax_ref[0]) + jnp.log(d)
    g_ref[...] = jnp.broadcast_to(g_new, g_ref.shape)


# ---------------------------------------------------------------------------
# host-facing forward / backward (den_dense-compatible signatures)
# ---------------------------------------------------------------------------


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _p_of(y, g: DeviceResidentDenGraph):
    """p = exp(y - ymax) [T, B, P] in V's dtype, plus ymax [B, T].

    The slot expansion pe = p[slot_pdf] happens IN-KERNEL as a one-hot
    matmul (p_frame @ oh^T, ~6% extra MXU work): the round-2 host-side
    gather materialized the [T, B, KS] pe stream (~4.7x bigger than y at
    production scale) plus a relayout copy for the forward kernel AND a
    transposed copy for the reversed-t backward — ~0.5 ms/step of pure
    HBM glue at trigram B=128 (round-3 trace: copy.257, fusion.2,
    broadcast_select around den_resident).  Dead slots get pe=0 from the
    one-hot's zero rows instead of p[:, 0] from the gather's slot_pdf=0
    padding — behaviorally identical, since every dead-slot consumer
    (alpha via V's zero columns, occupancies via ah=0) already vanishes."""
    yt = jnp.swapaxes(y, 0, 1)  # [T, B, P] — cheap: pre-expansion
    ymax_t = jax.lax.stop_gradient(jnp.max(yt, axis=-1))  # [T, B]
    # p rides in V's dtype: it only ever multiplies into V-dtype matmuls
    # (f32 accumulate), the same trade documented for the r2 pe stream
    p = jnp.exp(yt - ymax_t[..., None]).astype(g.V.dtype)  # [T, B, P]
    return p, ymax_t.T


def _pe_of(y, g: DeviceResidentDenGraph):
    """Host-side slot expansion for LARGE-P graphs (P > PE_INKERNEL_MAX_P,
    where the in-kernel one-hot matmul costs more FLOPs than the gather's
    stream+glue): pe [T, B, KS] in V.dtype, plus ymax [B, T].  The take
    runs on a flattened [T*B, P] view (the 3-D form made XLA insert a
    relayout copy before the kernel; BENCH_NOTES round 2)."""
    yt = jnp.swapaxes(y, 0, 1)  # [T, B, P]
    T, B, P = yt.shape
    ymax_t = jax.lax.stop_gradient(jnp.max(yt, axis=-1))  # [T, B]
    pp = jnp.exp(yt - ymax_t[..., None])  # [T, B, P]
    pe = (
        jnp.take(pp.reshape(T * B, P), g.slot_pdf, axis=-1)
        .astype(g.V.dtype)
        .reshape(T, B, -1)
    )  # [T, B, KS]
    return pe, ymax_t.T


def den_forward(
    y: jnp.ndarray,  # [B, T, P]
    g: DeviceResidentDenGraph,
    leaky: float = 0.0,
) -> tuple[jnp.ndarray, dict]:
    """Returns (log_z [B], residuals) — same contract as den_dense."""
    B, T, P = y.shape
    S, K = g.num_states, g.num_slots
    KS = K * S
    ik = inkernel_pe(g)
    if ik:
        x, ymax = _p_of(y, g)  # [T, B, P]
        kern = functools.partial(_fwd_kernel_inkernel, leaky, K, S)
    else:
        x, ymax = _pe_of(y, g)  # [T, B, KS]
        kern = functools.partial(_fwd_kernel_stream, leaky, K, S)
    alpha0 = jnp.broadcast_to(g.init, (B, S))

    Bc = batch_chunk(g, B) or B  # 0 -> best effort single pass
    NB = B // Bc
    x_spec = pl.BlockSpec((1, Bc, x.shape[-1]), lambda b, t: (t, b, 0))
    in_specs = [
        x_spec,
        pl.BlockSpec((S, KS), lambda b, t: (0, 0)),
    ]
    ins = [x, g.V]
    if ik:
        in_specs.append(pl.BlockSpec((KS, P), lambda b, t: (0, 0)))
        ins.append(g.slot_onehot.astype(g.V.dtype))
    in_specs += [
        pl.BlockSpec((1, S), lambda b, t: (0, 0)),
        pl.BlockSpec((Bc, S), lambda b, t: (b, 0)),
    ]
    ins += [g.init, alpha0]
    logc_t, ah = pl.pallas_call(
        kern,
        grid=(NB, T),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, Bc, LANE), lambda b, t: (t, b, 0)),
            pl.BlockSpec((1, Bc, KS), lambda b, t: (t, b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, LANE), jnp.float32),
            jax.ShapeDtypeStruct((T, B, KS), g.V.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((Bc, S), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_budget() + 17 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(*ins)

    logc = logc_t[:, :, 0]  # [T, B]
    log_z = jnp.sum(logc, axis=0) + jnp.sum(ymax, axis=-1)
    if leaky > 0.0:
        log_z = log_z + jnp.log1p(leaky)
    res = dict(
        resident=True, x=x, ymax=ymax, logc=logc, ah=ah, log_z=log_z
    )
    return log_z, res


def den_backward(
    g: DeviceResidentDenGraph,
    res: dict,
    leaky: float = 0.0,
) -> jnp.ndarray:
    """Returns gamma [B, T, P]; scale bookkeeping identical to den_dense."""
    x, ymax, logc = res["x"], res["ymax"], res["logc"]
    ah, log_z = res["ah"], res["log_z"]
    T, B, KS = ah.shape
    S, K = g.num_states, g.num_slots
    ik = inkernel_pe(g)

    F = jnp.cumsum(logc + ymax.T, axis=0)  # [T, B]
    tile = lambda x: jnp.broadcast_to(x[..., None], x.shape + (LANE,))

    nt = T
    rev3 = lambda b, t: (nt - 1 - t, b, 0)
    P = g.num_pdfs
    Bc = batch_chunk(g, B) or B
    NB = B // Bc
    kern = functools.partial(_bwd_kernel, leaky, K, S, ik)
    gamma = pl.pallas_call(
        kern,
        grid=(NB, T),
        in_specs=[
            pl.BlockSpec((1, Bc, x.shape[-1]), rev3),
            pl.BlockSpec((1, Bc, KS), rev3),
            pl.BlockSpec((1, Bc, LANE), rev3),
            pl.BlockSpec((1, Bc, LANE), rev3),
            pl.BlockSpec((S, KS), lambda b, t: (0, 0)),
            pl.BlockSpec((KS, P), lambda b, t: (0, 0)),
            pl.BlockSpec((1, S), lambda b, t: (0, 0)),
            pl.BlockSpec((Bc, LANE), lambda b, t: (b, 0)),
        ],
        out_specs=pl.BlockSpec((1, Bc, P), rev3),
        out_shape=jax.ShapeDtypeStruct((T, B, P), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((Bc, KS), jnp.float32),
            pltpu.VMEM((Bc, LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_budget() + 17 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(
        x,
        ah,
        tile(F),
        tile(ymax.T),
        g.V,
        g.slot_onehot.astype(g.V.dtype),
        g.init,
        jnp.broadcast_to(log_z[:, None], (B, LANE)),
    )  # [T, B, P] — the slot->pdf projection happened in-kernel
    return jnp.swapaxes(gamma, 0, 1)
