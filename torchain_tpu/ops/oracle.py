"""Exact NumPy reference for the chain forward-backward computations.

Behavioral reference: kaldi/src/chain/chain-denominator.{h,cc}
(`DenominatorComputation`) and chain-numerator.{h,cc}
(`NumeratorComputation`).  This module is the REPO'S ground truth: float64,
log-space, no performance tricks.  Device kernels must match it; tests also
validate IT independently against brute-force path enumeration over unrolled
FSTs (see unrolled_den_fst below), so correctness does not rest on any
single implementation.

Leaky-HMM model (chain-denominator.h semantics): between every pair of
frames (and before frame 1 and after frame T) mass may "leak" through a
virtual state — from any state with coefficient `leaky`, back into any
state s' with probability initial_prob(s'):

    alpha'_t = L alpha_t,   L = I + leaky * init . 1^T
    alpha_{t+1}[s'] = sum_{arcs a into s'} alpha'_t[src_a] * w_a
                          * p_{t+1}[pdf_a]
    Z = 1^T L alpha_T

with alpha_0 = init and p = exp(nnet log-probs).  The occupancy identity
d(log Z)/d(y[t, j]) = gamma[t, j] (sum over arcs with pdf j of
alpha' . w . p . beta / Z) is what the backward kernels implement directly.
"""

from __future__ import annotations

import numpy as np

from torchain_tpu.fstkit import Fst, rm_epsilon, total_weight
from torchain_tpu.graphs.den_graph import DenGraph
from torchain_tpu.graphs.supervision import Supervision

NEG_INF = -np.inf


def _logsumexp(x: np.ndarray, axis=None) -> np.ndarray:
    m = np.max(x, axis=axis, keepdims=True)
    m_safe = np.where(np.isfinite(m), m, 0.0)
    with np.errstate(divide="ignore"):
        out = np.log(np.sum(np.exp(x - m_safe), axis=axis, keepdims=True)) + m_safe
    out = np.where(np.isfinite(m), out, m)  # all -inf stays -inf
    return np.squeeze(out, axis=axis) if axis is not None else float(out)


def _leak(log_alpha: np.ndarray, log_init: np.ndarray, leaky: float) -> np.ndarray:
    """log-space alpha' = alpha + leaky * init * sum(alpha)."""
    if leaky <= 0.0:
        return log_alpha
    tot = _logsumexp(log_alpha, axis=-1)
    return np.logaddexp(log_alpha, np.log(leaky) + log_init + tot)


def den_forward_backward(
    graph: DenGraph,
    log_probs: np.ndarray,  # [T, P] nnet log-prob outputs y
    leaky: float = 0.0,
) -> tuple[float, np.ndarray]:
    """Exact denominator forward-backward.

    Returns (log_Z, gamma[T, P]) with gamma[t, j] = d(log Z)/d(y[t, j]).
    All states are treated as final with probability one
    (chain-denominator.h convention)."""
    T, P = log_probs.shape
    if P != graph.num_pdfs:
        raise ValueError("log_probs pdf dim mismatch")
    S = graph.num_states
    y = log_probs.astype(np.float64)
    log_init = np.log(
        np.maximum(graph.initial_probs.astype(np.float64), 1e-300)
    )
    in_src = graph.in_src.astype(np.int64)
    in_pdf = graph.in_pdf.astype(np.int64)
    in_logw = graph.in_logw.astype(np.float64)
    in_dst = np.repeat(np.arange(S), np.diff(graph.in_offsets))

    # forward
    alphas = np.empty((T + 1, S))  # alpha-dash at each t (post-leak)
    a = _leak(log_init, log_init, leaky)
    alphas[0] = a
    for t in range(1, T + 1):
        arc_val = a[in_src] + in_logw + y[t - 1, in_pdf]
        nxt = np.full(S, NEG_INF)
        np.logaddexp.at(nxt, in_dst, arc_val)
        a = _leak(nxt, log_init, leaky)
        alphas[t] = a
    log_z = _logsumexp(alphas[T], axis=-1)

    # backward: beta'_t[s] = d Z / d alpha-dash_t[s]  (log-space, scaled)
    # backward order mirrors the forward transposed: alpha'_t = L M_t
    # alpha'_{t-1}  =>  b_{t-1} = M_t^T L^T b_t, so the leak pull-back (L^T)
    # happens BEFORE the arc pull-back, and occupancies use the post-L^T b.
    gamma = np.zeros((T, P))
    b = np.zeros(S)  # log of dZ/dalpha'_T = 1
    for t in range(T, 0, -1):
        if leaky > 0.0:
            tot = _logsumexp(log_init + b, axis=-1)
            btilde = np.logaddexp(b, np.log(leaky) + tot)
        else:
            btilde = b
        # occupancies of frame t emissions
        arc_post = (
            alphas[t - 1][in_src] + in_logw + y[t - 1, in_pdf] + btilde[in_dst]
        )
        np.add.at(gamma[t - 1], in_pdf, np.exp(arc_post - log_z))
        # pull back through the arcs of frame t
        pre = np.full(S, NEG_INF)
        np.logaddexp.at(pre, in_src, in_logw + y[t - 1, in_pdf] + btilde[in_dst])
        b = pre
    return float(log_z), gamma


def num_forward_backward(
    sup: Supervision,
    log_probs: np.ndarray,  # [T, P]
) -> tuple[float, np.ndarray]:
    """Exact numerator forward-backward over packed supervision tensors.

    Returns (log_prob, gamma[T, P]) with gamma = d(log_prob)/d(y)."""
    T, P = log_probs.shape
    if T != sup.num_frames or P != sup.num_pdfs:
        raise ValueError("shape mismatch with supervision")
    y = log_probs.astype(np.float64)
    S, K = sup.max_states, sup.max_arcs

    alphas = np.full((T + 1, S), NEG_INF)
    alphas[0, 0] = 0.0
    for t in range(T):
        src = sup.in_src[t].astype(np.int64)  # [S, K]
        mask = src >= 0
        vals = np.where(
            mask,
            alphas[t][np.maximum(src, 0)]
            + sup.in_logw[t]
            + y[t, sup.in_pdf[t].astype(np.int64)],
            NEG_INF,
        )
        alphas[t + 1] = _logsumexp(vals, axis=1)
    log_p = _logsumexp(alphas[T] + sup.final_logw.astype(np.float64), axis=-1)
    if not np.isfinite(log_p):
        return float(log_p), np.zeros((T, P))

    gamma = np.zeros((T, P))
    b = sup.final_logw.astype(np.float64).copy()  # log beta at frame T
    for t in range(T - 1, -1, -1):
        src = sup.in_src[t].astype(np.int64)
        mask = src >= 0
        pdf = sup.in_pdf[t].astype(np.int64)
        arc_post = np.where(
            mask,
            alphas[t][np.maximum(src, 0)]
            + sup.in_logw[t]
            + y[t, pdf]
            + b[:, None],
            NEG_INF,
        )
        np.add.at(gamma[t], pdf[mask], np.exp(arc_post[mask] - log_p))
        nb = np.full(S, NEG_INF)
        flat_src = np.maximum(src, 0)[mask]
        np.logaddexp.at(
            nb,
            flat_src,
            (sup.in_logw[t] + y[t, pdf] + b[:, None])[mask],
        )
        b = nb
    return float(log_p), gamma


# ---------------------------------------------------------------------------
# brute-force validation helpers (used by tests to validate THIS module)
# ---------------------------------------------------------------------------


def unrolled_den_fst(
    graph: DenGraph, log_probs: np.ndarray, leaky: float = 0.0
) -> Fst:
    """Unroll the denominator HMM over T frames into an acyclic FST whose
    total log-weight equals den_forward_backward's log_Z.  Leak transitions
    are materialized as epsilon arcs through explicit pre/post-leak state
    layers; emission log-probs ride on the arcs.  Exponential-free
    independent check of the oracle."""
    T, P = log_probs.shape
    S = graph.num_states
    log_init = np.log(np.maximum(graph.initial_probs.astype(np.float64), 1e-300))
    in_src = graph.in_src.astype(np.int64)
    in_pdf = graph.in_pdf.astype(np.int64)
    in_logw = graph.in_logw.astype(np.float64)
    in_dst = np.repeat(np.arange(S), np.diff(graph.in_offsets))

    fst = Fst()
    start = fst.add_state()  # 0

    def pre(t: int, s: int) -> int:
        return 1 + 2 * (t * S + s)

    def post(t: int, s: int) -> int:
        return 2 + 2 * (t * S + s)

    fst.add_states(2 * S * (T + 1))
    for s in range(S):
        fst.add_arc(start, 0, float(log_init[s]), pre(0, s))
    for t in range(T + 1):
        for s in range(S):
            fst.add_arc(pre(t, s), 0, 0.0, post(t, s))  # stay
            if leaky > 0.0:
                for s2 in range(S):
                    fst.add_arc(
                        pre(t, s),
                        0,
                        float(np.log(leaky) + log_init[s2]),
                        post(t, s2),
                    )
    for t in range(T):
        for a in range(in_src.shape[0]):
            fst.add_arc(
                post(t, int(in_src[a])),
                int(in_pdf[a]) + 1,
                float(in_logw[a] + log_probs[t, int(in_pdf[a])]),
                pre(t + 1, int(in_dst[a])),
            )
    for s in range(S):
        fst.set_final(post(T, s), 0.0)
    return fst


def brute_force_den_logz(
    graph: DenGraph, log_probs: np.ndarray, leaky: float = 0.0
) -> float:
    return total_weight(rm_epsilon(unrolled_den_fst(graph, log_probs, leaky)))
