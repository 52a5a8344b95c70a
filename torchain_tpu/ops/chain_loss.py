"""The chain (LF-MMI) objective with custom VJP — the public loss API.

Behavioral reference: kaldi/src/chain/chain-training.{h,cc}
(`ChainTrainingOptions`, `ComputeChainObjfAndDeriv`) and torchain's
`chain_loss` autograd Function + `ChainResults` accumulator
(SURVEY.md section 2.1, [R] torchain/functions.py):

    objf     = sum_b weight_b * (num_logprob_b - den_logprob_b)
    l2_term  = -0.5 * l2_regularize * ||y||^2
    oor_term = -out_of_range_regularize * sum relu(|y| - 30)^2   (soft
               penalty on out-of-range outputs; behavioral approximation of
               Kaldi's out-of-range handling)
    xent     = sum gamma_num . log_softmax(xent_output)  (occupancies are a
               constant target, Kaldi semantics)
    loss     = -(objf + l2_term + oor_term + xent_regularize * xent) / weight

Numeric-failure containment (chain-training.cc): sequences whose objective
or occupancies go non-finite get zero fwd-bwd gradients and a penalty
objective of -10 per frame; training continues.

The VJP never differentiates through the scans: the backward pass is the
beta recursion emitting occupancy gradients directly
(d objf / dy = weight * (gamma_num - gamma_den)).
"""

from __future__ import annotations

import dataclasses
import os as _os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from torchain_tpu.ops import (
    den_debruijn,
    den_dense,
    den_resident,
    den_scan,
    den_table,
    num_e2e,
    num_scan,
)
from torchain_tpu.ops.device_graphs import (
    DeviceDenGraph,
    DeviceDenseDenGraph,
    DeviceSupervision,
)
from torchain_tpu.ops.den_debruijn import DeviceDeBruijnDenGraph
from torchain_tpu.ops.den_resident import DeviceResidentDenGraph
from torchain_tpu.ops.den_table import DeviceDenTableGraph
from torchain_tpu.ops.num_e2e import DeviceE2eSupervision


@dataclasses.dataclass(frozen=True)
class ChainLossOptions:
    """Mirrors Kaldi ChainTrainingOptions (chain-training.h ~L40)."""

    l2_regularize: float = 0.0
    leaky_hmm_coefficient: float = 0.1
    xent_regularize: float = 0.0
    out_of_range_regularize: float = 0.01
    out_of_range_limit: float = 30.0
    #: penalty objf per frame substituted on numeric failure
    failure_penalty_per_frame: float = -10.0


def _zero_cot(x):
    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    return np.zeros(np.shape(x), dtype=jax.dtypes.float0)


def _tree_zero(tree):
    return jax.tree.map(_zero_cot, tree)


# ---------------------------------------------------------------------------
# core log-probs with custom VJP
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def chain_logprobs(y, den, sup, leaky):
    """Returns (num_logprob [B], den_logprob [B], gamma_num [B, T, P]).

    gamma_num (the numerator occupancies / xent targets) is exposed as a
    CONSTANT output: its cotangent is intentionally dropped in the VJP,
    matching Kaldi's treatment of xent_output_deriv as a fixed target."""
    out, _ = _chain_logprobs_fwd(y, den, sup, leaky)
    return out


def _use_pallas(den, B, T):
    """Opt-in (TORCHAIN_USE_PALLAS=1): measured on TPU v5e at chain scale,
    the fused Pallas kernels are not yet faster than the unrolled XLA scan
    (the per-frame matmuls are tiny and the fori_loop serializes), so the
    XLA path stays default; the kernels remain available and tested for
    larger-graph experiments."""
    import os

    if os.environ.get("TORCHAIN_USE_PALLAS", "0") != "1":
        return False
    from torchain_tpu.ops import den_pallas

    if jax.default_backend() == "cpu":
        return False
    return den_pallas.fits_vmem(den, B, T)


def _den_forward(y, den, leaky):
    if isinstance(den, DeviceResidentDenGraph):
        return den_resident.den_forward(y, den, leaky)
    if isinstance(den, DeviceDeBruijnDenGraph):
        return den_debruijn.den_forward(y, den, leaky)
    if isinstance(den, DeviceDenseDenGraph):
        if _use_pallas(den, y.shape[0], y.shape[1]):
            from torchain_tpu.ops import den_pallas

            return den_pallas.den_forward(y, den, leaky)
        return den_dense.den_forward(y, den, leaky)
    if isinstance(den, DeviceDenTableGraph):
        log_z, alphas = den_table.den_forward(y, den, leaky)
        return log_z, dict(alphas=alphas, table=True)
    every = den_scan.CHECKPOINT_EVERY
    T = y.shape[1]
    if every and T > every and T % every == 0:
        log_z, chks = den_scan.den_forward_checkpointed(y, den, leaky, every)
        return log_z, dict(chk=chks, every=every)
    log_z, alphas = den_scan.den_forward(y, den, leaky)
    return log_z, dict(alphas=alphas)


def _den_backward(y, den, leaky, log_z, res):
    if isinstance(den, DeviceResidentDenGraph):
        return den_resident.den_backward(den, res, leaky)
    if isinstance(den, DeviceDeBruijnDenGraph):
        return den_debruijn.den_backward(y, den, log_z, res, leaky)
    if isinstance(den, DeviceDenseDenGraph):
        if "pe" in res:  # produced by the Pallas forward
            from torchain_tpu.ops import den_pallas

            return den_pallas.den_backward(den, res, leaky)
        return den_dense.den_backward(den, res, leaky)
    if isinstance(den, DeviceDenTableGraph):
        return den_table.den_backward(y, den, log_z, res["alphas"], leaky)
    if "chk" in res:
        return den_scan.den_backward_checkpointed(
            y, den, log_z, res["chk"], leaky, res["every"]
        )
    return den_scan.den_backward(y, den, log_z, res["alphas"], leaky)


def _num_forward_backward(y, sup):
    """Dispatch on supervision flavor: frame-synchronous tolerance lattices
    (NumeratorComputation) vs cyclic e2e graphs
    (GenericNumeratorComputation)."""
    if isinstance(sup, DeviceE2eSupervision):
        ylocal = num_e2e._arc_emissions(y, sup)
        num_logp, alphas = num_e2e.e2e_forward(y, sup, ylocal=ylocal)
        gamma_num = num_e2e.e2e_backward(
            y, sup, num_logp, alphas, ylocal=ylocal
        )
    else:
        # one vocab gather shared by both passes (the per-index cost of
        # TPU gathers dominates at production scale; BENCH_NOTES round 2)
        ysmall = num_scan._gather_vocab(y, sup)
        num_logp, alphas = num_scan.num_forward(y, sup, ysmall=ysmall)
        gamma_num = num_scan.num_backward(
            y, sup, num_logp, alphas, ysmall=ysmall
        )
    return num_logp, gamma_num


def _chain_logprobs_fwd(y, den, sup, leaky):
    num_logp, gamma_num = _num_forward_backward(y, sup)
    den_logz, den_res = _den_forward(y, den, leaky)
    out = (num_logp, den_logz, gamma_num)
    residuals = (y, den, sup, den_logz, den_res, gamma_num)
    return out, residuals


def _chain_logprobs_bwd(leaky, residuals, cts):
    y, den, sup, den_logz, den_res, gamma_num = residuals
    g_num, g_den, _g_gamma_dropped = cts
    gamma_den = _den_backward(y, den, leaky, den_logz, den_res)
    # numeric-failure containment: zero the gradient of any sequence whose
    # occupancies went non-finite (chain-training.cc failure path, which
    # checks the summed nnet_output_deriv).  The check rides the COMBINED
    # tensor so the combine and the reduction fuse into one [B, T, P]
    # pass (two standalone gamma reductions cost ~0.2 ms/step of the
    # trigram headline's 0.85 ms loss glue, BENCH_NOTES r5): a non-finite
    # occupancy surfaces in the combined sum (inf propagates; inf-inf and
    # 0*inf produce nan), and non-finite upstream cotangents are checked
    # directly.
    raw = (
        g_num[:, None, None] * gamma_num + g_den[:, None, None] * gamma_den
    )
    ok = (
        jnp.isfinite(jnp.sum(raw, axis=(1, 2)))
        & jnp.isfinite(g_num)
        & jnp.isfinite(g_den)
    )
    dy = jnp.where(ok[:, None, None], raw, 0.0)
    # deriv_weights parity ([K] nnet-chain-training.cc ApplyDerivWeights):
    # per-frame weights scale the derivative rows, never the objf
    fw = getattr(sup, "frame_weights", None)
    if fw is not None:
        dy = dy * fw[:, :, None]
    return dy.astype(y.dtype), _tree_zero(den), _tree_zero(sup)


chain_logprobs.defvjp(_chain_logprobs_fwd, _chain_logprobs_bwd)


# ---------------------------------------------------------------------------
# full objective
# ---------------------------------------------------------------------------


def chain_loss(
    nnet_output: jnp.ndarray,  # [B, T, P] chain-head log-prob outputs
    xent_output: jnp.ndarray | None,  # [B, T, P] xent-head logits, or None
    den: DeviceDenseDenGraph | DeviceDenGraph,
    sup: DeviceSupervision,
    opts: ChainLossOptions = ChainLossOptions(),
    mesh=None,
) -> tuple[jnp.ndarray, dict]:
    """Returns (loss scalar to minimize, aux dict of per-batch statistics).

    aux keys: objf (per-frame MMI objective), l2_term, oor_term, xent_objf
    (all already normalized by `weight`), weight, num_failed.

    With `mesh` (a jax.sharding.Mesh with a `data` axis of size > 1), the
    fwd-bwd runs through shard_map so the batch shard on each chip goes
    through the single-chip fast path — including the VMEM-resident
    Pallas kernels GSPMD cannot partition (ops/sharded.py).  Batches the
    data axis does not divide fall back to the plain (GSPMD) call."""
    y = nnet_output
    B, T, P = y.shape
    from torchain_tpu.ops import sharded as _sharded

    if _sharded.shardable(mesh, B):
        num_logp, den_logz, gamma_num = _sharded.chain_logprobs_sharded(
            y, den, sup, opts.leaky_hmm_coefficient, mesh
        )
    else:
        num_logp, den_logz, gamma_num = chain_logprobs(
            y, den, sup, opts.leaky_hmm_coefficient
        )
    seq_w = sup.weight  # [B]
    per_seq = num_logp - den_logz
    ok = jnp.isfinite(per_seq)
    # where() zeroes the cotangent of failed sequences automatically
    per_seq = jnp.where(ok, per_seq, opts.failure_penalty_per_frame * T)
    objf = jnp.sum(seq_w * per_seq)
    weight = jnp.sum(seq_w) * T

    # deriv_weights semantics ([K] nnet-chain-training.cc): Kaldi adds the
    # l2/oor derivative into nnet_output_deriv and THEN ApplyDerivWeights
    # scales the rows, while the reported objf values stay unweighted.
    # _fw_sum reproduces that exactly: value = plain sum, gradient rows
    # scaled by fw (the chain term gets its scaling in the custom VJP).
    fw = getattr(sup, "frame_weights", None)

    def _fw_sum(term):  # term [B, T, P] per-element contributions
        if fw is None:
            return jnp.sum(term)
        sg = jax.lax.stop_gradient(term)
        w3 = fw[:, :, None]
        return jnp.sum(sg * (1.0 - w3) + term * w3)

    l2_term = -0.5 * opts.l2_regularize * _fw_sum(jnp.square(y))
    oor = jnp.maximum(jnp.abs(y) - opts.out_of_range_limit, 0.0)
    oor_term = -opts.out_of_range_regularize * _fw_sum(jnp.square(oor))

    if xent_output is not None:
        # row-decomposed cross-entropy (identical math, no [B, T, P]
        # log_softmax intermediate):
        #   sum_p tgt * log_softmax(x) = sum_p tgt*x - (sum_p tgt) * lse(x)
        # saves a full-tensor materialization + its backward re-pass —
        # ~0.2-0.3 ms/step of HBM traffic at the trigram headline where
        # the loss glue was 0.8 ms (BENCH_NOTES r5 profile)
        x = xent_output
        xent_tgt = gamma_num * seq_w[:, None, None]
        m = jax.lax.stop_gradient(jnp.max(x, axis=-1, keepdims=True))
        lse = (
            m[..., 0]
            + jnp.log(jnp.sum(jnp.exp(x - m), axis=-1))
        )  # [B, T]
        row = jnp.sum(xent_tgt * x, axis=-1) - jnp.sum(
            xent_tgt, axis=-1
        ) * lse  # [B, T]
        if fw is None:
            xent_objf = jnp.sum(row)
        else:
            sg = jax.lax.stop_gradient(row)
            xent_objf = jnp.sum(sg * (1.0 - fw) + row * fw)
    else:
        xent_objf = jnp.zeros(())

    total = objf + l2_term + oor_term + opts.xent_regularize * xent_objf
    # guard: an all-zero-weight batch must not produce inf/nan loss
    weight_safe = jnp.maximum(weight, 1e-8)
    loss = -total / weight_safe
    aux = dict(
        objf=objf / weight_safe,
        l2_term=l2_term / weight_safe,
        oor_term=oor_term / weight_safe,
        xent_objf=xent_objf / weight_safe,
        weight=weight,
        num_failed=jnp.sum(~ok).astype(jnp.float32),
    )
    return loss, aux


# ---------------------------------------------------------------------------
# host-side running statistics (torchain `ChainResults` parity)
# ---------------------------------------------------------------------------


class ChainResults:
    """Running accumulator of chain statistics, printed per interval —
    behavioral parity with torchain's ChainResults ([R]
    torchain/functions.py, SURVEY.md section 2.1)."""

    def __init__(self) -> None:
        self.tot_objf = 0.0
        self.tot_l2 = 0.0
        self.tot_xent = 0.0
        self.tot_weight = 0.0
        self.tot_failed = 0.0
        self.steps = 0

    def add(self, aux: dict) -> None:
        w = float(aux["weight"])
        self.tot_objf += float(aux["objf"]) * w
        self.tot_l2 += float(aux["l2_term"]) * w
        self.tot_xent += float(aux["xent_objf"]) * w
        self.tot_weight += w
        self.tot_failed += float(aux.get("num_failed", 0.0))
        self.steps += 1

    @property
    def objf(self) -> float:
        return self.tot_objf / max(self.tot_weight, 1e-20)

    def __str__(self) -> str:
        w = max(self.tot_weight, 1e-20)
        return (
            f"chain objf/frame={self.tot_objf / w:.4f} "
            f"l2={self.tot_l2 / w:.4f} xent={self.tot_xent / w:.4f} "
            f"weight={self.tot_weight:.0f} failed_seqs={self.tot_failed:.0f}"
        )
