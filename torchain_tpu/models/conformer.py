"""Conformer acoustic encoder (flax) for chain training at scale.

The model family BASELINE.json config 4 calls for ("Conformer encoder +
chain loss, model-sharded across chips").  Standard conformer blocks
(Gulati et al. 2020): half-step feed-forward sandwiches around
multi-head self-attention (with a T5-style relative position bias) and a
depthwise-convolution module; a strided conv frontend performs the
frame-subsampling-factor reduction.  Designed MXU-first: all hot paths are
dense matmuls/convs in bf16-friendly shapes; the `model` mesh axis shards
attention heads and FFN hidden dims via the sharding rules in
torchain_tpu.parallel.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from torchain_tpu.models.tdnn import Prefinal, batch_norm, continuous_dropout


@dataclasses.dataclass(frozen=True)
class ConformerConfig:
    num_pdfs: int = 120
    dim: int = 256
    num_layers: int = 8
    num_heads: int = 4
    ffn_mult: int = 4
    conv_kernel: int = 15
    frame_subsampling_factor: int = 3
    frontend_kernel: int = 5
    rel_pos_buckets: int = 32
    prefinal_dim: int = 256
    dropout: float = 0.0
    #: compute dtype of the trunk (params stay float32).  The r1 bf16
    #: regression came from normalization layers computing IN bf16 and the
    #: resulting up/down conversions around every block; normalization now
    #: runs as explicit f32 islands with bf16 matmuls between them, the
    #: pattern that makes bf16 pay on MXU
    dtype: Any = jnp.float32
    #: depthwise conv dtype island.  The r1-era default (True) guarded
    #: against the bf16 grouped-CONV lowering catastrophe (122 ms vs
    #: 2.8 ms full step on v5e); the "shift" impl below has no grouped
    #: conv, and bf16 taps measure 8.91 vs 9.09 ms/step at the trigram
    #: headline with a 40-step trajectory that tracks f32 (slightly
    #: ahead at step 40 — chaotic drift, same pattern as the bf16-V A/B,
    #: BENCH_NOTES r5).  Set True to restore the f32 island (forced
    #: automatically for depthwise_impl="conv" in bf16)
    depthwise_f32: bool = False
    #: depthwise lowering: "shift" = kernel-tap shifted multiply-adds
    #: (pure VPU elementwise, no grouped-conv lowering), "conv" =
    #: lax.conv feature_group_count — numerically identical
    depthwise_impl: str = "shift"
    #: batchnorm lowering for the conv module + prefinal heads: "fused" =
    #: hand-fused 2+2-pass custom VJP (models/tdnn.ChainBatchNorm),
    #: "flax" = stock nn.BatchNorm — numerically matched
    bn_impl: str = "fused"
    #: layernorm lowering: "fused" = hand-fused custom VJP (ops/fused_ln),
    #: "flax" = stock nn.LayerNorm — numerically matched (device A/B round
    #: 4: fused bn+ln 9.438 vs flax 9.489 ms/step, trigram B=128)
    ln_impl: str = "fused"
    #: attention lowering: "fused" = one Pallas kernel per batch row
    #: (ops/attention.py — qkv slicing, logits, bias, softmax, p@v and the
    #: head re-merge never leave VMEM; the einsum path's qkv transposes +
    #: softmax glue were ~1.8 ms of the 10 ms trigram step, round-3
    #: trace), "einsum" = the XLA formulation (reference; CPU-friendly)
    attn_impl: str = "fused"
    #: feed-forward lowering: "dense" = stock nn.Dense chain (DEFAULT —
    #: device-measured FASTER), "fused" = one Pallas kernel per FFN
    #: half-step (ops/fused_ffn.py — hidden activations VMEM-resident,
    #: recomputed in the backward).  The fused kernel is an honestly-kept
    #: NEGATIVE result at conformer shapes: 10.45 vs 9.09 ms/step at the
    #: trigram headline (BENCH_NOTES r5) — XLA's own lowering already
    #: fuses the swish chain and overlaps the matmuls, and the kernel's
    #: dim0-contraction weight-grad dots cost more than the [N, 4*dim]
    #: round-trip they save.  Parameter trees are identical either way,
    #: so checkpoints interchange
    ffn_impl: str = "dense"

    @property
    def context(self) -> tuple[int, int]:
        c = (self.frontend_kernel - 1) // 2
        return c, c


class FusedLayerNorm(nn.Module):
    """Drop-in nn.LayerNorm replacement over the hand-fused VJP
    (ops/fused_ln.py): f32 row stats straight off the bf16 operand, no
    materialized f32 island, two-pass backward.  Parameter tree matches
    nn.LayerNorm (scale/bias, f32); epsilon matches flax's 1e-6 default."""

    epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from torchain_tpu.ops.fused_ln import ln_apply

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return ln_apply(x.astype(self.dtype), scale, bias, self.epsilon)


class RelPositionBias(nn.Module):
    """T5-style bucketed relative position bias shared across layers."""

    num_heads: int
    num_buckets: int = 32

    @nn.compact
    def __call__(self, T: int):
        emb = self.param(
            "rel_bias",
            nn.initializers.normal(0.02),
            (2 * self.num_buckets + 1, self.num_heads),
        )
        rel = np.arange(T)[None, :] - np.arange(T)[:, None]  # static
        idx = np.clip(rel, -self.num_buckets, self.num_buckets) + self.num_buckets
        return jnp.transpose(emb[idx], (2, 0, 1))  # [H, T, T]


class DepthwiseShift(nn.Module):
    """Depthwise 1-D conv (SAME padding) as kernel-tap shifted
    multiply-adds.  Parameter-compatible with
    nn.Conv(features=dim, feature_group_count=dim): kernel [K, 1, dim],
    bias [dim].  On TPU the grouped-conv lowering of a depthwise conv is
    scalar-unfriendly; K shifted elementwise FMAs are pure VPU work that
    XLA fuses into one pass."""

    features: int
    kernel_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        K = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (K, 1, self.features),
            jnp.float32,
        ).astype(self.dtype)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        ).astype(self.dtype)
        T = x.shape[1]
        lo = (K - 1) // 2
        xp = jnp.pad(x, ((0, 0), (lo, K - 1 - lo), (0, 0)))
        y = xp[:, 0:T] * kernel[0, 0]
        for k in range(1, K):
            y = y + xp[:, k : k + T] * kernel[k, 0]
        return y + bias


class _DenseParams(nn.Module):
    """Parameter container matching nn.Dense's tree (kernel/bias, f32,
    lecun-normal/zeros) for the fused-FFN lowering — checkpoints
    interchange with the stock nn.Dense path bit-for-bit."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
            jnp.float32,
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return k, b


class ConformerBlock(nn.Module):
    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, bias, train: bool = False):
        cfg = self.cfg

        def ln(h, name):
            # f32 normalization island, output back in the trunk dtype
            if cfg.ln_impl == "fused":
                return FusedLayerNorm(dtype=cfg.dtype, name=name)(h)
            return nn.LayerNorm(dtype=jnp.float32, name=name)(h).astype(cfg.dtype)

        def ffn_half(h, res, tag):
            # half-step FFN: res + 0.5 * (swish(h @ W1 + b1) @ W2 + b2)
            F = cfg.dim * cfg.ffn_mult
            if cfg.ffn_impl == "fused":
                from torchain_tpu.ops.fused_ffn import ffn_apply

                w1, b1 = _DenseParams(F, cfg.dim, name=f"{tag}_in")()
                w2, b2 = _DenseParams(cfg.dim, F, name=f"{tag}_out")()
                return ffn_apply(h, res, w1, b1, w2, b2, 0.5)
            h = nn.Dense(F, dtype=cfg.dtype, name=f"{tag}_in")(h)
            h = nn.swish(h)
            h = nn.Dense(cfg.dim, dtype=cfg.dtype, name=f"{tag}_out")(h)
            return res + 0.5 * h

        # FFN half-step 1
        x = ffn_half(ln(x, "ln_ffn1"), x, "ffn1")

        # self-attention with relative position bias
        h = ln(x, "ln_attn")
        B, T, D = h.shape
        H = cfg.num_heads
        # contiguous feature slices, NOT a [B,T,3,H,dh] reshape+index:
        # the 5-D slice forced a per-layer layout copy on TPU (trace
        # copy.9xx, BENCH_NOTES round 2); contiguous slices fold into the
        # attention einsum's own transpose
        qkv = nn.Dense(3 * D, dtype=cfg.dtype, name="attn_qkv")(h)
        dh = D // H
        if cfg.attn_impl == "fused":
            from torchain_tpu.ops.attention import fused_relpos_attention

            att = fused_relpos_attention(
                qkv, bias, H, float(1.0 / np.sqrt(dh))
            )
        else:
            # one explicit transpose to head-major [B,H,T,dh] per tensor, so
            # both attention contractions are clean batch-leading
            # dot_generals (einsum over [B,T,H,dh] made XLA materialize a
            # layout copy per operand per layer: ~1.4 ms/step of 'copy' ops
            # in the r2 trace); the 1/sqrt(dh) scale folds into q (the
            # smallest tensor), and the logits accumulate f32 IN the matmul
            # (preferred_element_type) instead of a separate convert pass
            # over [B,H,T,T]
            q = qkv[..., 0 * D : 1 * D].reshape(B, T, H, dh).transpose(0, 2, 1, 3)
            k = qkv[..., 1 * D : 2 * D].reshape(B, T, H, dh).transpose(0, 2, 1, 3)
            v = qkv[..., 2 * D : 3 * D].reshape(B, T, H, dh).transpose(0, 2, 1, 3)
            q = q * float(1.0 / np.sqrt(dh))  # python scalar: stays in q.dtype
            logits = jnp.einsum(
                "bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32
            )
            logits = logits + bias[None]
            att = jnp.einsum(
                "bhts,bhsd->bhtd", nn.softmax(logits, axis=-1).astype(v.dtype), v
            )
            att = att.transpose(0, 2, 1, 3).reshape(B, T, D)
        h = nn.Dense(D, dtype=cfg.dtype, name="attn_out")(att)
        x = x + h

        # convolution module
        h = ln(x, "ln_conv")
        h = nn.Dense(2 * cfg.dim, dtype=cfg.dtype, name="conv_in")(h)
        h = nn.glu(h, axis=-1)
        # the grouped-CONV lowering stays an f32 island in bf16 trunks
        # regardless of depthwise_f32 (its bf16 lowering is the r1-era
        # 122 ms catastrophe); only the shift impl runs bf16 taps
        dw_dtype = (
            jnp.float32
            if cfg.depthwise_f32
            or (cfg.depthwise_impl == "conv" and cfg.dtype == jnp.bfloat16)
            else cfg.dtype
        )
        if cfg.depthwise_impl == "shift":
            h = DepthwiseShift(
                cfg.dim,
                kernel_size=cfg.conv_kernel,
                dtype=dw_dtype,
                name="depthwise",
            )(h.astype(dw_dtype))
        else:
            h = nn.Conv(
                cfg.dim,
                kernel_size=(cfg.conv_kernel,),
                feature_group_count=cfg.dim,
                padding="SAME",
                dtype=dw_dtype,
                name="depthwise",
            )(h.astype(dw_dtype))
        # f32 batch-norm island (running stats must not accumulate in bf16)
        h = batch_norm(
            train=train, dtype=jnp.float32, impl=cfg.bn_impl,
            name="BatchNorm_0",
        )(h.astype(jnp.float32)).astype(cfg.dtype)
        h = nn.swish(h)
        h = nn.Dense(cfg.dim, dtype=cfg.dtype, name="conv_out")(h)
        x = x + h

        # FFN half-step 2
        x = ffn_half(ln(x, "ln_ffn2"), x, "ffn2")
        return ln(x, "ln_out")


class Conformer(nn.Module):
    config: ConformerConfig

    @nn.compact
    def __call__(self, feats, train: bool = False, dropout_rate=None):
        cfg = self.config
        x = nn.Conv(
            cfg.dim,
            kernel_size=(cfg.frontend_kernel,),
            strides=(cfg.frame_subsampling_factor,),
            padding="VALID",
            dtype=cfg.dtype,
            name="frontend",
        )(feats.astype(cfg.dtype))
        x = nn.swish(x)
        bias = RelPositionBias(cfg.num_heads, cfg.rel_pos_buckets, name="rel_pos")(
            x.shape[1]
        )
        if dropout_rate is None and cfg.dropout > 0:
            dropout_rate = cfg.dropout
        for i in range(cfg.num_layers):
            x = ConformerBlock(cfg, name=f"block{i}")(x, bias, train)
            # per-block continuous dropout (Kaldi dropout-schedule role;
            # the standard conformer's per-sublayer Bernoulli dropout is
            # replaced by the chain recipes' expectation-1 channel noise)
            x = continuous_dropout(self, x, dropout_rate, train)
        chain = Prefinal(cfg.prefinal_dim, cfg.num_pdfs, dtype=cfg.dtype, bn_impl=cfg.bn_impl, name="chain_head")(x, train)
        xent = Prefinal(cfg.prefinal_dim, cfg.num_pdfs, dtype=cfg.dtype, bn_impl=cfg.bn_impl, name="xent_head")(x, train)
        return chain, xent
