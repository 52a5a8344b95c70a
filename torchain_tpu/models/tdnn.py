"""TDNN and TDNN-F acoustic encoders (flax).

Behavioral reference: Kaldi chain recipes' TDNN (context-spliced affine
layers = dilated 1-D convolutions) and TDNN-F (factored layers with a
semi-orthogonal bottleneck, batchnorm, and scaled bypass connections —
Povey et al. 2018), e.g. the mini-librispeech/librispeech tdnn/tdnnf
configs torchain's example trains ([R] example/train.py, SURVEY.md
section 2.1).  Re-designed as flax modules over [B, T, F] tensors with
VALID convolutions: the loader supplies exactly `left_context` +
`right_context` extra input frames and one layer strides by
frame_subsampling_factor, reproducing Kaldi's frame-rate contract
(SURVEY.md section 3.2).

Every model returns (chain_out, xent_out): [B, T_out, num_pdfs] each.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def continuous_dropout(mod: nn.Module, x, rate, train: bool, time_axis: int = 1):
    """Kaldi's dropout-per-dim-continuous (the chain-recipe dropout,
    [K] nnet-simple-component.cc DropoutComponent continuous mode):
    multiply each CHANNEL by a value uniform in [1-2p, 1+2p], shared
    across time within an utterance.  Expectation is exactly 1, so there
    is no train/eval rescale, p=0 is an exact identity, and a SCHEDULED
    rate can be passed as a traced scalar without recompilation —
    the TPU-friendly realization of Kaldi's --trainer.dropout-schedule.

    `time_axis` names the axis the mask is shared over (1 for [B, T, C]
    activations, 0 for the time-major [T, B, C] trunk layout)."""
    if not train or rate is None or not mod.has_rng("dropout"):
        return x
    rng = mod.make_rng("dropout")
    shape = list(x.shape)
    shape[time_axis] = 1
    u = jax.random.uniform(rng, tuple(shape), x.dtype, -1.0, 1.0)
    return x * (1.0 + 2.0 * jnp.asarray(rate, x.dtype) * u)


class ChainBatchNorm(nn.Module):
    """Drop-in replacement for nn.BatchNorm (feature axis -1, no
    cross-replica axis) built on the hand-fused train-mode kernel in
    ops/fused_bn.py: two passes forward, two passes backward, f32
    reductions straight off the bf16 operand — removing the flax
    module's materialized upcast + separate dmean/dvar chains (r3 device
    trace: ~0.57 ms/step at trigram B=128).  Parameters and batch_stats
    variables are laid out identically to nn.BatchNorm; instantiate with
    name="BatchNorm_0" so checkpoints stay interchangeable between
    implementations (tests/test_fused_bn.py)."""

    use_running_average: bool
    momentum: float = 0.99
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from torchain_tpu.ops.fused_bn import bn_train

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )
        if self.use_running_average:
            rstd = jax.lax.rsqrt(ra_var.value + self.epsilon)
            a = (rstd * scale).astype(x.dtype)
            b = (bias - ra_mean.value * rstd * scale).astype(x.dtype)
            return x * a + b
        y, mean, var = bn_train(x, scale, bias, self.epsilon)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        return y


class FusedPostBN(nn.Module):
    """The whole TDNN-F layer tail — relu(x + conv_bias) -> batchnorm
    [-> + bypass_scale * bypass] — as ONE custom-VJP op
    (ops.fused_bn.brb_train / brb_bypass_train): the separate bias+relu
    and bypass passes were 0.40 + 0.17 ms/step of HBM traffic at the
    trigram B=128 headline (device trace, BENCH_NOTES round 4); folding
    them into the batchnorm's two passes recomputes relu(x+cb) on the fly
    and never materializes the intermediate.  Parameters and batch_stats
    are laid out identically to nn.BatchNorm (instantiate with
    name="BatchNorm_0"), and the deferred conv bias stays a child param
    of the producing _TapDot, so checkpoints interchange with every other
    BN implementation."""

    use_running_average: bool
    momentum: float = 0.99
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, conv_bias, bypass=None, bypass_scale: float = 0.0):
        from torchain_tpu.ops.fused_bn import brb_bypass_train, brb_train

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )
        if self.use_running_average:
            h = jnp.maximum(x + conv_bias.astype(x.dtype), 0)
            rstd = jax.lax.rsqrt(ra_var.value + self.epsilon)
            a = (rstd * scale).astype(x.dtype)
            b = (bias - ra_mean.value * rstd * scale).astype(x.dtype)
            y = h * a + b
            if bypass is not None:
                y = y + jnp.asarray(bypass_scale, y.dtype) * bypass.astype(
                    y.dtype
                )
            return y
        if bypass is not None:
            y, mean, var = brb_bypass_train(
                x, conv_bias, scale, bias, bypass,
                self.epsilon, float(bypass_scale),
            )
        else:
            y, mean, var = brb_train(x, conv_bias, scale, bias, self.epsilon)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        return y


def batch_norm(*, train: bool, dtype, impl: str = "flax", name=None):
    """BatchNorm factory shared by the trunks: impl "fused" builds
    ChainBatchNorm, "flax" the stock nn.BatchNorm — numerically matched,
    checkpoint-compatible trees (both named BatchNorm_N)."""
    if impl == "fused":
        return ChainBatchNorm(
            use_running_average=not train, dtype=dtype, name=name
        )
    return nn.BatchNorm(
        use_running_average=not train, axis_name=None, dtype=dtype, name=name
    )


class Prefinal(nn.Module):
    """Kaldi's prefinal-chain / prefinal-xent block: linear bottleneck +
    relu + batchnorm + affine to pdfs.  Always emits float32 (the chain
    loss runs its scans in f32 regardless of trunk compute dtype)."""

    dim: int
    num_pdfs: int
    dtype: Any = jnp.float32
    bn_impl: str = "fused"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.dim, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = batch_norm(
            train=train, dtype=self.dtype, impl=self.bn_impl,
            name="BatchNorm_0",
        )(x)
        return nn.Dense(self.num_pdfs, dtype=jnp.float32)(x.astype(jnp.float32))


@dataclasses.dataclass(frozen=True)
class TdnnConfig:
    num_pdfs: int = 120
    hidden_dim: int = 512
    prefinal_dim: int = 256
    #: compute dtype of the trunk (params stay float32); bf16 doubles MXU
    #: throughput on TPU
    dtype: Any = jnp.float32
    #: (kernel, dilation, stride) per layer; exactly one stride equals
    #: frame_subsampling_factor
    layers: Sequence[tuple[int, int, int]] = (
        (5, 1, 1),
        (3, 1, 3),
        (3, 3, 1),
        (3, 3, 1),
        (3, 3, 1),
    )

    @property
    def frame_subsampling_factor(self) -> int:
        f = 1
        for _, _, s in self.layers:
            f *= s
        return f

    @property
    def context(self) -> tuple[int, int]:
        """(left, right) input frames consumed beyond T_out * fsf."""
        left = 0
        rate = 1
        for k, d, s in self.layers:
            left += (k // 2) * d * rate
            rate *= s
        return left, left  # symmetric kernels


class TDNN(nn.Module):
    """Plain TDNN: dilated VALID convs + relu + batchnorm."""

    config: TdnnConfig

    @nn.compact
    def __call__(self, feats, train: bool = False, dropout_rate=None):
        cfg = self.config
        x = feats.astype(cfg.dtype)
        for i, (k, d, s) in enumerate(cfg.layers):
            x = nn.Conv(
                cfg.hidden_dim,
                kernel_size=(k,),
                kernel_dilation=(d,),
                strides=(s,),
                padding="VALID",
                dtype=cfg.dtype,
                name=f"tdnn{i}",
            )(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=not train, axis_name=None, dtype=cfg.dtype)(x)
            x = continuous_dropout(self, x, dropout_rate, train)
        chain = Prefinal(cfg.prefinal_dim, cfg.num_pdfs, dtype=cfg.dtype, name="chain_head")(x, train)
        xent = Prefinal(cfg.prefinal_dim, cfg.num_pdfs, dtype=cfg.dtype, name="xent_head")(x, train)
        return chain, xent


class _TapDot(nn.Module):
    """A width-2 dilated 1-D 'conv' as two strided-slice matmuls.

    Parameter-compatible with nn.Conv (kernel [2, in, out], optional bias
    [out]) but lowered as dot_general on MXU-friendly [rows, C] operands:
    measured on v5e, XLA's conv_general_dilated lowering of the same layer
    leaves ~2x on the table at TDNN-F shapes (BENCH_NOTES round 2).

    `time_axis=0` expects the time-major [T, B, C] trunk layout: the
    time-shift slices then act on the OUTERMOST (untiled) dim, which the
    TPU emitter fuses into the matmul operands instead of materializing
    shifted copies of the [.., 768]-wide activation — the round-2 trunk
    remainder ("backward pad-scatters of strided slices", BENCH_NOTES) was
    exactly these copies under the [B, T, C] layout (time = tiled middle
    dim, so every shift misaligns the (8, 128) tiling)."""

    features: int
    dilation: int = 1
    stride: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32
    time_axis: int = 1
    #: declare the bias param but return it UNAPPLIED as (y, bias) so a
    #: fused consumer (FusedPostBN) can fold it into its own passes; the
    #: param path stays "<name>/bias" for checkpoint interchange
    defer_bias: bool = False

    @nn.compact
    def __call__(self, x):
        in_feat = x.shape[-1]
        # same shape AND fan-in convention as nn.Conv's kernel (the
        # receptive-field dim counts toward fan-in), so checkpoints and the
        # semi-orthogonal projection are interchangeable across impls
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (2, in_feat, self.features),
            jnp.float32,
        ).astype(self.dtype)
        d, s = self.dilation, self.stride
        t_out = (x.shape[self.time_axis] - d - 1) // s + 1
        if self.time_axis == 0 and s == 1 and 2 * self.features <= in_feat:
            # NARROWING factor (e.g. 768 -> 96): project FIRST, shift
            # after — one fused dot over the full [T, B, in] activation
            # (wider N = better MXU tiling), then the time shift lands on
            # the [T, B, 2*features] RESULT, removing both wide input
            # slice copies and their backward pad-scatters (device-trace
            # round 3: input slices were 0.52 ms/step of the trigram B=128
            # trunk under either layout).  Widening factors (96 -> 768)
            # keep input slicing: there the sliced operand is the narrow
            # side and a 2x-wide projected intermediate would cost more
            # than it saves (measured +6% step time when applied to both)
            w = jnp.dot(
                x,
                kernel.transpose(1, 0, 2).reshape(in_feat, 2 * self.features),
            )
            y = w[:t_out, :, : self.features] + w[d:, :, self.features :]
        else:
            if self.time_axis == 0:
                lag = x[0 : (t_out - 1) * s + 1 : s]
                now = x[d : d + (t_out - 1) * s + 1 : s]
            else:
                lag = x[:, 0 : (t_out - 1) * s + 1 : s]
                now = x[:, d : d + (t_out - 1) * s + 1 : s]
            y = jnp.dot(lag, kernel[0]) + jnp.dot(now, kernel[1])
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            if self.defer_bias:
                return y, bias
            y = y + bias.astype(self.dtype)
        return y


class TdnnfLayer(nn.Module):
    """One factored layer: semi-orthogonal linear (context [-d, 0]) ->
    bottleneck -> affine (context [0, +d]) -> relu -> batchnorm, with a
    scaled bypass (Kaldi tdnnf-layer semantics)."""

    hidden_dim: int
    bottleneck_dim: int
    dilation: int = 1
    stride: int = 1
    bypass_scale: float = 0.66
    dtype: Any = jnp.float32
    #: "dot" = strided-slice matmuls (TPU default), "conv" = nn.Conv
    impl: str = "dot"
    #: axis carrying time; 0 = time-major trunk (see _TapDot)
    time_axis: int = 1
    #: "fused" = ChainBatchNorm (hand-fused VJP), "flax" = nn.BatchNorm
    bn_impl: str = "fused"

    @nn.compact
    def __call__(self, x, train: bool = False, dropout_rate=None):
        # "fused" post path (dot impl): the affine's bias is deferred into
        # FusedPostBN, which runs bias+relu+batchnorm(+bypass) as one op
        fuse_post = self.impl == "dot" and self.bn_impl == "fused"
        cb = None
        if self.impl == "dot":
            # first factor: kernel covers (t - d, t); named linear_pre so
            # the periodic semi-orthogonal projection finds it
            h = _TapDot(
                self.bottleneck_dim,
                dilation=self.dilation,
                stride=self.stride,
                use_bias=False,
                dtype=self.dtype,
                time_axis=self.time_axis,
                name="linear_pre",
            )(x)
            # second factor: kernel covers (t, t + d)
            h = _TapDot(
                self.hidden_dim,
                dilation=self.dilation,
                dtype=self.dtype,
                time_axis=self.time_axis,
                defer_bias=fuse_post,
                name="affine",
            )(h)
            if fuse_post:
                h, cb = h
        else:
            h = nn.Conv(
                self.bottleneck_dim,
                kernel_size=(2,),
                kernel_dilation=(self.dilation,),
                strides=(self.stride,),
                padding="VALID",
                use_bias=False,
                dtype=self.dtype,
                name="linear_pre",
            )(x)
            h = nn.Conv(
                self.hidden_dim,
                kernel_size=(2,),
                kernel_dilation=(self.dilation,),
                padding="VALID",
                dtype=self.dtype,
                name="affine",
            )(h)
        # bypass source: crop x to align with h (d left from factor 1,
        # d right from factor 2, then stride)
        ta = self.time_axis if self.impl == "dot" else 1
        d = self.dilation
        if ta == 0:
            crop = x[d :: self.stride][: h.shape[0]]
        else:
            crop = x[:, d :: self.stride, :][:, : h.shape[1], :]
        has_bypass = crop.shape[-1] == h.shape[-1]
        if fuse_post:
            post = FusedPostBN(
                use_running_average=not train, dtype=self.dtype,
                name="BatchNorm_0",
            )
            if has_bypass and dropout_rate is None:
                return post(h, cb, crop, self.bypass_scale)
            # Kaldi tdnnf-layer order: dropout after batchnorm, before the
            # scaled bypass joins — so with dropout active the bypass add
            # stays outside the fused op
            h = post(h, cb)
            h = continuous_dropout(self, h, dropout_rate, train, time_axis=ta)
            if has_bypass:
                h = h + self.bypass_scale * crop
            return h
        h = nn.relu(h)
        h = batch_norm(
            train=train, dtype=self.dtype, impl=self.bn_impl,
            name="BatchNorm_0",
        )(h)
        h = continuous_dropout(self, h, dropout_rate, train, time_axis=ta)
        if has_bypass:
            h = h + self.bypass_scale * crop
        return h


@dataclasses.dataclass(frozen=True)
class TdnnfConfig:
    num_pdfs: int = 120
    hidden_dim: int = 768
    bottleneck_dim: int = 96
    prefinal_dim: int = 256
    num_layers: int = 9
    dtype: Any = jnp.float32
    #: layer index that strides by frame_subsampling_factor
    subsample_layer: int = 1
    frame_subsampling_factor: int = 3
    #: dilation per layer after the subsample layer (Kaldi time-stride 3)
    dilation: int = 3
    #: factored-layer lowering: "dot" (strided-slice matmuls, TPU default)
    #: or "conv" (lax.conv_general_dilated) — numerically identical
    impl: str = "dot"
    #: run the trunk time-major [T, B, C] ("dot" impl only): time-shifts
    #: land on the untiled outermost dim, eliminating the slice copies and
    #: backward pad-scatters of the [B, T, C] layout (BENCH_NOTES round 3)
    time_major: bool = True
    #: batchnorm lowering: "fused" = hand-fused 2+2-pass custom VJP
    #: (ChainBatchNorm), "flax" = stock nn.BatchNorm — numerically matched
    #: (device A/B round 4: fused 5.737 vs flax 5.816 ms/step at the
    #: trigram B=128 headline — small but consistent, so fused is default)
    bn_impl: str = "fused"

    def layer_geometry(self) -> list[tuple[int, int]]:
        """(dilation, stride) per tdnnf layer."""
        out = []
        for i in range(self.num_layers):
            if i == 0:
                out.append((1, 1))
            elif i == self.subsample_layer:
                out.append((1, self.frame_subsampling_factor))
            else:
                out.append((self.dilation, 1))
        return out

    @property
    def context(self) -> tuple[int, int]:
        left = right = 0
        rate = 1
        for d, s in self.layer_geometry():
            left += d * rate  # factor 1 looks back d (pre-stride rate)
            rate *= s
            right += d * rate  # factor 2 looks ahead d (post-stride rate)
        return left, right


class TDNNF(nn.Module):
    """Factored TDNN stack with chain + xent heads."""

    config: TdnnfConfig

    @nn.compact
    def __call__(self, feats, train: bool = False, dropout_rate=None):
        cfg = self.config
        # NOTE — two r4 negative results on the ~83 us/step entry-transpose
        # copy (trigram B=128 device A/B): (a) transposing the INPUT before
        # a k=1 conv: 6.18 vs 5.59 ms/step — the 40-lane f32 transpose pads
        # to 128 lanes and the batch=T conv layout costs more than the wide
        # bf16 copy; (b) einsum('btf,fc->tbc') emitting time-major straight
        # from the projection matmul: 5.69 vs 5.59 — XLA materializes the
        # relayout anyway.  The explicit post-projection transpose stays.
        x = nn.Conv(cfg.hidden_dim, kernel_size=(1,), dtype=cfg.dtype, name="input_proj")(
            feats.astype(cfg.dtype)
        )
        x = nn.relu(x)
        x = batch_norm(
            train=train, dtype=cfg.dtype, impl=cfg.bn_impl, name="BatchNorm_0"
        )(x)
        tm = cfg.time_major and cfg.impl == "dot"
        if tm:
            x = jnp.transpose(x, (1, 0, 2))  # [B, T, C] -> [T, B, C]
        for i, (d, s) in enumerate(cfg.layer_geometry()):
            x = TdnnfLayer(
                hidden_dim=cfg.hidden_dim,
                bottleneck_dim=cfg.bottleneck_dim,
                dilation=d,
                stride=s,
                dtype=cfg.dtype,
                impl=cfg.impl,
                time_axis=0 if tm else 1,
                bn_impl=cfg.bn_impl,
                name=f"tdnnf{i}",
            )(x, train, dropout_rate)
        if tm:
            x = jnp.transpose(x, (1, 0, 2))
        chain = Prefinal(cfg.prefinal_dim, cfg.num_pdfs, dtype=cfg.dtype, bn_impl=cfg.bn_impl, name="chain_head")(x, train)
        xent = Prefinal(cfg.prefinal_dim, cfg.num_pdfs, dtype=cfg.dtype, bn_impl=cfg.bn_impl, name="xent_head")(x, train)
        return chain, xent
