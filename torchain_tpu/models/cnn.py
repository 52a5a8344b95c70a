"""CNN-TDNN acoustic encoder (flax).

Behavioral reference: Kaldi's cnn_tdnn chain family (e.g.
mini_librispeech local/chain/tuning/run_cnn_tdnn_1a.sh and the
librispeech/swbd variants): a 2-D convolutional front end over the
(time x mel-frequency) plane — conv-relu-batchnorm blocks with height
subsampling — feeding the standard factored-TDNN trunk.  Kaldi builds it
from TimeHeightConvolutionComponent layers ([K] nnet3/nnet-convolutional
-component.h); here the front end is `lax.conv_general_dilated` on
[B, T, F, C] (NHWC) tensors — the conv maps straight onto the MXU and
XLA fuses the relu/batchnorm chain — followed by the same TdnnfLayer
stack TDNN-F uses (time-major trunk, fused BN, project-before-shift).

Frame-rate contract: conv layers run at the INPUT frame rate with VALID
time padding (each consumes (time_kernel-1)/2 frames per side); the
TDNN-F trunk then subsamples by frame_subsampling_factor exactly as
TdnnfConfig does, so `context` composes both parts and the loader's
chunking logic is unchanged.

Height (frequency) handling mirrors Kaldi: SAME padding with stride
`freq_stride` per block, so 40 mel bins step down (e.g. 40 -> 20 -> 10)
while filters widen; the final [F', C'] plane flattens into the trunk's
feature dim.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from torchain_tpu.models.tdnn import (
    Prefinal,
    TdnnfLayer,
    batch_norm,
    continuous_dropout,
)


@dataclasses.dataclass(frozen=True)
class CnnTdnnConfig:
    num_pdfs: int = 120
    #: mel bins of the input features (the conv height)
    feat_dim: int = 40
    #: filters per conv block (Kaldi cnn_tdnn_1a: 48,48,64,64,64,128)
    conv_filters: Sequence[int] = (48, 48, 64, 64, 64, 128)
    #: height stride per block (subsample frequency as filters widen)
    conv_freq_strides: Sequence[int] = (1, 1, 2, 1, 1, 2)
    #: time x freq kernel of every block (Kaldi uses 3x3 throughout)
    time_kernel: int = 3
    freq_kernel: int = 3
    # TDNN-F trunk (TdnnfConfig semantics)
    hidden_dim: int = 768
    bottleneck_dim: int = 96
    prefinal_dim: int = 256
    num_tdnnf_layers: int = 9
    subsample_layer: int = 1
    frame_subsampling_factor: int = 3
    dilation: int = 3
    dtype: Any = jnp.float32
    time_major: bool = True
    bn_impl: str = "fused"

    def tdnnf_geometry(self) -> list[tuple[int, int]]:
        out = []
        for i in range(self.num_tdnnf_layers):
            if i == 0:
                out.append((1, 1))
            elif i == self.subsample_layer:
                out.append((1, self.frame_subsampling_factor))
            else:
                out.append((self.dilation, 1))
        return out

    @property
    def conv_context(self) -> int:
        """Input frames each conv side consumes (all blocks run pre-
        subsampling, so rate is 1)."""
        return len(self.conv_filters) * (self.time_kernel // 2)

    @property
    def context(self) -> tuple[int, int]:
        left = right = self.conv_context
        rate = 1
        for d, s in self.tdnnf_geometry():
            left += d * rate
            rate *= s
            right += d * rate
        return left, right

    @property
    def conv_out_dim(self) -> int:
        f = self.feat_dim
        for s in self.conv_freq_strides:
            f = -(-f // s)  # SAME padding: ceil division
        return f * self.conv_filters[-1]


class CNNTDNN(nn.Module):
    """2-D conv front end + factored-TDNN trunk with chain + xent heads."""

    config: CnnTdnnConfig

    @nn.compact
    def __call__(self, feats, train: bool = False, dropout_rate=None):
        cfg = self.config
        if len(cfg.conv_filters) != len(cfg.conv_freq_strides):
            raise ValueError("conv_filters and conv_freq_strides must align")
        B = feats.shape[0]
        # [B, T, F] -> [B, T, F, 1]: time = H (VALID), freq = W (SAME)
        x = feats.astype(cfg.dtype)[..., None]
        for i, (nf, fs) in enumerate(
            zip(cfg.conv_filters, cfg.conv_freq_strides)
        ):
            x = nn.Conv(
                nf,
                kernel_size=(cfg.time_kernel, cfg.freq_kernel),
                strides=(1, fs),
                padding=((0, 0), ((cfg.freq_kernel - 1) // 2,) * 2),
                dtype=cfg.dtype,
                name=f"conv{i}",
            )(x)
            x = nn.relu(x)
            x = batch_norm(
                train=train, dtype=cfg.dtype, impl=cfg.bn_impl,
                name=f"conv_bn{i}",
            )(x)
        # flatten the (freq, channel) plane into the trunk feature dim
        x = x.reshape(B, x.shape[1], -1)
        x = continuous_dropout(self, x, dropout_rate, train)
        x = nn.Dense(cfg.hidden_dim, dtype=cfg.dtype, name="input_proj")(x)
        x = nn.relu(x)
        x = batch_norm(
            train=train, dtype=cfg.dtype, impl=cfg.bn_impl, name="BatchNorm_0"
        )(x)
        tm = cfg.time_major
        if tm:
            x = jnp.transpose(x, (1, 0, 2))
        for i, (d, s) in enumerate(cfg.tdnnf_geometry()):
            x = TdnnfLayer(
                hidden_dim=cfg.hidden_dim,
                bottleneck_dim=cfg.bottleneck_dim,
                dilation=d,
                stride=s,
                dtype=cfg.dtype,
                time_axis=0 if tm else 1,
                bn_impl=cfg.bn_impl,
                name=f"tdnnf{i}",
            )(x, train, dropout_rate)
        if tm:
            x = jnp.transpose(x, (1, 0, 2))
        chain = Prefinal(
            cfg.prefinal_dim, cfg.num_pdfs, dtype=cfg.dtype,
            bn_impl=cfg.bn_impl, name="chain_head",
        )(x, train)
        xent = Prefinal(
            cfg.prefinal_dim, cfg.num_pdfs, dtype=cfg.dtype,
            bn_impl=cfg.bn_impl, name="xent_head",
        )(x, train)
        return chain, xent
