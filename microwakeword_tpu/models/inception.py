"""Inception wake-word model (TPU-native rebuild of reference inception.py).

Architecture (reference inception.py:233-338): stack of first valid streaming
convs with SubSpectralNorm -> inception blocks with three branches of
1x1 / (k,1) valid convs aligned by leading-frame drops -> concat -> 1x1 conv
-> streaming flatten window -> dropout -> Dense(1, sigmoid).

Note: the reference passes padding="None" (a string) so its Delay layers and
'same' time padding are dead code (SURVEY.md §8.3) -- the branches
effectively use valid padding with StridedDrop alignment, which is what we
implement directly.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from microwakeword_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class InceptionConfig:
    """Defaults follow reference inception.py:146-209."""

    cnn1_filters: Sequence[int] = (24,)
    cnn1_kernel_sizes: Sequence[int] = (5,)
    cnn1_subspectral_groups: Sequence[int] = (4,)
    cnn2_filters1: Sequence[int] = (10, 10, 16)
    cnn2_filters2: Sequence[int] = (10, 10, 16)
    cnn2_kernel_sizes: Sequence[int] = (5, 5, 5)
    cnn2_subspectral_groups: Sequence[int] = (1, 1, 1)
    cnn2_dilation: Sequence[int] = (1, 1, 1)
    dropout: float = 0.2
    spectrogram_length: int = 124
    stride: int = 1  # first-layer stride; always 1 for inception


def spectrogram_slices_dropped(cfg: InceptionConfig) -> int:
    """Reference inception.py:212-230."""
    dropped = 0
    for k in cfg.cnn1_kernel_sizes:
        dropped += k - 1
    for k, d in zip(cfg.cnn2_kernel_sizes, cfg.cnn2_dilation):
        dropped += 2 * d * (k - 1)
    return dropped


def tail_length(cfg: InceptionConfig) -> int:
    return cfg.spectrogram_length - spectrogram_slices_dropped(cfg)


class ConvBnRelu(nn.Module):
    """conv2d_bn equivalent (reference inception.py:46-88): valid conv +
    SubSpectralNorm + relu."""

    features: int
    kernel_size: int = 1
    dilation: int = 1
    sub_groups: int = 1
    streaming: bool = False
    train: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.kernel_size == 1:
            x = L.PointwiseConv(self.features)(x)
        else:
            x = L.StreamConv(
                self.features,
                self.kernel_size,
                dilation=self.dilation,
                streaming=self.streaming,
            )(x)
        x = L.SubSpectralNorm(
            self.sub_groups, use_running_average=not self.train
        )(x)
        return nn.relu(x)


class Inception(nn.Module):
    cfg: InceptionConfig
    streaming: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        for filters, k, groups in zip(
            cfg.cnn1_filters, cfg.cnn1_kernel_sizes, cfg.cnn1_subspectral_groups
        ):
            x = ConvBnRelu(
                filters, k, sub_groups=groups, streaming=self.streaming, train=train
            )(x)

        for f1, f2, k, groups, dil in zip(
            cfg.cnn2_filters1,
            cfg.cnn2_filters2,
            cfg.cnn2_kernel_sizes,
            cfg.cnn2_subspectral_groups,
            cfg.cnn2_dilation,
        ):
            common = dict(sub_groups=groups, streaming=self.streaming, train=train)
            b1 = ConvBnRelu(f1, 1, **common)(x)
            b2 = ConvBnRelu(f1, 1, **common)(x)
            b2 = ConvBnRelu(f1, k, dilation=dil, **common)(b2)
            b3 = ConvBnRelu(f1, 1, **common)(x)
            b3 = ConvBnRelu(f1, k, dilation=dil, **common)(b3)
            b3 = ConvBnRelu(f1, k, dilation=dil, **common)(b3)
            b1 = L.align_time(b1, b3)
            b2 = L.align_time(b2, b3)
            x = jnp.concatenate([b1, b2, b3], axis=-1)
            x = ConvBnRelu(f2, 1, streaming=self.streaming, train=train)(x)

        x = L.StreamBuffer(tail_length(cfg), streaming=self.streaming)(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dropout(cfg.dropout, deterministic=not train)(x)
        logits = nn.Dense(1, kernel_init=L.KERNEL_INIT)(x)
        return nn.sigmoid(logits)
