"""MixedNet wake-word model (TPU-native rebuild of reference mixednet.py).

Architecture (reference mixednet.py:278-386): optional first strided valid
Conv -> blocks of [MixConv (mixed-kernel depthwise) -> 1x1 conv -> BN ->
optional 1x1-conv residual -> relu] -> tail sliding-window buffer ->
optional CBAM spatial attention / global pooling -> Flatten -> Dense(1,
sigmoid).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from microwakeword_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class MixedNetConfig:
    """Hyperparameters; defaults follow reference mixednet.py:43-105.

    (The reference's default residual_connection list has 5 entries vs 4
    blocks, which its own length check rejects -- we use 4.)
    """

    pointwise_filters: Sequence[int] = (48, 48, 48, 48)
    repeat_in_block: Sequence[int] = (1, 1, 1, 1)
    mixconv_kernel_sizes: Sequence[Sequence[int]] = ((5,), (9,), (13,), (21,))
    residual_connection: Sequence[bool] = (False, False, False, False)
    first_conv_filters: int = 32
    first_conv_kernel_size: int = 3
    stride: int = 1
    max_pool: bool = False
    pooled: bool = False
    spatial_attention: bool = False
    # keeps the reference's (redundant-before-BN) depthwise biases; used for
    # exact cross-framework weight transfer (scripts/trainer_ab.py)
    mixconv_bias: bool = False
    spectrogram_length: int = 194  # training input frames (model input T)

    def __post_init__(self):
        n = len(self.pointwise_filters)
        for name in ("repeat_in_block", "mixconv_kernel_sizes", "residual_connection"):
            if len(getattr(self, name)) != n:
                raise ValueError(f"{name} must have {n} entries")
        t = tail_length(self)
        if t < 1:
            raise ValueError(
                f"spectrogram_length {self.spectrogram_length} too short for "
                f"this architecture (tail length {t}); needs at least "
                f"{self.spectrogram_length - t + 1} frames"
            )


def spectrogram_slices_dropped(cfg: MixedNetConfig) -> int:
    """Input slices consumed by valid padding (reference mixednet.py:108-129)."""
    dropped = 0
    if cfg.first_conv_filters > 0:
        dropped += cfg.first_conv_kernel_size - 1
    for repeat, ksizes in zip(cfg.repeat_in_block, cfg.mixconv_kernel_sizes):
        dropped += repeat * (max(ksizes) - 1) * cfg.stride
    return dropped


def tail_length(cfg: MixedNetConfig) -> int:
    """Time frames remaining at the tail for input length spectrogram_length."""
    t = cfg.spectrogram_length
    if cfg.first_conv_filters > 0:
        t = (t - cfg.first_conv_kernel_size) // cfg.stride + 1
    for repeat, ksizes in zip(cfg.repeat_in_block, cfg.mixconv_kernel_sizes):
        for _ in range(repeat):
            if max(ksizes) > 1:
                t -= max(ksizes) - 1
    return t


class SpatialAttention(nn.Module):
    """CBAM-style spatial attention over the tail window (reference
    mixednet.py:234-275).  NOTE: like the reference, streaming mode gates
    only the newest frame, so streaming != non-streaming when enabled; the
    flag is off by default."""

    window: int
    kernel_size: int = 4
    streaming: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pooled = jnp.stack([x.mean(axis=-1), x.max(axis=-1)], axis=-1)  # [B,T,2]
        att = L.StreamConv(
            1, self.kernel_size, use_bias=False, streaming=self.streaming
        )(pooled)
        att = nn.sigmoid(att)  # [B, T-k+1, 1] (streaming: [B,1,1])
        net = L.StreamBuffer(self.window, streaming=self.streaming)(x)
        net = net[:, -att.shape[1] :]
        return net * att


class MixedNet(nn.Module):
    cfg: MixedNetConfig
    streaming: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: [B, T, 40] spectrogram (streaming: [B, stride, 40] newest
        slices).  Returns [B, 1] wake probability."""
        cfg = self.cfg
        if cfg.first_conv_filters > 0:
            x = L.StreamConv(
                cfg.first_conv_filters,
                cfg.first_conv_kernel_size,
                stride=cfg.stride,
                streaming=self.streaming,
            )(x)
            x = nn.relu(x)

        for filters, repeat, ksizes, res in zip(
            cfg.pointwise_filters,
            cfg.repeat_in_block,
            cfg.mixconv_kernel_sizes,
            cfg.residual_connection,
        ):
            if res:
                residual = L.PointwiseConv(filters)(x)
                residual = L.BatchNorm(use_running_average=not train)(residual)
            for _ in range(repeat):
                if max(ksizes) > 1:
                    x = L.MixConv(
                        tuple(ksizes),
                        streaming=self.streaming,
                        use_bias=cfg.mixconv_bias,
                    )(x)
                x = L.PointwiseConv(filters)(x)
                x = L.BatchNorm(use_running_average=not train)(x)
                if res:
                    residual = L.align_time(residual, x)
                    x = x + residual
                x = nn.relu(x)

        t_tail = tail_length(cfg)
        if t_tail > 1:
            if cfg.spatial_attention:
                x = SpatialAttention(window=t_tail, streaming=self.streaming)(x)
            else:
                x = L.StreamBuffer(t_tail, streaming=self.streaming)(x)
            if cfg.pooled:
                x = x.max(axis=1, keepdims=True) if cfg.max_pool else x.mean(
                    axis=1, keepdims=True
                )
        x = x.reshape(x.shape[0], -1)
        logits = nn.Dense(1, kernel_init=L.KERNEL_INIT)(x)
        return nn.sigmoid(logits)
