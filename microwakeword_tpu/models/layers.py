"""Streaming conv layer library (flax) -- the TPU-native equivalent of the
reference's kws_streaming-derived Keras wrappers (microwakeword/layers/).

Design (SURVEY.md §7): instead of wrapping Keras cells and performing
mode-flipping graph surgery (reference stream.py + utils.py), each layer is
a single flax module with a ``streaming`` flag:

- non-streaming: valid convolution over the full time axis (training and
  non-streaming inference apply NO padding; the data pipeline supplies
  spectrograms of exactly the right length, reference stream.py:654-695).
- streaming: explicit ring-buffer state in the ``cache`` variable
  collection.  Ring sizes follow the reference formulas
  (stream.py:241-255): strided/one-step conv keeps
  ``max(0, dilation*(k-1) - (stride-1))`` past frames; the streaming step
  concatenates [ring, new_frames], runs the valid conv on the result, and
  keeps the last ``ring`` frames as the new state.

Tensors are [batch, time, channels] -- the reference's [B, T, 1, C] with
the singleton frequency axis folded away (its 40 mel features are conv
*channels*; all convs are (k, 1) in time, mixednet.py:313-331).

Streaming/non-streaming parity is enforced by tests
(tests/test_layers_streaming.py), the single most load-bearing invariant
in the system (SURVEY.md §4).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# Keras-compatible initializer/BN defaults, for training-dynamics parity
# with the reference (keras Conv2D/Dense default glorot_uniform; keras
# BatchNormalization momentum=0.99, epsilon=1e-3).
KERNEL_INIT = nn.initializers.glorot_uniform()
BN_MOMENTUM = 0.99
BN_EPSILON = 1e-3


def conv_ring_size(kernel_size: int, stride: int = 1, dilation: int = 1) -> int:
    """Ring-buffer frames for a strided valid conv (reference stream.py:246-255)."""
    return max(0, dilation * (kernel_size - 1) - (stride - 1))


class StreamConv(nn.Module):
    """Valid 1D convolution over time with optional streaming ring buffer.

    Equivalent of Stream(Conv2D(k,1)) with use_one_step=False
    (reference mixednet.py:317-329, inception.py:262-269 -- the one-step
    variant differs only in state layout, not in outputs).
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    streaming: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", KERNEL_INIT, (self.kernel_size, in_features, self.features)
        )
        if self.streaming:
            ring = conv_ring_size(self.kernel_size, self.stride, self.dilation)
            if ring > 0:
                buf = self.variable(
                    "cache",
                    "ring",
                    lambda: jnp.zeros((x.shape[0], ring, in_features), x.dtype),
                )
                x = jnp.concatenate([buf.value, x], axis=1)
                buf.value = x[:, -ring:]
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride,),
            padding="VALID",
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class MixConv(nn.Module):
    """Mixed-kernel depthwise conv over time (reference mixednet.py:168-231).

    TPU-native formulation: the reference splits channels into groups, runs a
    different-size depthwise conv per group from one shared ring buffer
    (StridedKeep), then drops leading frames to align (StridedDrop).  That is
    mathematically identical to ONE depthwise conv of width max(k) whose
    weights are zero-masked so group g only sees its most recent k_g taps --
    one fused op, one ring buffer, and the mask keeps masked taps at exactly
    zero through training (zero gradient).

    The reference's per-branch DepthwiseConv2D keeps Keras' default
    use_bias=True (mixednet.py:209), but every MixConv output immediately
    feeds a bias-free 1x1 conv followed by BatchNorm, whose beta absorbs any
    constant channel shift -- the depthwise bias is redundant and off by
    default here.  ``use_bias=True`` restores it for exact cross-framework
    weight transfer (scripts/trainer_ab.py).
    """

    kernel_sizes: Sequence[int]
    streaming: bool = False
    use_bias: bool = False

    @staticmethod
    def split_channels(total: int, groups: int) -> list[int]:
        # reference mixednet.py:132-136: first group absorbs the remainder.
        split = [total // groups] * groups
        split[0] += total - sum(split)
        return split

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        channels = x.shape[-1]
        kmax = max(self.kernel_sizes)
        splits = self.split_channels(channels, len(self.kernel_sizes))
        # Static tap mask: [kmax, channels]; group g uses taps [kmax-k_g, kmax).
        mask = np.zeros((kmax, channels), dtype=np.float32)
        start = 0
        for width, k in zip(splits, self.kernel_sizes):
            mask[kmax - k :, start : start + width] = 1.0
            start += width
        # Per-group glorot: fan computed on each group's true [k_g, 1, C_g]
        # sub-kernel, matching the reference's per-branch DepthwiseConv2D
        # inits (mixednet.py:197-231) -- a single glorot over the masked
        # [kmax, 1, C] kernel would shrink small-kernel groups' variance.
        def mixconv_init(key, shape, dtype=jnp.float32):
            kernel = jnp.zeros(shape, dtype)
            start_c = 0
            for g, (width, k) in enumerate(zip(splits, self.kernel_sizes)):
                sub = KERNEL_INIT(
                    jax.random.fold_in(key, g), (k, 1, width), dtype
                )
                kernel = kernel.at[
                    kmax - k :, :, start_c : start_c + width
                ].set(sub)
                start_c += width
            return kernel

        kernel = self.param("kernel", mixconv_init, (kmax, 1, channels))
        kernel = kernel * mask[:, None, :]
        if self.streaming:
            ring = kmax - 1
            if ring > 0:
                buf = self.variable(
                    "cache",
                    "ring",
                    lambda: jnp.zeros((x.shape[0], ring, channels), x.dtype),
                )
                x = jnp.concatenate([buf.value, x], axis=1)
                buf.value = x[:, -ring:]
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=channels,
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (channels,))
        return y


class StreamBuffer(nn.Module):
    """Identity ring buffer: collects a sliding window of ``window`` frames.

    Equivalent of Stream(Identity, ring_buffer_size_in_time_dim=window-1)
    (reference mixednet.py:369-373): in streaming mode each step returns the
    full [B, window, C] memory; in non-streaming mode it is the identity
    (input already has the full time axis).
    """

    window: int
    streaming: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if not self.streaming:
            return x
        ring = self.window - x.shape[1]
        if ring <= 0:
            return x[:, -self.window :]
        buf = self.variable(
            "cache",
            "ring",
            lambda: jnp.zeros((x.shape[0], ring, x.shape[-1]), x.dtype),
        )
        memory = jnp.concatenate([buf.value, x], axis=1)
        buf.value = memory[:, -ring:]
        return memory


class Delay(nn.Module):
    """FIFO delay line (reference layers/delay.py:114-135).

    Streaming: emits frames delayed by ``delay`` steps.  Non-streaming with
    ``also_in_non_streaming``: left-pad + crop to emulate.
    """

    delay: int
    also_in_non_streaming: bool = False
    streaming: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.delay <= 0:
            return x
        if not self.streaming:
            if self.also_in_non_streaming:
                pad = jnp.zeros_like(x[:, : self.delay])
                return jnp.concatenate([pad, x], axis=1)[:, : x.shape[1]]
            return x
        buf = self.variable(
            "cache",
            "ring",
            lambda: jnp.zeros((x.shape[0], self.delay, x.shape[-1]), x.dtype),
        )
        memory = jnp.concatenate([buf.value, x], axis=1)
        buf.value = memory[:, -self.delay :]
        return memory[:, : x.shape[1]]


class BatchNorm(nn.Module):
    """Keras-default BatchNormalization (momentum 0.99, epsilon 1e-3)."""

    use_running_average: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPSILON,
        )(x)


class SubSpectralNorm(nn.Module):
    """BatchNorm over channel sub-groups (reference
    layers/sub_spectral_normalization.py:38-62).

    With the singleton frequency axis folded away, the reference reshape
    [B,T,1,C] -> [B,T,C/g,g] normalizes over a g-sized feature axis whose
    statistics/params are shared across the C/g groups.
    """

    sub_groups: int
    use_running_average: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, c = x.shape
        g = self.sub_groups
        if c % g:
            raise ValueError(f"channels {c} not divisible by sub_groups {g}")
        bn = nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPSILON,
        )
        if g == 1:
            return bn(x)
        y = x.reshape(b, t, c // g, g)
        y = bn(y)
        return y.reshape(b, t, c)


class PointwiseConv(nn.Module):
    """1x1 conv over channels == a dense projection; runs on the MXU."""

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", KERNEL_INIT, (x.shape[-1], self.features))
        y = jnp.einsum("btc,cf->btf", x, kernel)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class StreamAveragePooling(nn.Module):
    """Streamable average pooling over time (reference
    layers/average_pooling2d.py:62-84, there expressed as a fixed-weight
    depthwise conv so the Stream wrapper can ring-buffer it).

    Here the 1/k weights are a compile-time constant rather than a
    trainable variable -- the reference's ``add_weight`` without
    ``trainable=False`` (a latent bug, SURVEY.md §8.4) is deliberately not
    reproduced.
    """

    kernel_size: int
    stride: int = 1
    streaming: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        channels = x.shape[-1]
        if self.streaming:
            ring = conv_ring_size(self.kernel_size, self.stride)
            if ring > 0:
                buf = self.variable(
                    "cache",
                    "ring",
                    lambda: jnp.zeros((x.shape[0], ring, channels), x.dtype),
                )
                x = jnp.concatenate([buf.value, x], axis=1)
                buf.value = x[:, -ring:]
        kernel = jnp.full(
            (self.kernel_size, 1, channels), 1.0 / self.kernel_size, x.dtype
        )
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride,),
            padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=channels,
        )


class StreamConvTranspose(nn.Module):
    """Transposed 1D conv over time with overlap-add streaming state
    (reference stream.py:184, 522-564).

    Non-streaming: transposed conv cropped to T*stride frames (the
    reference Stream wrapper's transposed_conv_crop_output=True default,
    stream.py:626-666); crop_output=False keeps the full (T-1)*stride + k
    frames.  Streaming: each step of m frames emits m*stride frames; the
    trailing ``k - stride`` frames of partial sums are carried as state and
    overlap-added into the next step (requires kernel_size >= stride).  The
    streamed concatenation equals the non-streaming (cropped) output.  Bias
    is added per *emitted* frame (the reference instead subtracts the bias
    from the carried remainder, stream.py:549-556 -- same result).
    """

    features: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = False
    streaming: bool = False
    crop_output: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.streaming and self.kernel_size < self.stride:
            raise ValueError(
                f"streaming StreamConvTranspose requires kernel_size "
                f"({self.kernel_size}) >= stride ({self.stride}); smaller "
                "kernels would emit fewer than stride frames per step"
            )
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", KERNEL_INIT, (self.kernel_size, self.features, in_features)
        )
        # Overlap-add semantics: y[t*stride + j] += x[t] @ kernel[j].T
        # (kernel [k, out, in], "HIO" + transpose_kernel=True; verified
        # against a manual scatter in tests).
        y = jax.lax.conv_transpose(
            x,
            kernel,
            strides=(self.stride,),
            padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            transpose_kernel=True,
        )
        if not self.streaming and self.crop_output:
            y = y[:, : x.shape[1] * self.stride]
        if self.streaming:
            remainder = max(self.kernel_size - self.stride, 0)
            if remainder > 0:
                buf = self.variable(
                    "cache",
                    "ring",
                    lambda: jnp.zeros(
                        (x.shape[0], remainder, self.features), x.dtype
                    ),
                )
                y = y.at[:, :remainder].add(buf.value)
                emit = x.shape[1] * self.stride
                buf.value = y[:, emit:]
                y = y[:, :emit]
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


def align_time(residual: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Drop leading frames so ``residual`` matches ``target``'s time length.

    Equivalent of StridedDrop in non-streaming mode (reference
    strided_drop.py:40-44); in streaming mode both sides are the newest
    frame(s) and this is the identity -- which falls out of the slice.
    """
    drop = residual.shape[1] - target.shape[1]
    return residual[:, drop:] if drop > 0 else residual
