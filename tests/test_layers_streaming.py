"""Layer-level streaming parity: scanning a layer frame-by-frame with ring
buffers must reproduce the valid non-streaming computation -- the single
most load-bearing invariant in the system (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microwakeword_tpu.models import layers as L


def stream_all(module, variables, x, block):
    """Feed x ([B,T,C]) in blocks of `block` frames, concat outputs.

    Cache is initialized on a zero block so the ring buffers start at zero
    (matching the reference's zero-initialized `states`)."""
    cache = module.init(jax.random.PRNGKey(0), jnp.zeros_like(x[:, :block])).get(
        "cache", {}
    )
    outs = []
    for t in range(0, x.shape[1], block):
        y, updates = module.apply(
            {**variables, "cache": cache}, x[:, t : t + block], mutable=["cache"]
        )
        cache = updates["cache"]
        outs.append(y)
    return jnp.concatenate(outs, axis=1)


@pytest.mark.parametrize("kernel,stride", [(3, 1), (5, 1), (3, 3), (5, 3), (1, 3)])
def test_streamconv_parity(kernel, stride):
    """Streaming step m computes the valid-conv window starting at input
    frame s*m - ring (reference stream.py:246-255 keeps the newest frames);
    so full-mode parity holds against x trimmed by r = (-ring) % stride."""
    rng = jax.random.PRNGKey(1)
    B, T, C, F = 2, 24, 8, 6
    x = jax.random.normal(rng, (B, T, C))
    full_mod = L.StreamConv(F, kernel, stride=stride)
    s_mod = L.StreamConv(F, kernel, stride=stride, streaming=True)
    variables = full_mod.init(rng, x)
    ring = L.conv_ring_size(kernel, stride)
    r = (-ring) % stride
    full = full_mod.apply(variables, x[:, r:])  # [B, T_out, F]
    stream = stream_all(s_mod, {"params": variables["params"]}, x, stride)
    # Streaming warms up once the ring holds real frames; compare tails
    # (both sequences' final windows end at the same input frame).
    k = min(full.shape[1], stream.shape[1]) - 2
    assert k > 2
    np.testing.assert_allclose(stream[:, -k:], full[:, -k:], atol=1e-5)


@pytest.mark.parametrize("kernels", [(5,), (3, 5), (5, 9, 13), (5, 9, 13, 21)])
def test_mixconv_parity_and_equivalence(kernels):
    rng = jax.random.PRNGKey(2)
    B, T, C = 2, 64, 12
    x = jax.random.normal(rng, (B, T, C))
    full_mod = L.MixConv(kernels)
    s_mod = L.MixConv(kernels, streaming=True)
    variables = full_mod.init(rng, x)
    full = full_mod.apply(variables, x)
    assert full.shape == (B, T - max(kernels) + 1, C)

    # Equivalence with the reference's explicit per-group formulation:
    # each group's valid depthwise conv, then drop leading frames to align.
    kernel = np.asarray(variables["params"]["kernel"])  # [kmax, 1, C]
    kmax = max(kernels)
    splits = L.MixConv.split_channels(C, len(kernels))
    start = 0
    explicit = []
    xn = np.asarray(x)
    for width, k in zip(splits, kernels):
        w = kernel[kmax - k :, 0, start : start + width]  # [k, width]
        outs = np.zeros((B, T - k + 1, width))
        for t in range(T - k + 1):
            outs[:, t] = np.einsum("bkc,kc->bc", xn[:, t : t + k, start : start + width], w)
        explicit.append(outs[:, (kmax - k) :])  # StridedDrop alignment
        start += width
    explicit = np.concatenate(explicit, axis=-1)
    np.testing.assert_allclose(full, explicit, atol=1e-4)

    # Streaming parity.
    stream = stream_all(s_mod, {"params": variables["params"]}, x, 1)
    warm = full.shape[1] - (kmax - 1)
    assert warm > 2
    np.testing.assert_allclose(stream[:, -warm:], full[:, -warm:], atol=1e-5)


def test_streambuffer_window():
    rng = jax.random.PRNGKey(3)
    B, T, C, W = 2, 12, 4, 5
    x = jax.random.normal(rng, (B, T, C))
    s_mod = L.StreamBuffer(W, streaming=True)
    cache = s_mod.init(rng, x[:, :1]).get("cache", {})
    outs = []
    for t in range(T):
        y, upd = s_mod.apply({"cache": cache}, x[:, t : t + 1], mutable=["cache"])
        cache = upd["cache"]
        outs.append(y)
    # After warmup, step t returns frames [t-W+1 .. t].
    for t in range(W - 1, T):
        np.testing.assert_allclose(outs[t], x[:, t - W + 1 : t + 1], atol=1e-6)
    # Non-streaming: identity.
    np.testing.assert_allclose(
        L.StreamBuffer(W, streaming=False).apply({}, x), x, atol=1e-6
    )


def test_delay_fifo():
    rng = jax.random.PRNGKey(4)
    B, T, C, D = 1, 10, 3, 4
    x = jax.random.normal(rng, (B, T, C))
    mod = L.Delay(D, streaming=True)
    cache = mod.init(rng, jnp.zeros_like(x[:, :1])).get("cache", {})
    outs = []
    for t in range(T):
        y, upd = mod.apply({"cache": cache}, x[:, t : t + 1], mutable=["cache"])
        cache = upd["cache"]
        outs.append(y)
    got = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(got[:, D:], x[:, : T - D], atol=1e-6)
    np.testing.assert_allclose(got[:, :D], 0.0, atol=1e-6)


def test_subspectral_norm_groups():
    rng = jax.random.PRNGKey(5)
    x = jax.random.normal(rng, (3, 7, 8))
    mod = L.SubSpectralNorm(4, use_running_average=False)
    variables = mod.init(rng, x)
    # Param shape: BN over the reshaped g-sized axis -> 4 scale/bias params.
    assert variables["params"]["BatchNorm_0"]["scale"].shape == (4,)
    y, _ = mod.apply(variables, x, mutable=["batch_stats"])
    assert y.shape == x.shape
    with pytest.raises(ValueError):
        L.SubSpectralNorm(3).init(rng, x)


def test_align_time():
    a = jnp.arange(24).reshape(1, 12, 2)
    b = jnp.zeros((1, 5, 2))
    out = L.align_time(a, b)
    np.testing.assert_array_equal(out, a[:, 7:])
    np.testing.assert_array_equal(L.align_time(b, b), b)


@pytest.mark.parametrize("kernel,stride", [(2, 2), (4, 2), (3, 1), (5, 5)])
def test_stream_conv_transpose_parity(kernel, stride):
    """Streamed overlap-add concat == non-streaming (cropped) transposed
    conv (ADVICE r1: crop to T*stride like the reference's
    transposed_conv_crop_output=True default, stream.py:626-666)."""
    rng = jax.random.PRNGKey(2)
    B, T, C, F = 2, 12, 6, 4
    x = jax.random.normal(rng, (B, T, C))
    full_mod = L.StreamConvTranspose(F, kernel, stride=stride, use_bias=True)
    s_mod = L.StreamConvTranspose(
        F, kernel, stride=stride, use_bias=True, streaming=True
    )
    variables = full_mod.init(rng, x)
    full = full_mod.apply(variables, x)
    assert full.shape == (B, T * stride, F)  # cropped
    stream = stream_all(s_mod, {"params": variables["params"]}, x, 1)
    assert stream.shape == (B, T * stride, F)
    np.testing.assert_allclose(stream, full, atol=1e-5)


def test_stream_conv_transpose_kernel_lt_stride_rejected():
    x = jnp.zeros((1, 4, 3))
    mod = L.StreamConvTranspose(2, kernel_size=1, stride=3, streaming=True)
    with pytest.raises(ValueError):
        mod.init(jax.random.PRNGKey(0), x)


@pytest.mark.parametrize("kernel,stride", [(2, 2), (3, 1), (4, 2), (3, 3)])
def test_stream_average_pooling_parity(kernel, stride):
    """Streamed average pooling == valid non-streaming pooling on the
    aligned tail (same ring logic as StreamConv)."""
    rng = jax.random.PRNGKey(3)
    B, T, C = 2, 24, 5
    x = jax.random.normal(rng, (B, T, C))
    full_mod = L.StreamAveragePooling(kernel, stride=stride)
    s_mod = L.StreamAveragePooling(kernel, stride=stride, streaming=True)
    variables = full_mod.init(rng, x)
    ring = L.conv_ring_size(kernel, stride)
    r = (-ring) % stride
    full = full_mod.apply(variables, x[:, r:])
    stream = stream_all(s_mod, {"params": variables.get("params", {})}, x, stride)
    k = min(full.shape[1], stream.shape[1]) - 2
    assert k > 2
    np.testing.assert_allclose(stream[:, -k:], full[:, -k:], atol=1e-5)
