"""XLA frontend vs NumPy reference: must agree (near-)exactly, both forms."""
import os

import numpy as np
import pytest

from microwakeword_tpu.frontend import reference as ref
from microwakeword_tpu.frontend import xla as fx

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "frontend.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.mark.parametrize("step_ms", [10, 20])
def test_batch_matches_reference(golden, step_ms):
    audio = golden["audio_modulated"]
    want = (
        ref.MicroFrontend(step_ms=step_ms).process_clip(audio).astype(np.float32)
        * ref.FEATURE_SCALE
    )
    got = np.asarray(fx.frontend_batch(audio[None, :], step_ms=step_ms))[0]
    assert got.shape == want.shape
    # f32 matmul vs f64 numpy can flip the floor/round at rare boundaries.
    d = np.abs(got - want)
    assert (d > 0.5).mean() < 0.003
    assert np.median(d) == 0.0


def test_batch_is_batched(golden):
    a1 = golden["audio_modulated"]
    a2 = golden["audio_speechish"]
    batch = np.stack([a1, a2])
    got = np.asarray(fx.frontend_batch(batch))
    solo1 = np.asarray(fx.frontend_batch(a1[None]))[0]
    solo2 = np.asarray(fx.frontend_batch(a2[None]))[0]
    np.testing.assert_allclose(got[0], solo1, atol=1e-5)
    np.testing.assert_allclose(got[1], solo2, atol=1e-5)


def test_streaming_step_matches_batch(golden):
    audio = golden["audio_speechish"][:16000]
    batch = np.asarray(fx.frontend_batch(audio[None]))[0]
    frames = ref.frame_audio(audio, 10)
    est = fx.streaming_state_init()
    outs = []
    for t in range(frames.shape[0]):
        f, est = fx.frontend_step(frames[t].astype(np.float32), est)
        outs.append(np.asarray(f))
    stream = np.stack(outs)
    np.testing.assert_allclose(stream, batch, atol=1e-4)


def test_float_input_convention(golden):
    audio = golden["audio_noise_2000"]
    gi = np.asarray(fx.frontend_batch(audio[None]))
    gf = np.asarray(fx.frontend_batch((audio.astype(np.float32) / 32768.0)[None]))
    np.testing.assert_allclose(gi, gf, atol=1e-5)


def test_frame_audio_matches_reference(golden):
    audio = golden["audio_noise_50"]
    for step_ms in (10, 20):
        want = ref.frame_audio(audio, step_ms)
        got = np.asarray(fx.frame_audio(audio.astype(np.float32), step_ms))
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want.astype(np.float32))


def test_ema_matmul_matches_associative_scan():
    """The triangular-matmul EMA (time-minor fast path) must match the
    associative-scan fallback (exercised via a time-major 3D layout) to
    float tolerance, including the initial-estimate carry."""
    import jax.numpy as jnp

    from microwakeword_tpu.frontend import xla as F

    rng = np.random.default_rng(0)
    sf = rng.uniform(0, 5000, (3, 57, 40)).astype(np.float32)
    est0 = rng.uniform(0, 3000, (3, 40)).astype(np.float32)

    fast, fin_fast = F.frontend_streaming(jnp.asarray(sf), jnp.asarray(est0),
                                          axis=-2)
    # time-major [T, B, 40] with axis=0 hits the associative-scan fallback
    slow, fin_slow = F.frontend_streaming(
        jnp.asarray(sf.transpose(1, 0, 2)), jnp.asarray(est0), axis=0
    )
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(slow).transpose(1, 0, 2), atol=1e-2,
        rtol=0,
    )
    np.testing.assert_allclose(np.asarray(fin_fast), np.asarray(fin_slow),
                               rtol=1e-5)


def test_ema_long_clip_chunked_path():
    """T > _EMA_CHUNK takes the chunked matmul-EMA path (memory O(T*chunk),
    not O(T^2) -- long ambient WAVs in generate_pool hit T in the tens of
    thousands); it must match the associative-scan fallback exactly,
    including across chunk boundaries and the non-multiple tail."""
    import jax.numpy as jnp

    from microwakeword_tpu.frontend import xla as F

    rng = np.random.default_rng(1)
    t = F._EMA_CHUNK * 2 + 137  # >2 chunks, non-multiple tail
    sf = rng.uniform(0, 5000, (2, t, 40)).astype(np.float32)
    est0 = rng.uniform(0, 3000, (2, 40)).astype(np.float32)

    fast, fin_fast = F.frontend_streaming(jnp.asarray(sf), jnp.asarray(est0),
                                          axis=-2)
    slow, fin_slow = F.frontend_streaming(
        jnp.asarray(sf.transpose(1, 0, 2)), jnp.asarray(est0), axis=0
    )
    assert fast.shape == (2, t, 40)
    # matmul vs scan accumulation order can flip the round/floor at rare
    # quantization boundaries (same effect the golden test tolerates)
    d = np.abs(np.asarray(fast) - np.asarray(slow).transpose(1, 0, 2))
    assert (d > 0.5).mean() < 1e-4
    assert np.median(d) == 0.0
    np.testing.assert_allclose(np.asarray(fin_fast), np.asarray(fin_slow),
                               rtol=1e-4)
