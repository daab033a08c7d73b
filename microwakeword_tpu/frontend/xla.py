"""JAX/XLA micro-frontend: the on-device (TPU) feature pipeline.

TPU-first design (not a port of the C code's loop structure):

- Framing uses strided slices of 10 ms chunks (no gathers).
- Window + real DFT are folded into two [480 x 257] matmuls that run on the
  MXU: mel_energy = ((f@WC)^2 + (f@WS)^2) @ MEL.  A 512-point FFT would
  underutilize the MXU at this size; a dense DFT matmul is faster and fuses
  with the mel projection.
- The only sequential part (noise-suppression EMA + PCAN, ~tens of FLOPs per
  channel per hop) runs as a `lax.scan` over hops with a [B, 40] carry.

Numerics match microwakeword_tpu.frontend.reference (and through it the C
micro frontend, see reference.py docstring): uint16-quantized features,
float = uint16 * 0.0390625 in [0, 26].

Public entry points:
- ``frontend_batch(audio_int16[B, N])    -> features[B, T, 40] float32``
- ``frontend_streaming(frames, est)      -> (features, est)`` for scan-style
  streaming inference with explicit carried state.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from microwakeword_tpu.frontend import reference as ref

NUM_CHANNELS = ref.NUM_CHANNELS
WINDOW_SAMPLES = ref.WINDOW_SAMPLES
FEATURE_SCALE = ref.FEATURE_SCALE


@functools.lru_cache(maxsize=None)
def _dft_mel_constants():
    """Window-folded DFT cos/sin matrices and the mel matrix (f64->f32)."""
    w = ref.hann_window()  # [480]
    n = np.arange(ref.FFT_SIZE)
    k = np.arange(ref.N_FFT_BINS)
    # rfft with zero padding to 512: X_k = sum_{i<480} x_i w_i e^{-2pi i j k/512}
    ang = 2.0 * np.pi * np.outer(n[: ref.WINDOW_SAMPLES], k) / ref.FFT_SIZE
    wc = (w[:, None] * np.cos(ang)).astype(np.float32)  # [480, 257]
    ws = (w[:, None] * -np.sin(ang)).astype(np.float32)
    mel = ref.mel_filterbank_matrix().astype(np.float32)  # [257, 40]
    smoothing = ref._SMOOTHING.astype(np.float32)  # [40]
    # NOTE: return plain NumPy -- jnp.asarray inside a jit trace would return
    # (and leak, via the lru_cache) a tracer. NumPy constants are embedded
    # per-trace by XLA.
    return wc, ws, mel, smoothing


@functools.lru_cache(maxsize=16)
def _ema_matrices(t: int):
    """Constant EMA kernels for the noise-estimate recurrence at length T.

    Returns (low [2, T, T] f32, decay [T, 40] f32) as NumPy:
    low[p, t, i] = s_p * (1-s_p)^(t-i) for i <= t (else 0) with p = channel
    parity (even/odd smoothing, reference.py); decay[t, c] = (1-s_c)^(t+1)
    carries the initial estimate.  NumPy so jit traces embed constants
    (same note as _dft_mel_constants)."""
    sm = np.array([ref.EVEN_SMOOTHING, ref.ODD_SMOOTHING], np.float64)
    i = np.arange(t)
    diff = i[:, None] - i[None, :]  # [T, T] = t - i
    low = np.where(
        diff >= 0,
        sm[:, None, None] * (1.0 - sm[:, None, None]) ** np.maximum(diff, 0),
        0.0,
    )
    decay = (1.0 - ref._SMOOTHING.astype(np.float64))[None, :] ** (
        i[:, None] + 1
    )
    return low.astype(np.float32), decay.astype(np.float32)


# Max frame count handled by a single [T, T] EMA matmul.  Above this the
# recurrence is evaluated in chunks with a carried estimate: the matmul
# kernel's memory is O(T^2) (a minutes-long ambient WAV in generate_pool /
# build_dataset gives T in the tens of thousands -> tens of GB), while the
# chunked form stays O(T * chunk) with identical numerics (the carry is the
# exact estimate at the chunk boundary).
_EMA_CHUNK = 1024


def _ema_block(sf: jnp.ndarray, noise_estimate: jnp.ndarray, low, decay):
    """Noise-estimate EMA over one [..., T, 40] block via the triangular
    matmul; ``low``/``decay`` from _ema_matrices(T).  Returns est [..., T, 40].
    """
    bsf = sf.reshape(sf.shape[:-1] + (NUM_CHANNELS // 2, 2))
    est = jnp.einsum(
        "pti,...ikp->...tkp", low, bsf,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(sf.shape)
    return est + decay * noise_estimate[..., None, :]


def frame_audio(audio: jnp.ndarray, step_ms: int = 10) -> jnp.ndarray:
    """[..., N] samples -> [..., T, 480] frames, hop = 16*step_ms samples.

    Implemented with three strided slices over 10 ms chunks (480 = 3 * 160),
    which XLA lowers to cheap reshapes -- no gather.
    """
    if step_ms not in (10, 20):
        raise ValueError("step_ms must be 10 or 20")
    hop_chunks = step_ms // 10  # hops per 10ms chunk stride
    n = audio.shape[-1]
    n_chunks = n // 160
    t = 1 + (n - WINDOW_SAMPLES) // (160 * hop_chunks) if n >= WINDOW_SAMPLES else 0
    if t <= 0:
        return jnp.zeros(audio.shape[:-1] + (0, WINDOW_SAMPLES), audio.dtype)
    chunks = audio[..., : n_chunks * 160].reshape(audio.shape[:-1] + (n_chunks, 160))
    parts = [
        jax.lax.slice_in_dim(chunks, j, j + (t - 1) * hop_chunks + 1, hop_chunks, axis=-2)
        for j in range(3)
    ]
    return jnp.concatenate(parts, axis=-1)


def scaled_filterbank(frames: jnp.ndarray) -> jnp.ndarray:
    """[..., T, 480] float32 frames -> [..., T, 40] scaled-filterbank amps.

    Two MXU matmuls + fused elementwise; see module docstring.

    Formulation note (round-5 measured negatives, fused b128 step): this
    two-matmul split is the FASTEST of three formulations tried on a v5e.
    (a) one combined [480, 514] cos|sin matmul (frames read once instead
    of twice): 2056 vs 2255 steps/s -- the 514-wide f32 output tiles
    worse than two 257-wide ones; (b) a kernel-3 conv over hop chunk rows
    (frames never materialized in HBM): 1861 steps/s -- XLA's conv
    lowering at [160ch -> 514ch, k=3] loses more than the saved frame
    bytes.  The step runs at ~92% of MEASURED HBM bandwidth (BENCH r5
    roofline, trace-measured bytes), so the remaining floor is physical.
    """
    wc, ws, mel, _ = _dft_mel_constants()
    re = jnp.matmul(frames, wc, preferred_element_type=jnp.float32)
    im = jnp.matmul(frames, ws, preferred_element_type=jnp.float32)
    energy = re * re + im * im
    return jnp.sqrt(jnp.maximum(energy @ mel, 0.0)) / 8.0


def _agc_step(est, s, smoothing):
    """One hop of noise suppression + PCAN + log scale.

    est, s: [..., 40].  Returns (new_est, uint16-valued float features).
    """
    est = (1.0 - smoothing) * est + smoothing * s
    return est, _agc_output(s, est)


def frontend_streaming(
    sf: jnp.ndarray, noise_estimate: jnp.ndarray, axis: int = 0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """AGC over precomputed scaled-filterbank amps with explicit state.

    sf: [..., 40] with time on ``axis`` (default 0, time-major);
    noise_estimate: sf's shape without the time axis.
    Returns (features float32 in [0, 26] shaped like sf, final estimate).

    The noise-estimate EMA est_t = (1-s)*est_{t-1} + s*x_t is a first-order
    linear recurrence with CONSTANT per-channel decay (two values:
    even/odd smoothing), so on the time-minor layout it is evaluated as
    two lower-triangular [T, T] matmuls on the MXU:
    est_t = sum_i s*(1-s)^(t-i) x_i + (1-s)^(t+1) est_0.  The previous
    associative-scan form (kept as the fallback for exotic axes) compiled
    to ~log2(T) levels of slice/pad/multiply VPU ops -- at T=204, ~76
    us/step of pure padding in the fused-step trace
    (documentation/architecture.md); one triangular matmul replaces the
    whole tree.  precision=HIGHEST keeps the matmul f32-exact (TPU default
    would round the accumulation through bf16 operands).
    """
    _, _, _, smoothing = _dft_mel_constants()
    t = sf.shape[axis]
    if t == 0:
        return sf * FEATURE_SCALE, noise_estimate

    if axis == -2 or axis == sf.ndim - 2 or (axis in (0, -2) and sf.ndim == 2):
        if t <= _EMA_CHUNK:
            low, decay = _ema_matrices(t)
            est = _ema_block(sf, noise_estimate, low, decay)
        else:
            # Long clips: chunked matmul EMA with carried estimate (memory
            # O(T * chunk); the single-matmul form is O(T^2)).
            chunk = _EMA_CHUNK
            nc = -(-t // chunk)
            pad = nc * chunk - t
            sfp = jnp.pad(
                sf, [(0, 0)] * (sf.ndim - 2) + [(0, pad), (0, 0)]
            )
            sfc = jnp.moveaxis(
                sfp.reshape(sf.shape[:-2] + (nc, chunk, sf.shape[-1])), -3, 0
            )  # [nc, ..., chunk, 40]
            low, decay = _ema_matrices(chunk)

            def body(carry_est, s):
                e = _ema_block(s, carry_est, low, decay)
                return e[..., -1, :], e

            _, ests = jax.lax.scan(body, noise_estimate, sfc)
            est = jnp.moveaxis(ests, 0, -3).reshape(sfp.shape)[..., :t, :]
        final = est[..., -1, :]
        feats = _agc_output(sf, est)
        return feats * FEATURE_SCALE, final

    # fallback: EMA as associative scan over pairs (a, b):
    # est_t = a*est_prev + b.
    a = jnp.broadcast_to(1.0 - smoothing, sf.shape).astype(sf.dtype)
    b = smoothing * sf

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    a_acc, b_acc = jax.lax.associative_scan(combine, (a, b), axis=axis)
    if axis in (0, -sf.ndim):
        est = a_acc * noise_estimate + b_acc
        final = est[-1]
    else:
        est = a_acc * jnp.expand_dims(noise_estimate, axis) + b_acc
        final = jnp.take(est, est.shape[axis] - 1, axis=axis)

    feats = _agc_output(sf, est)
    return feats * FEATURE_SCALE, final


def _agc_output(s: jnp.ndarray, est: jnp.ndarray) -> jnp.ndarray:
    """Noise subtraction + PCAN + log scale given the per-hop noise
    estimates (elementwise; shared by scan and streaming paths)."""
    sub = jnp.maximum(s - jnp.minimum(est, s), ref.MIN_SIGNAL_REMAINING * s)
    snr = (sub / 8.0) * jnp.power(1.0 + est / ref.PCAN_OFFSET, -ref.PCAN_STRENGTH)
    pcan = jnp.where(snr < 2.0, snr * snr / 4.0, snr - 1.0)
    pcan_q6 = jnp.floor(pcan * (1 << ref.PCAN_OUTPUT_BITS))
    value = pcan_q6 * (1 << ref.CORRECTION_BITS)
    logged = jnp.where(
        value > 1.0,
        jnp.log(jnp.maximum(value, 1.0)) * (1 << ref.LOG_SCALE_SHIFT),
        0.0,
    )
    return jnp.clip(jnp.round(logged), 0, 65535)


@functools.partial(jax.jit, static_argnames=("step_ms",))
def frontend_batch(audio: jnp.ndarray, step_ms: int = 10) -> jnp.ndarray:
    """[B, N] int16/float samples -> [B, T, 40] float32 features in [0, 26].

    Float inputs are interpreted in [-1, 1] and converted with the
    reference's clip(x*32768) convention (audio_utils.py:47-48).
    """
    if jnp.issubdtype(audio.dtype, jnp.floating):
        audio = jnp.clip(audio * 32768.0, -32768.0, 32767.0)
        audio = jnp.round(audio)
    audio = audio.astype(jnp.float32)
    frames = frame_audio(audio, step_ms)  # [B, T, 480]
    sf = scaled_filterbank(frames)  # [B, T, 40]
    est0 = jnp.zeros(sf.shape[:-2] + (NUM_CHANNELS,), jnp.float32)
    feats, _ = frontend_streaming(sf, est0, axis=-2)
    return feats


def streaming_state_init(batch_shape: tuple = ()) -> jnp.ndarray:
    """Initial noise-estimate state for frontend_streaming."""
    return jnp.zeros(batch_shape + (NUM_CHANNELS,), jnp.float32)


def frontend_step(
    window: jnp.ndarray, noise_estimate: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single-hop streaming step: [..., 480] samples -> ([..., 40], state)."""
    sf = scaled_filterbank(window.astype(jnp.float32))
    _, _, _, smoothing = _dft_mel_constants()
    est, feats = _agc_step(noise_estimate, sf, smoothing)
    return feats * FEATURE_SCALE, est
