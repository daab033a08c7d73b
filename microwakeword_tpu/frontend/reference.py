"""NumPy reference implementation of the micro_speech feature frontend.

This is a faithful re-derivation of the fixed-point algorithm used by the
TFLM ``audio_microfrontend`` op / pymicro-features (the C frontend the
reference wraps at ``microwakeword/audio/audio_utils.py:50-84``), expressed
in float with the exact same stage structure and constants:

  16 kHz int16 PCM
    -> 30 ms window (480 samples), hop ``step_ms`` (10/20 ms)
    -> Hann window (half-sample offset convention)
    -> 512-point rFFT, energy |X|^2
    -> 40-channel mel filterbank, 125..7500 Hz (TFLM "work slot" scheme)
    -> sqrt -> "scaled filterbank" amplitude, C units = amp_true / 8
    -> noise suppression (even/odd smoothing 0.025/0.06, floor 0.05*signal)
    -> PCAN auto gain   (strength 0.95, offset 80 in LUT units = est*8,
                         snr = (sub/8)*(1+est/10)^-0.95,
                         shrink: snr<2 ? snr^2/4 : snr-1, floored to Q6)
    -> log scale        (value = pcan_q6 << 3; uint16 = round(ln(value)*64))

The PCAN stage constants were calibrated empirically against the C op
(scripts/dev_probe*.py); broadband-audio agreement is ~1 uint16 LSB MAE
(~0.04 float units).  Pure tones differ more on near-silent channels because
the C int16 FFT has a quantization noise floor that a float FFT does not.

Downstream float convention (reference data.py:268-269): float = uint16 *
0.0390625, observed range ~[0, 26].

This module is the *golden host-side* implementation: it is validated
against the true C op in tests/test_frontend.py (golden vectors recorded
from tensorflow.lite.experimental.microfrontend) and in turn validates the
on-device XLA/Pallas kernels in microwakeword_tpu/frontend/xla.py.
"""

from __future__ import annotations

import numpy as np

SAMPLE_RATE = 16000
WINDOW_SIZE_MS = 30
WINDOW_SAMPLES = SAMPLE_RATE * WINDOW_SIZE_MS // 1000  # 480
FFT_SIZE = 512  # next power of two >= 480
N_FFT_BINS = FFT_SIZE // 2 + 1
NUM_CHANNELS = 40
LOWER_BAND_LIMIT = 125.0
UPPER_BAND_LIMIT = 7500.0

# Noise suppression constants (TFLM noise_reduction defaults).
EVEN_SMOOTHING = 0.025
ODD_SMOOTHING = 0.06
MIN_SIGNAL_REMAINING = 0.05

# PCAN constants (TFLM pcan_gain_control defaults; offset 80 applies to the
# noise estimate in gain-LUT units, which are est*8 -> effective offset 10
# in scaled-filterbank units).
PCAN_STRENGTH = 0.95
PCAN_OFFSET = 10.0  # = 80 / 8
PCAN_OUTPUT_BITS = 6  # shrink output quantized to Q6 before the log stage

# Log scale: uint16 = ln(value << CORRECTION_BITS) * 2**LOG_SCALE_SHIFT.
LOG_SCALE_SHIFT = 6
CORRECTION_BITS = 3  # MostSignificantBit32(512) - 1 - kFilterbankBits/2 = 10-1-6

FEATURE_SCALE = 0.0390625  # uint16 -> float, = 1/25.6 (reference data.py:269)


def hann_window(n: int = WINDOW_SAMPLES) -> np.ndarray:
    """TFLM window coefficients: 0.5 - 0.5*cos(2*pi*(i+0.5)/n)."""
    i = np.arange(n, dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * (i + 0.5) / n)


def freq_to_mel(freq):
    return 1127.0 * np.log1p(np.asarray(freq, dtype=np.float64) / 700.0)


def mel_filterbank_matrix() -> np.ndarray:
    """Builds the [N_FFT_BINS, NUM_CHANNELS] mel weight matrix, TFLM style.

    TFLM places ``num_channels + 1`` band edges equally spaced on the mel
    scale strictly *above* the lower band limit; channel ``c`` is a triangle
    rising over (edge[c-1], edge[c]] and falling over (edge[c], edge[c+1]],
    with edge[-1] = mel(lower_band_limit).  Bins at or below the lower limit
    and above the upper limit contribute nothing.
    """
    mel_low = freq_to_mel(LOWER_BAND_LIMIT)
    mel_hi = freq_to_mel(UPPER_BAND_LIMIT)
    spacing = (mel_hi - mel_low) / float(NUM_CHANNELS + 1)
    # edges[0] = mel_low; edges[i] = center of channel i-1.
    edges = mel_low + spacing * np.arange(NUM_CHANNELS + 2)

    bin_freqs = np.arange(N_FFT_BINS) * (SAMPLE_RATE / float(FFT_SIZE))
    bin_mels = freq_to_mel(bin_freqs)

    weights = np.zeros((N_FFT_BINS, NUM_CHANNELS), dtype=np.float64)
    for b in range(N_FFT_BINS):
        m = bin_mels[b]
        if m <= edges[0] or m > edges[NUM_CHANNELS + 1]:
            continue
        # Which band segment (edge[k], edge[k+1]] does this bin fall in?
        k = int(np.searchsorted(edges, m, side="left")) - 1
        k = min(max(k, 0), NUM_CHANNELS)
        frac = (m - edges[k]) / spacing  # 0 at left edge, 1 at right edge
        # Rising side of channel k, falling side of channel k-1.
        if k < NUM_CHANNELS:
            weights[b, k] += frac
        if k - 1 >= 0:
            weights[b, k - 1] += 1.0 - frac
    return weights


def frame_audio(audio: np.ndarray, step_ms: int) -> np.ndarray:
    """Slices int16 audio into overlapping [n_frames, 480] windows.

    Frame ``t`` covers samples [t*hop, t*hop+480); n_frames =
    1 + (len - 480)//hop for len >= 480 (reference model_train_eval.py:68-84).
    """
    hop = SAMPLE_RATE * step_ms // 1000
    n = audio.shape[-1]
    if n < WINDOW_SAMPLES:
        return np.zeros((0, WINDOW_SAMPLES), dtype=audio.dtype)
    n_frames = 1 + (n - WINDOW_SAMPLES) // hop
    idx = np.arange(WINDOW_SAMPLES)[None, :] + hop * np.arange(n_frames)[:, None]
    return audio[..., idx]


class MicroFrontend:
    """Stateful float reference frontend, one 480-sample window at a time.

    State: per-channel noise estimate (like the C frontend's
    noise_reduction.estimate, which also feeds PCAN).
    """

    def __init__(self, step_ms: int = 10):
        self.step_ms = step_ms
        self.window = hann_window()
        self.mel = mel_filterbank_matrix()
        self.noise_estimate = np.zeros(NUM_CHANNELS, dtype=np.float64)

    def reset(self):
        self.noise_estimate[:] = 0.0

    def process_window(self, samples: np.ndarray) -> np.ndarray:
        """One 480-sample int16 window -> 40 uint16 features."""
        feats, self.noise_estimate = frontend_frames(
            samples.astype(np.float64)[None, :], self.noise_estimate
        )
        return feats[0]

    def process_clip(self, audio: np.ndarray) -> np.ndarray:
        """Full clip -> [n_frames, 40] uint16 spectrogram (stateful)."""
        frames = frame_audio(np.asarray(audio), self.step_ms)
        feats, self.noise_estimate = frontend_frames(
            frames.astype(np.float64), self.noise_estimate
        )
        return feats


def scaled_filterbank(
    frames: np.ndarray, window: np.ndarray | None = None, mel: np.ndarray | None = None
) -> np.ndarray:
    """[n_frames, 480] float samples -> [n_frames, 40] C-unit amplitudes.

    C units: Sqrt(sum(w_mel * |X|^2)) / 8 -- the value the C code calls
    ``scaled_filterbank`` entering noise suppression.
    """
    if window is None:
        window = hann_window()
    if mel is None:
        mel = mel_filterbank_matrix()
    windowed = frames * window
    spec = np.fft.rfft(windowed, n=FFT_SIZE, axis=-1)
    energy = spec.real**2 + spec.imag**2
    return np.sqrt(np.maximum(energy @ mel, 0.0)) / 8.0


_SMOOTHING = np.where(
    np.arange(NUM_CHANNELS) % 2 == 0, EVEN_SMOOTHING, ODD_SMOOTHING
)


def frontend_frames(
    frames: np.ndarray, noise_estimate: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Runs the full frontend over [n_frames, 480] float frames.

    Returns ([n_frames, 40] uint16 features, final noise estimate).
    """
    sf = scaled_filterbank(frames)
    n_frames = sf.shape[0]
    feats = np.zeros((n_frames, NUM_CHANNELS), dtype=np.uint16)
    est = noise_estimate.astype(np.float64).copy()
    for t in range(n_frames):
        s = sf[t]
        # Noise reduction: update estimate first, then spectral-subtract.
        est = (1.0 - _SMOOTHING) * est + _SMOOTHING * s
        sub = np.maximum(s - np.minimum(est, s), MIN_SIGNAL_REMAINING * s)
        # PCAN auto gain on the *noise estimate*:
        #   snr = (sub/8) * (1 + est/10)^-0.95, shrink to Q6.
        snr = (sub / 8.0) * np.power(1.0 + est / PCAN_OFFSET, -PCAN_STRENGTH)
        pcan = np.where(snr < 2.0, snr * snr / 4.0, snr - 1.0)
        pcan_q6 = np.floor(pcan * (1 << PCAN_OUTPUT_BITS))
        # Log scale: value <<= 3; uint16 = ln(value) * 64 (0 if value <= 1).
        value = pcan_q6 * (1 << CORRECTION_BITS)
        logged = np.where(
            value > 1.0, np.log(np.maximum(value, 1.0)) * (1 << LOG_SCALE_SHIFT), 0.0
        )
        feats[t] = np.clip(np.round(logged), 0, 65535).astype(np.uint16)
    return feats, est


def generate_features_for_clip(
    audio_samples: np.ndarray, step_ms: int = 10
) -> np.ndarray:
    """Drop-in equivalent of the reference's audio_utils.generate_features_for_clip
    (reference microwakeword/audio/audio_utils.py:28-84): int16 (or float in
    [-1, 1]) PCM -> [n_frames, 40] float32 features in [0, ~26].
    """
    audio_samples = np.asarray(audio_samples)
    if audio_samples.dtype in (np.float32, np.float64):
        audio_samples = np.clip(audio_samples * 32768, -32768, 32767).astype(np.int16)
    fe = MicroFrontend(step_ms=step_ms)
    return fe.process_clip(audio_samples).astype(np.float32) * FEATURE_SCALE
