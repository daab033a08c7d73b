"""Records golden feature vectors from the true C microfrontend op
(tensorflow.lite.experimental.microfrontend) into tests/golden/frontend.npz,
so the test suite can validate our implementations without importing TF.

Run: python scripts/generate_frontend_golden.py
"""
import os
import sys

import numpy as np
import tensorflow as tf
from tensorflow.lite.experimental.microfrontend.python.ops import (
    audio_microfrontend_op as frontend_op,
)

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def c_frontend(audio_int16, step_ms):
    s = frontend_op.audio_microfrontend(
        tf.convert_to_tensor(audio_int16),
        sample_rate=16000,
        window_size=30,
        window_step=step_ms,
        num_channels=40,
        upper_band_limit=7500,
        lower_band_limit=125,
        enable_pcan=True,
        min_signal_remaining=0.05,
        out_scale=1,
        out_type=tf.uint16,
    )
    return s.numpy()


def make_signals():
    rng = np.random.default_rng(1234)
    n = 32000
    sigs = {}
    sigs["noise_2000"] = rng.normal(0, 2000, n).astype(np.int16)
    sigs["noise_50"] = rng.normal(0, 50, n).astype(np.int16)
    sigs["modulated"] = (
        rng.normal(0, 1, n) * (500 + 4000 * np.abs(np.sin(np.arange(n) / 3000)))
    ).astype(np.int16)
    # Speech-like: filtered noise bursts with formant-ish resonances.
    t = np.arange(n) / 16000
    env = np.clip(np.sin(2 * np.pi * 3 * t), 0, None)
    carrier = (
        np.sin(2 * np.pi * 220 * t)
        + 0.6 * np.sin(2 * np.pi * 700 * t)
        + 0.4 * np.sin(2 * np.pi * 2400 * t)
    )
    sigs["speechish"] = (env * carrier * 6000 + rng.normal(0, 300, n)).astype(np.int16)
    sigs["silence"] = np.zeros(n, dtype=np.int16)
    sigs["impulses"] = np.zeros(n, dtype=np.int16)
    sigs["impulses"][::1600] = 20000
    # Pure tones: worst case for float-vs-int FFT comparison -- the C int16
    # FFT has a quantization noise floor on off-tone channels that a float
    # FFT does not (frontend/reference.py docstring).
    sigs["tone_1k"] = (8000 * np.sin(2 * np.pi * 1000 * t)).astype(np.int16)
    sigs["tone_250"] = (8000 * np.sin(2 * np.pi * 250 * t)).astype(np.int16)
    gate = (np.sin(2 * np.pi * 8 * t) > 0).astype(np.float64)
    sigs["tone_pulsed"] = (
        8000 * gate * np.sin(2 * np.pi * 1500 * t) + rng.normal(0, 20, n)
    ).astype(np.int16)
    return sigs


def main():
    os.makedirs(OUT, exist_ok=True)
    data = {}
    for name, audio in make_signals().items():
        data[f"audio_{name}"] = audio
        for step_ms in (10, 20):
            data[f"feat{step_ms}_{name}"] = c_frontend(audio, step_ms)
    np.savez_compressed(os.path.join(OUT, "frontend.npz"), **data)
    print("wrote", os.path.join(OUT, "frontend.npz"))


if __name__ == "__main__":
    main()
