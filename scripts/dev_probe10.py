"""Test integer-truncation emulation in pcan output + log rounding."""
import sys
import itertools

import numpy as np
import tensorflow as tf
from tensorflow.lite.experimental.microfrontend.python.ops import (
    audio_microfrontend_op as frontend_op,
)

sys.path.insert(0, "/root/repo")
from microwakeword_tpu.frontend import reference as ref


def c_frontend(audio_int16, **kw):
    s = frontend_op.audio_microfrontend(
        tf.convert_to_tensor(audio_int16), sample_rate=16000, window_size=30,
        window_step=10, num_channels=40, upper_band_limit=7500,
        lower_band_limit=125, out_scale=1, out_type=tf.uint16, **kw)
    return s.numpy().astype(np.int64)


def my_frontend(audio, trunc_q6, log_floor):
    frames = ref.frame_audio(audio, 10).astype(np.float64)
    sf = ref.scaled_filterbank(frames)
    S = ref._SMOOTHING
    est = np.zeros(40)
    out = []
    for t in range(sf.shape[0]):
        s = sf[t]
        est = (1 - S) * est + S * s
        sub = np.maximum(s - np.minimum(est, s), 0.05 * s)
        snr = (sub / 8.0) * np.power(1.0 + est / 10.0, -0.95)
        pcan = np.where(snr < 2.0, snr * snr / 4.0, snr - 1.0)
        if trunc_q6:
            value = np.floor(pcan * 64.0) * 8.0
        else:
            value = pcan * 512.0
        lg = np.log(np.maximum(value, 1e-12)) * 64
        f = np.where(value > 1, np.floor(lg) if log_floor else np.round(lg), 0)
        out.append(np.clip(f, 0, 65535))
    return np.array(out, dtype=np.int64)


rng = np.random.default_rng(0)
tests = {
    "noise2000": (rng.normal(0, 2000, 16000)).astype(np.int16),
    "noise50": (rng.normal(0, 50, 16000)).astype(np.int16),
    "mod": (rng.normal(0, 1, 32000) * (500 + 4000 * np.abs(np.sin(np.arange(32000) / 3000)))).astype(np.int16),
    "speechish": (rng.normal(0, 1, 32000) * (200 + 3000 * (1 + np.sin(np.arange(32000) / 800)))).astype(np.int16),
}
for trunc_q6, log_floor in itertools.product([False, True], repeat=2):
    print(f"\ntrunc_q6={trunc_q6} log_floor={log_floor}")
    for name, audio in tests.items():
        want = c_frontend(audio, enable_pcan=True, min_signal_remaining=0.05)
        got = my_frontend(audio, trunc_q6, log_floor)
        n = min(len(want), len(got))
        d = (got[:n] - want[:n]).astype(np.float64)
        print(f"  {name}: maxabs={np.abs(d).max():.0f} mae={np.abs(d).mean():.2f} bias={d.mean():.2f}")
