"""Final PCAN fit: gain=K*(est+o)^-0.95, value=shrink(sub*gain)*512. Then e2e check."""
import sys

import numpy as np
import tensorflow as tf
from scipy.optimize import least_squares
from tensorflow.lite.experimental.microfrontend.python.ops import (
    audio_microfrontend_op as frontend_op,
)

sys.path.insert(0, "/root/repo")
from microwakeword_tpu.frontend import reference as ref

# Bucket gains from probe8 (m=512), skip lowest 2 noisy buckets.
mids = np.array([22.4, 33.6, 50.2, 75.2, 112.7, 168.7, 252.6, 378.3, 566.4,
                 848.2, 1270.0, 1901.8, 2847.7, 4264.2, 6385.3, 9561.4,
                 14317.4, 21439.0, 32103.1, 48071.6])
lnG = np.array([-3.266, -3.540, -3.851, -4.166, -4.520, -4.862, -5.232,
                -5.594, -5.968, -6.356, -6.722, -7.118, -7.487, -7.880,
                -8.256, -8.630, -9.022, -9.367, -9.769, -10.106])


def resid(p):
    lnK, o = p
    return lnK - 0.95 * np.log(mids + o) - lnG


r = least_squares(resid, x0=[0.0, 20.0])
lnK, o = r.x
print(f"gain = e^{lnK:.4f} * (est + {o:.3f})^-0.95   curve-rms={np.sqrt(np.mean(r.fun**2)):.4f}")
K = np.exp(lnK)

# also try fixed o=20, fit K; and free strength
r2 = least_squares(lambda p: p[0] - p[2] * np.log(mids + p[1]) - lnG, x0=[0.0, 20.0, 0.95])
print(f"free strength: lnK={r2.x[0]:.4f} o={r2.x[1]:.3f} strength={r2.x[2]:.4f} rms={np.sqrt(np.mean(r2.fun**2)):.4f}")


def c_frontend(audio_int16, **kw):
    s = frontend_op.audio_microfrontend(
        tf.convert_to_tensor(audio_int16), sample_rate=16000, window_size=30,
        window_step=10, num_channels=40, upper_band_limit=7500,
        lower_band_limit=125, out_scale=1, out_type=tf.uint16, **kw)
    return s.numpy().astype(np.int64)


def my_frontend(audio, lnK, o, strength=0.95):
    frames = ref.frame_audio(audio, 10).astype(np.float64)
    sf = ref.scaled_filterbank(frames)
    S = ref._SMOOTHING
    est = np.zeros(40)
    out = []
    for t in range(sf.shape[0]):
        s = sf[t]
        est = (1 - S) * est + S * s
        sub = np.maximum(s - np.minimum(est, s), 0.05 * s)
        snr = sub * np.exp(lnK) * np.power(est + o, -strength)
        pcan = np.where(snr < 2.0, snr * snr / 4.0, snr - 1.0)
        value = pcan * 512.0
        f = np.where(value > 1, np.log(np.maximum(value, 1e-12)) * 64, 0)
        out.append(np.clip(np.round(f), 0, 65535))
    return np.array(out, dtype=np.int64)


rng = np.random.default_rng(0)
tests = {
    "noise2000": (rng.normal(0, 2000, 16000)).astype(np.int16),
    "noise50": (rng.normal(0, 50, 16000)).astype(np.int16),
    "mod": (rng.normal(0, 1, 32000) * (500 + 4000 * np.abs(np.sin(np.arange(32000) / 3000)))).astype(np.int16),
    "sine": (np.sin(2 * np.pi * 440 * np.arange(16000) / 16000) * 8000).astype(np.int16),
    "speechish": (rng.normal(0, 1, 32000) * (200 + 3000 * (1 + np.sin(np.arange(32000) / 800)))).astype(np.int16),
}
for params in [(lnK, o, 0.95), (r2.x[0], r2.x[1], r2.x[2])]:
    print(f"\n== params lnK={params[0]:.3f} o={params[1]:.2f} s={params[2]:.3f}")
    for name, audio in tests.items():
        want = c_frontend(audio, enable_pcan=True, min_signal_remaining=0.05)
        got = my_frontend(audio, *params)
        n = min(len(want), len(got))
        d = (got[:n] - want[:n]).astype(np.float64)
        print(f"  {name}: maxabs={np.abs(d).max():.0f} mae={np.abs(d).mean():.2f} bias={d.mean():.2f} (float mae={np.abs(d).mean()/25.6:.3f})")
