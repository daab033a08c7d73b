"""Nonlinear fit: value = shrink(sub*(est*K2+80)^-0.95*K3)*8, fit K2,K3."""
import sys

import numpy as np
import tensorflow as tf
from scipy.optimize import least_squares
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


rng = np.random.default_rng(1)
audio = (rng.normal(0, 1, 64000) * (50 + 6000 * np.abs(np.sin(np.arange(64000) / 5000)))).astype(np.int16)
want = c_frontend(audio, enable_pcan=True, min_signal_remaining=0.05)

frames = ref.frame_audio(audio, 10).astype(np.float64)
sf = ref.scaled_filterbank(frames)
S = ref._SMOOTHING
est = np.zeros(40)
subs, ests = [], []
for t in range(sf.shape[0]):
    s = sf[t]
    est = (1 - S) * est + S * s
    subs.append(np.maximum(s - np.minimum(est, s), 0.05 * s))
    ests.append(est.copy())
sub = np.array(subs)[: len(want)]
est = np.array(ests)[: len(want)]
w = want[: len(sub)]
mask = (w > 64) & (sub > 1)
y = w[mask] / 64.0
sb, eb = sub[mask], est[mask]


def model(p):
    lk2, lk3, strength = p
    snr = sb * np.power(eb * np.exp(lk2) + 80.0, -strength) * np.exp(lk3)
    val = np.where(snr < 2.0, snr * snr / 4.0, snr - 1.0) * 8.0
    return np.log(np.maximum(val, 1e-9)) - y


for s0 in [0.95]:
    r = least_squares(model, x0=[0.0, np.log(8.0), s0])
    K2, K3, st = np.exp(r.x[0]), np.exp(r.x[1]), r.x[2]
    print(f"fit: est_scale={K2:.4f} snr_scale={K3:.4f} strength={st:.4f} rms={np.sqrt(np.mean(r.fun**2)):.4f}")

# Fix strength at 0.95, fit scales only
def model2(p):
    lk2, lk3 = p
    snr = sb * np.power(eb * np.exp(lk2) + 80.0, -0.95) * np.exp(lk3)
    val = np.where(snr < 2.0, snr * snr / 4.0, snr - 1.0) * 8.0
    return np.log(np.maximum(val, 1e-9)) - y

r2 = least_squares(model2, x0=[0.0, np.log(8.0)])
print(f"fit(strength=0.95): est_scale={np.exp(r2.x[0]):.4f} snr_scale={np.exp(r2.x[1]):.4f} rms={np.sqrt(np.mean(r2.fun**2)):.4f}")

# Check snr distribution at best fit
lk2, lk3, st = r.x
snr = sb * np.power(eb * np.exp(lk2) + 80.0, -st) * np.exp(lk3)
print("snr percentiles:", np.percentile(snr, [1, 25, 50, 75, 99]))
