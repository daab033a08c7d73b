"""Empirically extract PCAN gain curve: per est-bucket regression of y on ln(sub)."""
import sys

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


rng = np.random.default_rng(7)
# Long signal sweeping amplitude over 4 decades for wide (sub, est) coverage.
n = 480000
level = 10 ** (1.0 + 3.0 * (np.arange(n) / n))
audio = (rng.normal(0, 1, n) * level).astype(np.int16)
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
sub = np.array(subs)[: len(want)].ravel()
estA = np.array(ests)[: len(want)].ravel()
w = want[: len(sub) // 40 * 40].ravel() if False else want[: len(want)].ravel()
w = want.ravel()[: sub.shape[0]]

mask = (w > 200) & (w < 60000) & (sub > 0.5)
y = w[mask] / 64.0
ls = np.log(sub[mask])
le = np.log(estA[mask])
print(f"samples: {mask.sum()}, est range {np.exp(le.min()):.1f}..{np.exp(le.max()):.1f}")

# Bucket by est (log-spaced), regress y = a*ln(sub)+b per bucket.
edges = np.exp(np.linspace(le.min(), le.max(), 25))
print(f"{'est_mid':>12} {'slope':>7} {'intercept':>9} {'n':>6} {'rms':>6}")
rows = []
for i in range(len(edges) - 1):
    m = (np.exp(le) >= edges[i]) & (np.exp(le) < edges[i + 1])
    if m.sum() < 200:
        continue
    A = np.stack([ls[m], np.ones(m.sum())], axis=1)
    coef, *_ = np.linalg.lstsq(A, y[m], rcond=None)
    resid = A @ coef - y[m]
    mid = np.sqrt(edges[i] * edges[i + 1])
    rows.append((mid, coef[0], coef[1]))
    print(f"{mid:12.1f} {coef[0]:7.3f} {coef[1]:9.3f} {m.sum():6d} {np.sqrt(np.mean(resid**2)):6.3f}")

# If slope ~2 everywhere: intercept = ln(512 * gain(est)^2 / 4 / 2^{2k}) =>
# ln(gain(est)) = (intercept - ln(32))/2. Print implied gain exponent vs est:
rows = np.array(rows)
lg = (rows[:, 2] - np.log(512.0 / 4.0)) / 2.0
for j in range(len(rows) - 1):
    dle = np.log(rows[j + 1, 0]) - np.log(rows[j, 0])
    print(f"est={rows[j,0]:10.1f} ln_gainK={lg[j]:7.3f} local_exponent={(lg[j+1]-lg[j])/dle:7.3f}")
