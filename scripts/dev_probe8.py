"""Alternating fit: per-est-bucket gain G with exact shrink shape + global scale."""
import sys

import numpy as np
import tensorflow as tf
from scipy.optimize import minimize_scalar
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
w = want.ravel()[: sub.shape[0]]

mask = (w > 200) & (w < 60000) & (sub > 0.5)
y = w[mask] / 64.0
sb = sub[mask]
le = np.log(estA[mask])


def shrink(v):
    return np.where(v < 2.0, v * v / 4.0, v - 1.0)


edges = np.exp(np.linspace(le.min(), le.max(), 31))
eb = np.exp(le)

for logm in [np.log(512.0), np.log(8.0), np.log(64.0)]:
    tot, cnt = 0.0, 0
    rows = []
    for i in range(len(edges) - 1):
        m = (eb >= edges[i]) & (eb < edges[i + 1])
        if m.sum() < 150:
            continue
        sbm, ym = sb[m], y[m]

        def loss(lG):
            r = np.log(np.maximum(shrink(sbm * np.exp(lG)), 1e-9)) + logm - ym
            return np.mean(r**2)

        r = minimize_scalar(loss, bounds=(-25, 5), method="bounded")
        mid = np.sqrt(edges[i] * edges[i + 1])
        rows.append((mid, r.x, np.sqrt(r.fun), m.sum()))
        tot += r.fun * m.sum()
        cnt += m.sum()
    print(f"\n== output scale m={np.exp(logm):.0f}: overall rms={np.sqrt(tot/cnt):.4f}")
    for mid, lG, rms, nn in rows:
        print(f"  est={mid:10.1f} lnG={lG:8.3f} rms={rms:.3f} n={nn}")
