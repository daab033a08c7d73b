"""Fit PCAN functional form: regress ln(value_entering_log) on ln(sub), ln(est+80)."""
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


rng = np.random.default_rng(1)
# Rich broadband signal with varying level for a wide range of (sub, est).
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

mask = (w > 64) & (sub > 1)  # well away from the log floor / clipping
y = w[mask] / 64.0  # ln(value entering log)
ls = np.log(sub[mask])
le = np.log(est[mask] + 80.0)
A = np.stack([ls, le, np.ones_like(ls)], axis=1)
coef, res, *_ = np.linalg.lstsq(A, y, rcond=None)
pred = A @ coef
print("fit y = a*ln(sub) + b*ln(est+80) + c:", coef, "resid rms:", np.sqrt(np.mean((pred - y) ** 2)))

# Also try y vs ln(sub) and ln(est) separately with quadratic term in ls
A2 = np.stack([ls, ls**2, le, np.ones_like(ls)], axis=1)
coef2, *_ = np.linalg.lstsq(A2, y, rcond=None)
pred2 = A2 @ coef2
print("fit2 (+ls^2):", coef2, "resid rms:", np.sqrt(np.mean((pred2 - y) ** 2)))

# Check whether relationship is exactly out = sub^2 * something (square regime):
# snr = sub*(est+80)^-0.95*k ; if snr<2 regime: value = snr^2/4*8
# -> y = 2 ln(sub) - 1.9 ln(est+80) + const. See which matches a≈?, b≈?
print("a/b ratio:", coef[0], coef[1], " b/a:", coef[1] / coef[0])
