"""Stage B/C: noise reduction then PCAN calibration (broadband input)."""
import sys

import numpy as np
import tensorflow as tf
from tensorflow.lite.experimental.microfrontend.python.ops import (
    audio_microfrontend_op as frontend_op,
)

sys.path.insert(0, "/root/repo")
from microwakeword_tpu.frontend import reference as ref


def c_frontend(audio_int16, step_ms=10, **kw):
    s = frontend_op.audio_microfrontend(
        tf.convert_to_tensor(audio_int16),
        sample_rate=16000,
        window_size=30,
        window_step=step_ms,
        num_channels=40,
        upper_band_limit=7500,
        lower_band_limit=125,
        out_scale=1,
        out_type=tf.uint16,
        **kw,
    )
    return s.numpy().astype(np.int64)


rng = np.random.default_rng(0)
noise = (rng.normal(0, 2000, 16000)).astype(np.int16)
# Modulated broadband: amplitude ramps so noise estimate lags signal.
mod = (rng.normal(0, 1, 32000) * (500 + 4000 * np.abs(np.sin(np.arange(32000) / 3000)))).astype(np.int16)

frames = {k: ref.frame_audio(v, 10).astype(np.float64) for k, v in [("noise", noise), ("mod", mod)]}
sfs = {k: ref.scaled_filterbank(v) for k, v in frames.items()}
S = ref._SMOOTHING


def run_nr(sf):
    est = np.zeros(40)
    subs, ests = [], []
    for t in range(sf.shape[0]):
        s = sf[t]
        est = (1 - S) * est + S * s
        sub = np.maximum(s - np.minimum(est, s), 0.05 * s)
        subs.append(sub)
        ests.append(est.copy())
    return np.array(subs), np.array(ests)


# Stage B: noise reduction on, pcan off.
for name in ["noise", "mod"]:
    want = c_frontend({"noise": noise, "mod": mod}[name], enable_pcan=False,
                      min_signal_remaining=0.05)
    sub, est = run_nr(sfs[name])
    got = np.where(sub * 8 > 1, np.log(np.maximum(sub * 8, 1e-12)) * 64, 0)
    got = np.clip(np.round(got), 0, 65535).astype(np.int64)
    n = min(len(want), len(got))
    d = (got[:n] - want[:n]).astype(np.float64)
    print(f"B {name}: maxabs={np.abs(d).max():.0f} mae={np.abs(d).mean():.2f}")

# Stage C: full pipeline with pcan. Try candidate snr scale factors 2^k.
for name in ["noise", "mod"]:
    want = c_frontend({"noise": noise, "mod": mod}[name], enable_pcan=True,
                      min_signal_remaining=0.05)
    sub, est = run_nr(sfs[name])
    for k in [2, 3, 4]:
        snr = sub * np.power(est + 80.0, -0.95) * (2.0**k)
        pcan = np.where(snr < 2.0, snr * snr / 4.0, snr - 1.0)
        value = pcan * 8.0
        got = np.where(value > 1, np.log(np.maximum(value, 1e-12)) * 64, 0)
        got = np.clip(np.round(got), 0, 65535).astype(np.int64)
        n = min(len(want), len(got))
        d = (got[:n] - want[:n]).astype(np.float64)
        print(f"C {name} snr*2^{k}: maxabs={np.abs(d).max():.0f} mae={np.abs(d).mean():.2f} bias={d.mean():.2f}")
    print("  want:", want[20][:10])
    print("  got :", got[20][:10])
