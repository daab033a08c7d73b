"""PCAN with int16-saturating gain LUT: gain=min(2^21*(1+est/80)^-0.95, 32767),
snr=sub*gain/2^18 (Q-real), value=shrink(snr)*512, feature=64*ln(value)."""
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
sigs = {
    "mod": (rng.normal(0, 1, 64000) * (50 + 6000 * np.abs(np.sin(np.arange(64000) / 5000)))).astype(np.int16),
    "loud": (rng.normal(0, 9000, 32000)).astype(np.int16),
    "quiet": (rng.normal(0, 100, 32000)).astype(np.int16),
}

S = ref._SMOOTHING
for name, audio in sigs.items():
    want = c_frontend(audio, enable_pcan=True, min_signal_remaining=0.05)
    frames = ref.frame_audio(audio, 10).astype(np.float64)
    sf = ref.scaled_filterbank(frames)
    est = np.zeros(40)
    subs, ests = [], []
    for t in range(sf.shape[0]):
        s = sf[t]
        est = (1 - S) * est + S * s
        subs.append(np.maximum(s - np.minimum(est, s), 0.05 * s))
        ests.append(est.copy())
    sub = np.array(subs)[: len(want)]
    estA = np.array(ests)[: len(want)]
    w = want[: len(sub)]

    gain = np.minimum((1 << 21) * np.power(1.0 + estA / 80.0, -0.95), 32767.0)
    snr = sub * gain / (1 << 18)
    pcan = np.where(snr < 2.0, snr * snr / 4.0, snr - 1.0)
    value = pcan * 512.0
    got = np.where(value > 1, np.log(np.maximum(value, 1e-12)) * 64, 0)
    got = np.clip(np.round(got), 0, 65535).astype(np.int64)
    d = (got - w).astype(np.float64)
    print(f"{name}: maxabs={np.abs(d).max():.0f} mae={np.abs(d).mean():.2f} bias={d.mean():.2f}")
    print("  want:", w[20][:10])
    print("  got :", got[20][:10])
