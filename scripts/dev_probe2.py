"""Stage-by-stage calibration against the C op."""
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
sine = (np.sin(2 * np.pi * 440 * np.arange(16000) / 16000) * 8000).astype(np.int16)
noise = (rng.normal(0, 2000, 16000)).astype(np.int16)

# Stage A: no pcan, no noise reduction (smoothing 0 -> estimate stays 0).
# Then feature = ln(sf << 3) * 64 if my scale derivation is right.
for name, audio in [("sine", sine), ("noise", noise)]:
    want = c_frontend(
        audio, enable_pcan=False, even_smoothing=0.0, odd_smoothing=0.0,
        min_signal_remaining=0.0,
    )
    frames = ref.frame_audio(audio, 10).astype(np.float64)
    sf = ref.scaled_filterbank(frames)
    got = np.where(sf * 8 > 1, np.log(np.maximum(sf * 8, 1e-12)) * 64, 0)
    got = np.clip(np.round(got), 0, 65535).astype(np.int64)
    n = min(len(want), len(got))
    d = (got[:n] - want[:n]).astype(np.float64)
    mask = want[:n] > 0
    print(f"A {name}: maxabs={np.abs(d).max():.0f} mae={np.abs(d).mean():.2f} "
          f"bias(nonzero)={d[mask].mean():.2f} ratio=e^{d[mask].mean()/64:.3f}")
    print("  want:", want[5][:10])
    print("  got :", got[5][:10])
