"""Dev tool: compare our float frontend against the true C microfrontend op."""
import sys

import numpy as np
import tensorflow as tf
from tensorflow.lite.experimental.microfrontend.python.ops import (
    audio_microfrontend_op as frontend_op,
)

sys.path.insert(0, "/root/repo")
from microwakeword_tpu.frontend import reference as ref


def c_frontend(audio_int16, step_ms=10):
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


def compare(name, audio, step_ms=10):
    want = c_frontend(audio, step_ms).astype(np.int64)
    fe = ref.MicroFrontend(step_ms=step_ms)
    got = fe.process_clip(audio).astype(np.int64)
    n = min(len(want), len(got))
    want, got = want[:n], got[:n]
    d = got - want
    print(
        f"{name}: frames={n} maxabs={np.abs(d).max()} mae={np.abs(d).mean():.3f} "
        f"bias={d.mean():.3f}  (in uint16 units; /25.6 for float units)"
    )
    return want, got


rng = np.random.default_rng(0)
sine = (np.sin(2 * np.pi * 440 * np.arange(16000) / 16000) * 8000).astype(np.int16)
w1, g1 = compare("sine440@8000", sine)
noise = (rng.normal(0, 2000, 16000)).astype(np.int16)
w2, g2 = compare("noise@2000", noise)
quiet = (rng.normal(0, 50, 16000)).astype(np.int16)
w3, g3 = compare("noise@50", quiet)
chirp = (
    np.sin(2 * np.pi * (100 + 3000 * np.arange(32000) / 32000) * np.arange(32000) / 16000)
    * 12000
).astype(np.int16)
w4, g4 = compare("chirp", chirp)

print("\nframe0 want:", w1[0][:12])
print("frame0 got :", g1[0][:12])
print("frame5 want:", w1[5][:12])
print("frame5 got :", g1[5][:12])
print("\nnoise frame20 want:", w2[20][:12])
print("noise frame20 got :", g2[20][:12])
