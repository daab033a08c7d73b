"""Measures the reference implementation's training step throughput on this
host's CPU (TensorFlow), using the notebook's flagship mixednet recipe on
synthetic batches.  Writes tests/golden/reference_baseline.json.

This is generous to the reference: we time ONLY model.train_on_batch (its
per-step Python data assembly, which SURVEY.md §3.1 identifies as a major
cost, is excluded because mmap_ninja isn't installed here).
"""
import argparse
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, "/root/reference")

import tensorflow as tf  # noqa: E402

from microwakeword import mixednet  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    flags = types.SimpleNamespace(
        pointwise_filters="64,64,64,64",
        repeat_in_block="1, 1, 1, 1",
        mixconv_kernel_sizes="[5], [7,11], [9,15], [23]",
        residual_connection="0,0,0,0",
        max_pool=0,
        first_conv_filters=32,
        first_conv_kernel_size=5,
        spatial_attention=0,
        pooled=0,
        stride=3,
    )
    dropped = mixednet.spectrogram_slices_dropped(flags)
    final = 1 + (16 * 1500 - 480) // (3 * 16 * 10)
    spectrogram_length = final + dropped
    print(f"spectrogram_length={spectrogram_length} (final={final}, dropped={dropped})")

    batch = 128
    model = mixednet.model(flags, (spectrogram_length, 40), batch)
    model.compile(
        optimizer=tf.keras.optimizers.Adam(),
        loss=tf.keras.losses.BinaryCrossentropy(from_logits=False),
    )
    x = np.random.uniform(0, 26, (batch, spectrogram_length, 40)).astype(np.float32)
    y = np.random.randint(0, 2, (batch, 1)).astype(np.float32)
    w = np.ones((batch, 1), np.float32)

    # match the reference's un-decorated train_function (train.py:225-227)
    from tensorflow.python.util import tf_decorator

    model.make_train_function()
    _, model.train_function = tf_decorator.unwrap(model.train_function)

    for _ in range(3):
        model.train_on_batch(x, y, sample_weight=w)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        model.train_on_batch(x, y, sample_weight=w)
    dt = (time.perf_counter() - t0) / args.steps
    audio_seconds_per_batch = batch * spectrogram_length * 0.010
    result = {
        "hardware": "host CPU (TF 2.21, oneDNN)",
        "what": "reference mixednet train_on_batch only (no data assembly)",
        "batch": batch,
        "spectrogram_length": spectrogram_length,
        "step_seconds": dt,
        "steps_per_sec": 1.0 / dt,
        "audio_seconds_per_sec": audio_seconds_per_batch / dt,
    }
    print(json.dumps(result, indent=2))
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                       "reference_baseline.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
