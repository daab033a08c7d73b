"""Measures the reference implementation's training throughput on this host
(TensorFlow CPU), using the notebook's flagship mixednet recipe.

Two numbers are recorded into tests/golden/reference_baseline.json:

- "train_on_batch": model.train_on_batch only, synthetic batches (generous
  to the reference -- no data assembly).
- "end_to_end": the reference's REAL hot loop (train.py:249-299) -- per-step
  Python batch assembly through its own FeatureHandler.get_data (weighted
  random.choices provider sampling, per-sample mmap reads, pad/truncate,
  numpy SpecAugment; data.py:497-597) followed by train_on_batch.

mmap_ninja is not installed in this image, so a faithful in-process shim of
RaggedMmap (np.memmap-backed, zero-copy slice views -- the same access
semantics) is registered before importing the reference's data module; the
shim's read path is a memmap slice per __getitem__, so the measured cost is
the reference's Python loop, not the shim.
"""
import argparse
import json
import os
import sys
import tempfile
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from reference_compat import RaggedMmapShim as _RaggedMmapShim  # noqa: E402
from reference_compat import install_shims  # noqa: E402

install_shims()

import tensorflow as tf  # noqa: E402

from microwakeword import mixednet  # noqa: E402


def flagship_flags():
    return types.SimpleNamespace(
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


def build_model(spectrogram_length, batch):
    flags = flagship_flags()
    model = mixednet.model(flags, (spectrogram_length, 40), batch)
    model.compile(
        optimizer=tf.keras.optimizers.Adam(),
        loss=tf.keras.losses.BinaryCrossentropy(from_logits=False),
    )
    # match the reference's un-decorated train_function (train.py:225-227)
    from tensorflow.python.util import tf_decorator

    model.make_train_function()
    _, model.train_function = tf_decorator.unwrap(model.train_function)
    return model


def _median_chunk_time(fn, steps, chunks=5):
    """Median of per-chunk mean step times (host contention robustness)."""
    per_chunk = max(1, steps // chunks)
    times = []
    for _ in range(chunks):
        t0 = time.perf_counter()
        for _ in range(per_chunk):
            fn()
        times.append((time.perf_counter() - t0) / per_chunk)
    return float(np.median(times))


def measure_train_on_batch(model, spectrogram_length, batch, steps):
    x = np.random.uniform(0, 26, (batch, spectrogram_length, 40)).astype(np.float32)
    y = np.random.randint(0, 2, (batch, 1)).astype(np.float32)
    w = np.ones((batch, 1), np.float32)
    for _ in range(3):
        model.train_on_batch(x, y, sample_weight=w)
    dt = _median_chunk_time(
        lambda: model.train_on_batch(x, y, sample_weight=w), steps
    )
    return {
        "what": "reference mixednet train_on_batch only (no data assembly)",
        "step_seconds": dt,
        "steps_per_sec": 1.0 / dt,
        "audio_seconds_per_sec": batch * spectrogram_length * 0.010 / dt,
    }


def build_reference_dataset(root, spectrogram_length, n_train=2000):
    """Synthetic ragged stores in the reference's expected layout."""
    rng = np.random.default_rng(0)

    def specs(n, lo, hi):
        return [
            rng.uniform(0, 660, (int(rng.integers(lo, hi)), 40)).astype(np.uint16)
            for _ in range(n)
        ]

    lo, hi = spectrogram_length - 40, spectrogram_length + 120
    for name in ("positive", "negative"):
        d = os.path.join(root, name, "training")
        _RaggedMmapShim.create(os.path.join(d, "w_mmap"), specs(n_train // 2, lo, hi))
        d = os.path.join(root, name, "validation")
        _RaggedMmapShim.create(os.path.join(d, "w_mmap"), specs(50, lo, hi))
    for mode in ("validation_ambient", "testing", "testing_ambient"):
        d = os.path.join(root, "negative", mode)
        _RaggedMmapShim.create(os.path.join(d, "a_mmap"), specs(2, 1000, 1500))
    return {
        "features": [
            {
                "features_dir": os.path.join(root, "positive"),
                "truth": True,
                "sampling_weight": 2.0,
                "penalty_weight": 1.0,
                "truncation_strategy": "truncate_start",
                "type": "mmap",
            },
            {
                "features_dir": os.path.join(root, "negative"),
                "truth": False,
                "sampling_weight": 1.0,
                "penalty_weight": 1.0,
                "truncation_strategy": "random",
                "type": "mmap",
            },
        ],
    }


def measure_end_to_end(model, spectrogram_length, batch, steps):
    """The real reference hot loop: get_data + weights + train_on_batch
    (train.py:249-299), with the notebook recipe's SpecAugment policy."""
    from microwakeword.data import FeatureHandler

    with tempfile.TemporaryDirectory() as tmp:
        config = build_reference_dataset(tmp, spectrogram_length)
        config.update({"stride": 3, "window_step_ms": 10, "batch_size": batch})
        data_processor = FeatureHandler(config)

        augmentation_policy = {
            "mix_up_prob": 0.0,
            "freq_mix_prob": 0.0,
            "time_mask_max_size": 5,
            "time_mask_count": 2,
            "freq_mask_max_size": 5,
            "freq_mask_count": 2,
        }
        class_weights = {0: 20.0, 1: 1.0}

        def one_step():
            x, y, w = data_processor.get_data(
                "training",
                batch_size=batch,
                features_length=spectrogram_length,
                truncation_strategy="default",
                augmentation_policy=augmentation_policy,
            )
            y = y.reshape(-1, 1)
            combined = w * np.vectorize(class_weights.get)(y)
            model.train_on_batch(x, y, sample_weight=combined)

        data_t0 = time.perf_counter()
        for _ in range(3):
            data_processor.get_data(
                "training",
                batch_size=batch,
                features_length=spectrogram_length,
                truncation_strategy="default",
                augmentation_policy=augmentation_policy,
            )
        data_seconds = (time.perf_counter() - data_t0) / 3

        for _ in range(2):
            one_step()
        dt = _median_chunk_time(one_step, steps)
    return {
        "what": (
            "reference full hot loop: FeatureHandler.get_data (weighted "
            "sampling + mmap reads + SpecAugment) + train_on_batch "
            "(train.py:249-299)"
        ),
        "step_seconds": dt,
        "data_assembly_seconds": data_seconds,
        "steps_per_sec": 1.0 / dt,
        "audio_seconds_per_sec": batch * spectrogram_length * 0.010 / dt,
    }


def measure_streamed_eval(spectrogram_length, minutes=2.0):
    """The reference's streamed-eval hot loop: streaming TFLite interpreter
    invoked once per stride chunk over a long ambient spectrogram
    (inference.py:98-125, the mechanism behind tflite_streaming_model_roc,
    test.py:293-403).  Float (non-quantized) TFLite -- int8 on desktop CPU
    measured no faster and quantization needs a calibration corpus."""
    import microwakeword.utils as utils
    from microwakeword import inference as ref_inference
    from microwakeword.layers import modes

    flags = flagship_flags()
    model = mixednet.model(flags, (spectrogram_length, 40), 1)
    with tempfile.TemporaryDirectory() as tmp:
        config = {
            "train_dir": tmp,
            "stride": 3,
            "window_step_ms": 10,
            "training_input_shape": (spectrogram_length, 40),
            "spectrogram_length": spectrogram_length,
        }
        utils.convert_model_saved(
            model, config, "stream_state_internal",
            modes.Modes.STREAM_INTERNAL_STATE_INFERENCE,
        )
        utils.convert_saved_model_to_tflite(
            config, None,
            os.path.join(tmp, "stream_state_internal"),
            os.path.join(tmp, "tflite"), "stream.tflite", quantize=False,
        )
        m = ref_inference.Model(
            os.path.join(tmp, "tflite", "stream.tflite"), stride=3
        )
        frames = int(minutes * 60.0 * 100)  # 10 ms hop
        rng = np.random.default_rng(0)
        spec = rng.uniform(0, 26, (frames, 40)).astype(np.float32)
        m.predict_spectrogram(spec[: 300 * 3])  # warm
        t0 = time.perf_counter()
        m.predict_spectrogram(spec)
        dt = time.perf_counter() - t0
        audio_s = frames * 0.010
    return {
        "what": (
            "reference streamed eval: streaming TFLite (float) "
            "predict_spectrogram per-chunk interpreter loop "
            "(inference.py:98-125)"
        ),
        "ambient_minutes": minutes,
        "eval_seconds": dt,
        "audio_seconds_per_sec": audio_s / dt,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=128,
                    help="batch size; 128 writes the canonical record, other "
                         "values add an end_to_end_b{N} entry (so our bench "
                         "can compare same-batch configurations honestly)")
    ap.add_argument("--eval-only", action="store_true",
                    help="measure only the streamed-eval rate and merge it "
                         "into the golden record")
    args = ap.parse_args()

    if args.eval_only:
        flags = flagship_flags()
        dropped = mixednet.spectrogram_slices_dropped(flags)
        final = 1 + (16 * 1500 - 480) // (3 * 16 * 10)
        ev = measure_streamed_eval(final + dropped)
        print("streamed_eval:", json.dumps(ev))
        out = os.path.join(os.path.dirname(__file__), "..", "tests",
                           "golden", "reference_baseline.json")
        result = {}
        if os.path.exists(out):
            with open(out) as f:
                result = json.load(f)
        result["streamed_eval"] = ev
        with open(out, "w") as f:
            json.dump(result, f, indent=2)
        print(f"wrote {os.path.normpath(out)}")
        return

    flags = flagship_flags()
    dropped = mixednet.spectrogram_slices_dropped(flags)
    final = 1 + (16 * 1500 - 480) // (3 * 16 * 10)
    spectrogram_length = final + dropped
    print(f"spectrogram_length={spectrogram_length} (final={final}, dropped={dropped})")

    batch = args.batch
    model = build_model(spectrogram_length, batch)
    tob = measure_train_on_batch(model, spectrogram_length, batch, args.steps)
    print("train_on_batch:", json.dumps(tob))
    e2e = measure_end_to_end(model, spectrogram_length, batch, args.steps)
    print("end_to_end:", json.dumps(e2e))

    out = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                       "reference_baseline.json")
    result = {}
    if os.path.exists(out):
        with open(out) as f:
            result = json.load(f)
    if batch == 128:
        result.update({
            "hardware": "host CPU (TF 2.21, oneDNN)",
            "batch": batch,
            "spectrogram_length": spectrogram_length,
            # legacy top-level fields = train_on_batch (what bench.py's
            # vs_baseline has always divided by)
            "what": tob["what"],
            "step_seconds": tob["step_seconds"],
            "steps_per_sec": tob["steps_per_sec"],
            "audio_seconds_per_sec": tob["audio_seconds_per_sec"],
            "train_on_batch": tob,
            "end_to_end": e2e,
        })
    else:
        result[f"train_on_batch_b{batch}"] = tob
        result[f"end_to_end_b{batch}"] = e2e
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {os.path.normpath(out)}")


if __name__ == "__main__":
    main()
