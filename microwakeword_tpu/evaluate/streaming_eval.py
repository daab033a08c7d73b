"""Streamed evaluation harness (ports of reference test.py:207-517).

Ambient tracks are scanned by the streaming model with carried ring-buffer
state (lax.scan inside stream_scan) -- tracks are processed on device in one
fused pass each, instead of the reference's per-chunk Python->TFLite
round-trips (inference.py:109-123).
"""

from __future__ import annotations

import os

import numpy as np

from microwakeword_tpu.evaluate import roc as R


def _bucket(n: int, granularity: int = 512) -> int:
    """Round up to a bucket size to bound XLA recompiles across track lengths."""
    return max(granularity, ((n + granularity - 1) // granularity) * granularity)


def _track_stream_probs(bundle, variables, track: np.ndarray, stream_fn=None) -> np.ndarray:
    """Streaming per-step probabilities for one [T, 40] spectrogram.

    Tracks are zero-padded up to a length bucket (outputs trimmed) so the
    scan compiles once per bucket instead of once per track length."""
    t = track.shape[0] - track.shape[0] % bundle.stride
    if t <= 0:
        return np.zeros((0,))
    steps = t // bundle.stride
    if stream_fn is not None:
        # External runners (TFLite/native) see the exact track: for
        # non-streaming window models, zero padding would leak into the
        # trailing windows.  They emit however many windows fit.
        probs = stream_fn(variables, track[None, :t].astype(np.float32))
        return np.asarray(probs).reshape(-1)
    padded = _bucket(steps) * bundle.stride
    x = np.zeros((1, padded, track.shape[1]), dtype=np.float32)
    x[0, :t] = track[:t]
    probs = bundle.stream_scan(variables, x)
    return np.asarray(probs).reshape(-1)[:steps]


def streaming_model_roc(
    bundle,
    variables,
    feature_handler,
    config: dict,
    folder: str | None = None,
    data_set: str = "testing",
    ambient_set: str = "testing_ambient",
    sliding_window_length: int = 5,
    ignore_slices_after_accept: int = 25,
    accuracy_name: str = "streaming_roc.txt",
    stream_fn=None,
    mesh=None,
):
    """False-accepts-per-hour vs false-rejection ROC of the streaming model
    (reference tflite_streaming_model_roc, test.py:293-403).

    Returns dict with auc, curve coordinates, faph and cutoff table.
    ``stream_fn(variables, x)`` can override the prob source (e.g. an int8
    quantized or TFLite-backed runner) while keeping identical metric math.
    ``mesh`` shards tracks over a jax.sharding.Mesh ('data' axis) and scans
    them as batched SPMD programs (parallel/eval.py) -- the pod-scale path.
    """
    ambient_tracks, _, _ = feature_handler.get_data(
        ambient_set,
        batch_size=config.get("batch_size", 128),
        features_length=config["spectrogram_length"],
        truncation_strategy="none",
    )

    def _all_track_probs(track_list):
        if mesh is not None and stream_fn is None:
            from microwakeword_tpu.parallel.eval import batched_track_probs

            return batched_track_probs(bundle, variables, track_list, mesh)
        return [
            _track_stream_probs(bundle, variables, t, stream_fn)
            for t in track_list
        ]

    ambient_probs = [
        R.moving_average(p, sliding_window_length)
        for p in _all_track_probs(list(ambient_tracks))
    ]

    cutoffs = R.DEFAULT_CUTOFFS
    faph = R.compute_false_accepts_per_hour(
        ambient_probs,
        cutoffs,
        ignore_slices_after_accept,
        stride=config.get("stride", 1),
        step_s=config.get("window_step_ms", 10) / 1000.0,
    )

    test_x, test_y, _ = feature_handler.get_data(
        data_set,
        batch_size=config.get("batch_size", 128),
        features_length=config["spectrogram_length"],
        truncation_strategy="none",
    )
    positive_max_probs = []
    for spec, label in zip(test_x, test_y):
        if label <= 0.5:
            continue
        probs = _track_stream_probs(bundle, variables, spec, stream_fn)
        ma = R.moving_average(probs[ignore_slices_after_accept:], sliding_window_length)
        if len(ma):
            positive_max_probs.append(float(ma.max()))

    if positive_max_probs:
        fnr = [
            1.0 - np.mean([p > c for p in positive_max_probs]) for c in cutoffs
        ]
    else:
        fnr = [1.0] * len(cutoffs)

    xs, ys, cs = R.generate_roc_curve(faph, fnr, cutoffs)
    auc = R.roc_auc(xs, ys)

    result = {
        "auc": auc,
        "x_faph": xs,
        "y_frr": ys,
        "cutoffs": cs,
        "faph_at_cutoffs": faph,
        "frr_at_cutoffs": np.asarray(fnr),
        "positive_count": len(positive_max_probs),
    }
    if folder:
        os.makedirs(folder, exist_ok=True)
        with open(os.path.join(folder, accuracy_name), "w") as f:
            f.write(f"AUC {auc:.5f}\n")
            for i in range(len(xs)):
                f.write(
                    f"Cutoff {cs[i]:.2f}: frr={ys[i]:.4f}; faph={xs[i]:.3f}\n"
                )
    return result


def model_accuracy(
    bundle,
    variables,
    feature_handler,
    config: dict,
    data_set: str = "testing",
    folder: str | None = None,
    accuracy_name: str = "model_accuracy.txt",
    use_streaming: bool = False,
):
    """Accuracy metrics on a test set (reference tf_model_accuracy /
    tflite_model_accuracy semantics, test.py:207-290, 406-517).

    Non-ambient sets: last-window prediction at threshold 0.5.
    Ambient sets ('none' truncation): counts 0.5-crossing false accepts with
    a refractory window of spectrogram_length_final_layer slices.
    """
    truncation = "none" if data_set.endswith("ambient") else "truncate_start"
    x, y, _ = feature_handler.get_data(
        data_set,
        batch_size=config.get("batch_size", 128),
        features_length=config["spectrogram_length"],
        truncation_strategy=truncation,
    )
    tp = tn = fp = fn = 0
    if truncation != "none":
        if use_streaming:
            preds = []
            for spec in x:
                probs = _track_stream_probs(bundle, variables, spec)
                preds.append(probs[-1] > 0.5 if len(probs) else False)
            preds = np.asarray(preds)
        else:
            probs = np.asarray(bundle.forward(variables, np.asarray(x))).reshape(-1)
            preds = probs > 0.5
        pos = y > 0.5
        tp = int(np.sum(preds & pos))
        tn = int(np.sum(~preds & ~pos))
        fp = int(np.sum(preds & ~pos))
        fn = int(np.sum(~preds & pos))
    else:
        refractory = int(config.get("spectrogram_length_final_layer", 0))
        for spec in x:
            probs = _track_stream_probs(bundle, variables, spec)
            previous, last_accept = 0.0, 0
            for i, p in enumerate(probs):
                if previous <= 0.5 < p and (i - last_accept > refractory):
                    fp += 1
                    last_accept = i
                previous = float(p)

    count = tp + tn + fp + fn
    metrics = {
        "accuracy": (tp + tn) / count if count else float("nan"),
        "recall": tp / (tp + fn) if (tp + fn) else float("nan"),
        "precision": tp / (tp + fp) if (tp + fp) else float("nan"),
        "false_positive_rate": fp / (fp + tn) if (fp + tn) else float("nan"),
        "false_negative_rate": fn / (tp + fn) if (tp + fn) else float("nan"),
        "count": count,
        "false_positives": fp,
    }
    if data_set.endswith("ambient"):
        hours = feature_handler.get_mode_duration(data_set) / 3600.0
        metrics["false_accepts_per_hour"] = fp / hours if hours else float("nan")
    if folder:
        os.makedirs(folder, exist_ok=True)
        with open(os.path.join(folder, accuracy_name), "w") as f:
            f.write(repr(metrics))
    return metrics
