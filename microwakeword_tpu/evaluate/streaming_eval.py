"""Streamed evaluation harness (ports of reference test.py:207-517).

Ambient tracks are scanned by the streaming model with carried ring-buffer
state (lax.scan inside stream_scan) -- tracks are processed on device in one
fused pass each, instead of the reference's per-chunk Python->TFLite
round-trips (inference.py:109-123).

Multi-host: tracks and positive samples are deterministically sharded over
processes (track i -> process i % n), each process scans its shard on its
local devices, and the per-cutoff accept/recall COUNTS are summed across
processes (SURVEY.md §5 "pod-wide ROC") -- the curve math then runs on
identical global counts everywhere.
"""

from __future__ import annotations

import os

import numpy as np

from microwakeword_tpu.evaluate import roc as R


def _bucket(n: int, granularity: int = 512) -> int:
    """Round up to a bucket size to bound XLA recompiles across track lengths."""
    return max(granularity, ((n + granularity - 1) // granularity) * granularity)


def _global_sum(arr: np.ndarray) -> np.ndarray:
    """Sums an array over all JAX processes (identity on a single host)."""
    import jax

    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils  # pragma: no cover

    return np.asarray(multihost_utils.process_allgather(arr)).sum(axis=0)


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


def ambient_accept_counts(
    probs_list,
    cutoffs,
    ignore_slices_after_accept: int,
    sliding_window_length: int = 5,
    stride: int = 1,
    step_s: float = 0.01,
):
    """Per-cutoff cooldown accept counts over a list of per-step prob
    tracks (local shard); returns ([len(cutoffs)] counts, hours).

    Hours follow the reference's convention: duration of the
    moving-averaged probability sequence (test.py:118-119), not the raw
    track length."""
    total = np.zeros(len(cutoffs))
    hours = 0.0
    for probs in probs_list:
        ma = R.moving_average(probs, sliding_window_length)
        if ma.size:
            hours += len(ma) * stride * step_s / 3600.0
            total += np.asarray(
                R.count_accepts(ma, cutoffs, ignore_slices_after_accept)
            )
    return total, hours


def positive_detection_counts(
    max_probs,
    cutoffs,
):
    """[len(cutoffs)] counts of positives whose windowed max prob exceeds
    each cutoff, plus the number of positives (local shard)."""
    max_probs = np.asarray(max_probs, np.float64).reshape(-1)
    detected = (max_probs[:, None] > np.asarray(cutoffs)[None, :]).sum(axis=0)
    return detected.astype(np.float64), len(max_probs)


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
    process_shard: tuple[int, int] | None = None,
):
    """False-accepts-per-hour vs false-rejection ROC of the streaming model
    (reference tflite_streaming_model_roc, test.py:293-403).

    Returns dict with auc, curve coordinates, faph and cutoff table.
    ``stream_fn(variables, x)`` can override the prob source (e.g. an int8
    quantized or TFLite-backed runner) while keeping identical metric math.
    ``mesh`` shards tracks over a jax.sharding.Mesh ('data' axis) and scans
    them as batched SPMD programs (parallel/eval.py) -- the pod-scale path.
    ``process_shard`` (index, count) overrides the per-process track
    assignment (defaults to jax.process_index()/process_count()); counts are
    summed across processes so every host returns the same global curve.
    """
    import jax

    if process_shard is None:
        process_shard = (jax.process_index(), jax.process_count())
    p_idx, p_cnt = process_shard

    ambient_tracks, _, _ = feature_handler.get_data(
        ambient_set,
        batch_size=config.get("batch_size", 128),
        features_length=config["spectrogram_length"],
        truncation_strategy="none",
    )
    ambient_tracks = list(ambient_tracks)
    local_ambient = ambient_tracks[p_idx::p_cnt]

    def _all_track_probs(track_list):
        if mesh is not None and stream_fn is None:
            from microwakeword_tpu.parallel.eval import batched_track_probs

            return batched_track_probs(bundle, variables, track_list, mesh)
        return [
            _track_stream_probs(bundle, variables, t, stream_fn)
            for t in track_list
        ]

    cutoffs = R.DEFAULT_CUTOFFS
    local_counts, local_hours = ambient_accept_counts(
        _all_track_probs(local_ambient),
        cutoffs,
        ignore_slices_after_accept,
        sliding_window_length,
        stride=config.get("stride", 1),
        step_s=config.get("window_step_ms", 10) / 1000.0,
    )
    combined = _global_sum(np.concatenate([local_counts, [local_hours]]))
    accept_counts, hours = combined[:-1], combined[-1]
    faph = accept_counts / hours if hours > 0 else np.zeros(len(cutoffs))

    test_x, test_y, _ = feature_handler.get_data(
        data_set,
        batch_size=config.get("batch_size", 128),
        features_length=config["spectrogram_length"],
        truncation_strategy="none",
    )
    positives = [s for s, label in zip(test_x, test_y) if label > 0.5]
    local_positives = positives[p_idx::p_cnt]
    positive_max_probs = []
    for probs in _all_track_probs(local_positives):
        ma = R.moving_average(probs[ignore_slices_after_accept:], sliding_window_length)
        if len(ma):
            positive_max_probs.append(float(ma.max()))

    detected, n_local = positive_detection_counts(positive_max_probs, cutoffs)
    global_counts = _global_sum(
        np.concatenate([detected, [float(n_local)]])
    )
    detected, n_pos = global_counts[:-1], global_counts[-1]
    if n_pos > 0:
        fnr = 1.0 - detected / n_pos
    else:
        fnr = np.ones(len(cutoffs))

    xs, ys, cs = R.generate_roc_curve(faph, fnr, cutoffs)
    auc = R.roc_auc(xs, ys)

    result = {
        "auc": auc,
        "x_faph": xs,
        "y_frr": ys,
        "cutoffs": cs,
        "faph_at_cutoffs": faph,
        "frr_at_cutoffs": np.asarray(fnr),
        "positive_count": int(n_pos),
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
        # 0.5-crossing counting with refractory window, as a vectorized jax
        # scan per track (reference test.py:476-483 walks a Python loop).
        refractory = int(config.get("spectrogram_length_final_layer", 0))
        for spec in x:
            probs = _track_stream_probs(bundle, variables, spec)
            if len(probs):
                fp += int(R.count_crossings(probs, 0.5, refractory))

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
