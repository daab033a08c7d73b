"""Validation metric math.

Device side: vectorized confusion counts over the 101-cutoff grid
(replacing the reference's Keras threshold metrics, train.py:209-221).
Host side: exact ports of the reference's checkpoint-selection curve math
(train.py:104-161): recall_at_no_faph, linear-interpolated recall at
2 faph, and average_viable_recall = trapz(recall vs faph over [0,2])/2.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

CUTOFFS = np.linspace(0.0, 1.0, 101)


def confusion_at_cutoffs(probs: jnp.ndarray, labels: jnp.ndarray, weights=None):
    """tp/fp/tn/fn counts at each of the 101 cutoffs.

    probs, labels: [N].  Keras thresholds semantics: positive iff
    prob > cutoff.  Returns dict of [101] arrays.
    """
    probs = probs.reshape(-1)
    labels = labels.reshape(-1)
    pred = probs[:, None] > CUTOFFS[None, :]  # [N, 101]
    pos = labels[:, None] > 0.5
    if weights is None:
        w = jnp.ones_like(probs)[:, None]
    else:
        w = weights.reshape(-1)[:, None]
    tp = jnp.sum(w * (pred & pos), axis=0)
    fp = jnp.sum(w * (pred & ~pos), axis=0)
    fn = jnp.sum(w * (~pred & pos), axis=0)
    tn = jnp.sum(w * (~pred & ~pos), axis=0)
    return {"tp": tp, "fp": fp, "fn": fn, "tn": tn}


def binary_metrics(probs: jnp.ndarray, labels: jnp.ndarray) -> dict:
    """Threshold-0.5 accuracy/recall/precision + exact (rank) AUC + BCE loss."""
    probs = probs.reshape(-1)
    labels = labels.reshape(-1)
    pred = probs > 0.5
    pos = labels > 0.5
    tp = jnp.sum(pred & pos)
    fp = jnp.sum(pred & ~pos)
    fn = jnp.sum(~pred & pos)
    tn = jnp.sum(~pred & ~pos)
    n = probs.shape[0]
    accuracy = (tp + tn) / jnp.maximum(n, 1)
    recall = tp / jnp.maximum(tp + fn, 1)
    precision = tp / jnp.maximum(tp + fp, 1)
    # Exact Mann-Whitney AUC (the reference's Keras AUC is a 200-bucket
    # Riemann approximation of the same quantity).
    order = jnp.argsort(probs)
    ranks = jnp.empty_like(order).at[order].set(jnp.arange(n))
    n_pos = jnp.sum(pos)
    n_neg = n - n_pos
    auc = (jnp.sum(jnp.where(pos, ranks, 0)) - n_pos * (n_pos - 1) / 2.0) / jnp.maximum(
        n_pos * n_neg, 1
    )
    eps = 1e-7
    p = jnp.clip(probs, eps, 1 - eps)
    loss = -jnp.mean(jnp.where(pos, jnp.log(p), jnp.log1p(-p)))
    return {
        "accuracy": accuracy,
        "recall": recall,
        "precision": precision,
        "auc": auc,
        "loss": loss,
    }


def validation_metrics(
    val_probs: np.ndarray,
    val_labels: np.ndarray,
    ambient_probs: np.ndarray | None,
    ambient_duration_hours: float,
) -> dict:
    """Checkpoint-selection metrics (exact port of reference
    validate_nonstreaming, train.py:41-163).

    The reference accumulates tp/fn across BOTH the validation and the
    ambient-split sets (its metric-accumulation hack, train.py:88-105,
    SURVEY.md §8.6 -- intended behavior per its README); faph comes from the
    ambient set's false positives only.
    """
    val_probs = np.asarray(val_probs).reshape(-1)
    val_labels = np.asarray(val_labels).reshape(-1)
    base = {k: float(v) for k, v in binary_metrics(
        jnp.asarray(val_probs), jnp.asarray(val_labels)).items()}
    metrics = dict(base)
    metrics.update(
        recall_at_no_faph=0.0,
        cutoff_for_no_faph=0.0,
        ambient_false_positives=0.0,
        ambient_false_positives_per_hour=0.0,
        average_viable_recall=0.0,
    )
    if ambient_probs is None or len(ambient_probs) == 0:
        return metrics

    ambient_probs = np.asarray(ambient_probs).reshape(-1)
    cutoffs = CUTOFFS
    val_pos = val_labels > 0.5
    tp = ((val_probs[val_pos, None]) > cutoffs[None, :]).sum(axis=0)
    fn = val_pos.sum() - tp  # ambient windows are all negative: no tp/fn there
    ambient_fp = (ambient_probs[:, None] > cutoffs[None, :]).sum(axis=0)

    # Combined loss/auc across both sets (reference takes them from the
    # second evaluate call which accumulates both).
    all_probs = np.concatenate([val_probs, ambient_probs])
    all_labels = np.concatenate([val_labels, np.zeros_like(ambient_probs)])
    both = binary_metrics(jnp.asarray(all_probs), jnp.asarray(all_labels))
    metrics["auc"] = float(both["auc"])
    metrics["loss"] = float(both["loss"])

    recall_at_cutoffs = tp / np.maximum(tp + fn, 1)
    faph_at_cutoffs = ambient_fp / max(ambient_duration_hours, 1e-12)

    recall_at_no_faph = 0.0
    target_faph_cutoff_probability = 1.0
    for index, cutoff in enumerate(cutoffs):
        if faph_at_cutoffs[index] == 0:
            target_faph_cutoff_probability = cutoff
            recall_at_no_faph = recall_at_cutoffs[index]
            break

    if faph_at_cutoffs[0] > 2:
        # Linear interpolation to estimate recall at 2 faph (train.py:123-136).
        i = 1
        while faph_at_cutoffs[i] > 2:
            i += 1
        x0, y0 = faph_at_cutoffs[i - 1], recall_at_cutoffs[i - 1]
        x1, y1 = faph_at_cutoffs[i], recall_at_cutoffs[i]
        recall_at_2faph = (y0 * (x1 - 2.0) + y1 * (2.0 - x0)) / (x1 - x0)
        index_of_first_viable = i
    else:
        index_of_first_viable = 0
        recall_at_2faph = recall_at_cutoffs[0]

    x_coords = [2.0]
    y_coords = [recall_at_2faph]
    for index in range(index_of_first_viable, len(recall_at_cutoffs)):
        if faph_at_cutoffs[index] != x_coords[-1]:
            x_coords.append(faph_at_cutoffs[index])
            y_coords.append(recall_at_cutoffs[index])
    average_viable_recall = (
        np.trapezoid(np.flip(y_coords), np.flip(x_coords)) / 2.0
    )

    metrics["recall_at_no_faph"] = float(recall_at_no_faph)
    metrics["cutoff_for_no_faph"] = float(target_faph_cutoff_probability)
    metrics["ambient_false_positives"] = float(ambient_fp[50])
    metrics["ambient_false_positives_per_hour"] = float(faph_at_cutoffs[50])
    metrics["average_viable_recall"] = float(average_viable_recall)
    return metrics


def is_new_best(
    current_min: float,
    current_max: float,
    best_min: float,
    best_max: float,
    target_min: float,
) -> bool:
    """Two-step checkpoint-selection predicate (exact port of reference
    train.py:411-442): first drive the minimization metric to target, then
    maximize the maximization metric."""
    return (
        (
            current_min <= target_min
            and (current_max > best_max or best_min > target_min)
        )
        or (current_min > target_min and current_min < best_min)
        or (current_min == best_min and current_max > best_max)
    )
