"""ROC / false-accepts-per-hour math (ports of reference test.py:30-204).

The cooldown accept-counter is a jax scan over time with a per-cutoff
cooldown carry, so hours-long ambient tracks evaluate on device in one
fused pass instead of the reference's Python loop over every probability
(test.py:118-135).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_CUTOFFS = np.arange(0, 1.01, 0.01)


def moving_average(probs: np.ndarray, window: int = 5) -> np.ndarray:
    """Sliding-window mean, same as sliding_window_view(...).mean(-1)
    (reference test.py:337-341): output length n - window + 1."""
    probs = np.asarray(probs, dtype=np.float64).reshape(-1)
    if probs.shape[0] < window:
        return np.zeros((0,))
    c = np.cumsum(np.concatenate([[0.0], probs]))
    return ((c[window:] - c[:-window]) / window).astype(np.float32)


@jax.jit
def _count_accepts(probs: jnp.ndarray, cutoffs: jnp.ndarray, cooldown_slices: jnp.ndarray):
    """Counts accepts per cutoff with refractory cooldown (one track).

    Reference semantics (test.py:118-135): per probability, cooldown
    decrements (min 0); an accept fires when cooldown==0 and prob > cutoff,
    resetting cooldown to ignore_slices_after_accept.
    """

    def step(cooldown, p):
        cooldown = jnp.maximum(cooldown - 1, 0)
        fire = (cooldown == 0) & (p > cutoffs)
        cooldown = jnp.where(fire, cooldown_slices, cooldown)
        return cooldown, fire

    init = jnp.full(cutoffs.shape, cooldown_slices, dtype=jnp.int32)
    _, fires = jax.lax.scan(step, init, probs)
    return fires.sum(axis=0)


def count_accepts(
    probs: np.ndarray,
    cutoffs: np.ndarray,
    ignore_slices_after_accept: int,
) -> np.ndarray:
    """Public wrapper: per-cutoff cooldown accept counts for one track."""
    return np.asarray(
        _count_accepts(
            jnp.asarray(np.asarray(probs, np.float32)),
            jnp.asarray(cutoffs, jnp.float32),
            jnp.int32(ignore_slices_after_accept),
        )
    )


@jax.jit
def _count_crossings(probs: jnp.ndarray, threshold: jnp.ndarray, refractory: jnp.ndarray):
    """0.5-crossing counting with a refractory index window (one track).

    Reference semantics (test.py:476-483): fp fires at index i when
    previous <= threshold < p and i - last_accept > refractory, with
    previous=0 and last_accept=0 initially (so index 0 never fires for
    refractory >= 0); previous updates every step.
    """

    def step(carry, inp):
        previous, last_accept = carry
        i, p = inp
        fire = (previous <= threshold) & (p > threshold) & (
            i - last_accept > refractory
        )
        last_accept = jnp.where(fire, i, last_accept)
        return (p, last_accept), fire

    idx = jnp.arange(probs.shape[0])
    (_, _), fires = jax.lax.scan(
        step, (jnp.float32(0.0), jnp.int64(0) if idx.dtype == jnp.int64 else jnp.int32(0)),
        (idx, probs),
    )
    return fires.sum()


def count_crossings(probs, threshold: float = 0.5, refractory: int = 0) -> int:
    """Public wrapper for the vectorized 0.5-crossing false-accept count."""
    return int(
        _count_crossings(
            jnp.asarray(np.asarray(probs, np.float32)),
            jnp.float32(threshold),
            jnp.int32(refractory),
        )
    )


def compute_false_accepts_per_hour(
    streaming_probabilities_list: List[np.ndarray],
    cutoffs: np.ndarray = DEFAULT_CUTOFFS,
    ignore_slices_after_accept: int = 75,
    stride: int = 1,
    step_s: float = 0.02,
) -> np.ndarray:
    """False accepts per hour at each cutoff over a list of ambient tracks
    (reference test.py:94-137)."""
    cutoffs_j = jnp.asarray(cutoffs, dtype=jnp.float32)
    total = np.zeros(len(cutoffs))
    hours = 0.0
    for track in streaming_probabilities_list:
        track = np.asarray(track, dtype=np.float32).reshape(-1)
        if track.size == 0:
            continue
        hours += len(track) * stride * step_s / 3600.0
        total += np.asarray(
            _count_accepts(
                jnp.asarray(track), cutoffs_j, jnp.int32(ignore_slices_after_accept)
            )
        )
    if hours <= 0:
        return np.zeros(len(cutoffs))
    return total / hours


def generate_roc_curve(
    false_accepts_per_hour: np.ndarray,
    false_rejections: Sequence[float],
    cutoffs: np.ndarray = DEFAULT_CUTOFFS,
    max_faph: float = 2.0,
):
    """ROC coordinates: faph (x) vs false-rejection rate (y), anchored at
    max_faph and terminated at (0, 1) if no cutoff reaches 0 faph
    (reference test.py:140-204).

    NOTE: fixes two reference bugs (SURVEY.md §8.2): its interpolation
    reused y[i-1] for both endpoints (so the 'interpolated' FNR was just the
    left endpoint) and hardcoded 2.0 instead of max_faph.  Curves can
    therefore differ slightly from the reference near the anchor.
    """
    faph = np.asarray(false_accepts_per_hour, dtype=np.float64)
    fnr = np.asarray(false_rejections, dtype=np.float64)
    cutoffs = np.asarray(cutoffs, dtype=np.float64)

    if faph[0] > max_faph:
        i = 1
        while faph[i] > max_faph:
            i += 1
        x0, y0 = faph[i - 1], fnr[i - 1]
        x1, y1 = faph[i], fnr[i]
        fnr_at_max = (y0 * (x1 - max_faph) + y1 * (max_faph - x0)) / (x1 - x0)
        cutoff_at_max = (cutoffs[i] + cutoffs[i - 1]) / 2.0
        first = i
    else:
        first = 0
        fnr_at_max = fnr[0]
        cutoff_at_max = cutoffs[0]

    xs, ys, cs = [max_faph], [fnr_at_max], [cutoff_at_max]
    for i in range(first, len(fnr)):
        if faph[i] != xs[-1]:
            xs.append(faph[i])
            ys.append(fnr[i])
            cs.append(cutoffs[i])
    if xs[-1] > 0:
        xs.append(0.0)
        ys.append(1.0)
        cs.append(0.0)
    return np.flip(xs), np.flip(ys), np.flip(cs)


def roc_auc(x_coordinates: np.ndarray, y_coordinates: np.ndarray) -> float:
    """Area under the faph-vs-FRR curve via trapezoid (reference test.py:391)."""
    return float(np.trapezoid(y_coordinates, x_coordinates))
