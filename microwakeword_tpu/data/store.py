"""Feature store: loads ragged spectrogram sets and serves batches.

Host-side equivalent of the reference FeatureHandler (data.py:405-597) with
the same YAML schema and sampling semantics, plus a ``pack()`` method that
uploads entire training splits to device memory for the on-device sampler
(data/sampler.py) -- the reference's per-step Python batch assembly
(its main throughput bottleneck, SURVEY.md §3.1) is replaced by jitted
gathers.
"""

from __future__ import annotations

import os
import random
from pathlib import Path

import numpy as np

from microwakeword_tpu.data.ragged_store import open_ragged

MODES = (
    "training",
    "validation",
    "testing",
    "validation_ambient",
    "testing_ambient",
)

FEATURE_SCALE = np.float32(0.0390625)

TRUNCATION_STRATEGIES = (
    "random",
    "truncate_start",
    "truncate_end",
    "fixed_right_cutoff",
    "split",
    "none",
)


def spec_augment(
    spectrogram: np.ndarray,
    time_mask_max_size: int = 0,
    time_mask_count: int = 0,
    freq_mask_max_size: int = 0,
    freq_mask_count: int = 0,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """SpecAugment masks (reference data.py:32-71 semantics)."""
    rng = rng or np.random.default_rng()
    out = np.copy(spectrogram)
    t_frames, f_bins = out.shape
    for _ in range(time_mask_count):
        t = int(rng.uniform(0, time_mask_max_size))
        t0 = rng.integers(0, t_frames - t + 1)
        out[t0 : t0 + t, :] = 0
    for _ in range(freq_mask_count):
        f = int(rng.uniform(0, freq_mask_max_size))
        f0 = rng.integers(0, f_bins - f + 1)
        out[:, f0 : f0 + f] = 0
    return out


def fixed_length_spectrogram(
    spectrogram: np.ndarray,
    features_length: int,
    truncation_strategy: str = "random",
    right_cutoff: int = 0,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Pad (left zeros) or truncate to features_length (reference data.py:74-118)."""
    rng = rng or np.random.default_rng()
    n = spectrogram.shape[0]
    offset = 0
    if n > features_length:
        if truncation_strategy == "random":
            # reference: np.random.randint(0, n - L) -- high-exclusive, so the
            # final frame is never the window end; preserved for parity.
            offset = int(rng.integers(0, n - features_length))
        elif truncation_strategy == "none":
            return spectrogram
        elif truncation_strategy == "truncate_start":
            offset = n - features_length
        elif truncation_strategy == "truncate_end":
            offset = 0
        elif truncation_strategy == "fixed_right_cutoff":
            offset = n - features_length - right_cutoff
        else:
            raise ValueError(f"unknown truncation strategy {truncation_strategy!r}")
    else:
        spectrogram = np.pad(
            spectrogram, ((features_length - n, 0), (0, 0)), constant_values=0
        )
    return spectrogram[offset : offset + features_length]


def _scale(spec: np.ndarray) -> np.ndarray:
    if np.issubdtype(spec.dtype, np.uint16):
        return spec.astype(np.float32) * FEATURE_SCALE
    return spec.astype(np.float32)


class MmapFeatureSet:
    """One configured feature set backed by ragged stores on disk
    (reference MmapFeatureGenerator, data.py:121-321)."""

    def __init__(
        self,
        features_dir: str,
        truth: bool,
        sampling_weight: float,
        penalty_weight: float,
        truncation_strategy: str,
        stride: int = 1,
        step_ms: int = 10,
        fixed_right_cutoffs: list[int] | None = None,
    ):
        self.label = float(truth)
        self.sampling_weight = float(sampling_weight)
        self.penalty_weight = float(penalty_weight)
        self.truncation_strategy = truncation_strategy
        self.fixed_right_cutoffs = fixed_right_cutoffs or [0]
        self.stride = stride
        self.step_s = step_ms / 1000.0

        self.stores: dict[str, list] = {m: [] for m in MODES}
        self.stats: dict[str, dict] = {}
        for mode in MODES:
            count, duration = 0, 0.0
            mode_dir = os.path.join(features_dir, mode)
            for p in sorted(Path(os.path.abspath(mode_dir)).glob("**/*_mmap")):
                if not p.is_dir():
                    continue
                store = open_ragged(str(p))
                self.stores[mode].append(store)
                count += len(store)
                duration += self.step_s * float(np.sum(np.diff(store.offsets)))
            self.stats[mode] = {
                "spectrogram_count": count,
                "total_duration": duration,
            }

    def get_mode_size(self, mode: str) -> int:
        return self.stats[mode]["spectrogram_count"]

    def get_mode_duration(self, mode: str) -> float:
        return self.stats[mode]["total_duration"]

    def _all(self, mode: str):
        for store in self.stores[mode]:
            yield from store

    def get_random_spectrogram(
        self, mode, features_length, truncation_strategy, rng=None
    ):
        rng = rng or np.random.default_rng()
        if truncation_strategy == "default":
            truncation_strategy = self.truncation_strategy
        right_cutoff = 0
        if truncation_strategy == "fixed_right_cutoff":
            right_cutoff = random.choice(self.fixed_right_cutoffs)
        sizes = [len(s) for s in self.stores[mode]]
        total = sum(sizes)
        i = int(rng.integers(0, total))
        for store, size in zip(self.stores[mode], sizes):
            if i < size:
                spec = store[i]
                break
            i -= size
        return _scale(
            fixed_length_spectrogram(
                spec, features_length, truncation_strategy, right_cutoff, rng
            )
        )

    def feature_generator(self, mode, features_length, truncation_strategy="default"):
        """Deterministic pass over a mode (reference data.py:273-321)."""
        if truncation_strategy == "default":
            truncation_strategy = self.truncation_strategy
        for spec in self._all(mode):
            spec_f = _scale(spec)
            if truncation_strategy == "split":
                step_slices = int(1000 * self.step_s * self.stride)
                for start in range(
                    0, spec_f.shape[0] - features_length, step_slices
                ):
                    yield spec_f[start : start + features_length]
            else:
                for cutoff in self.fixed_right_cutoffs:
                    yield fixed_length_spectrogram(
                        spec_f, features_length, truncation_strategy, cutoff
                    )

    def gather_mode(
        self, mode, features_length, truncation_strategy="default"
    ) -> np.ndarray | None:
        """Vectorized equivalent of list(feature_generator(...)) using the
        native threaded gather (native/src/mww_native.cc).  Returns
        [N, features_length, 40] float32, or None if the fast path doesn't
        apply (non-uint16 store, unsupported strategy) -- callers fall back
        to feature_generator.
        """
        from microwakeword_tpu import native

        if truncation_strategy == "default":
            truncation_strategy = self.truncation_strategy
        if truncation_strategy in ("none", "random") or not native.available():
            return None
        outs = []
        for store in self.stores[mode]:
            if store.dtype != np.uint16:
                return None
            lengths = np.diff(store.offsets).astype(np.int64)
            clip_idx, starts = [], []
            if truncation_strategy == "split":
                step_slices = int(1000 * self.step_s * self.stride)
                for ci, n in enumerate(lengths):
                    # range(0, n - L, step): excludes the final window start.
                    n_win = max(0, -(-(int(n) - features_length) // step_slices))
                    for w in range(n_win):
                        clip_idx.append(ci)
                        starts.append(w * step_slices)
            else:
                for ci, n in enumerate(lengths):
                    n = int(n)
                    for cutoff in self.fixed_right_cutoffs:
                        if n > features_length:
                            if truncation_strategy == "truncate_start":
                                s = n - features_length
                            elif truncation_strategy == "truncate_end":
                                s = 0
                            elif truncation_strategy == "fixed_right_cutoff":
                                s = n - features_length - cutoff
                            else:
                                return None
                        else:
                            s = n - features_length  # <=0: left zero-pad
                        clip_idx.append(ci)
                        starts.append(s)
            outs.append(
                native.gather_windows(
                    store.data,
                    store.offsets,
                    np.asarray(clip_idx, np.int32),
                    np.asarray(starts, np.int32),
                    features_length,
                    scale=float(FEATURE_SCALE),
                )
            )
        if not outs:
            return np.zeros((0, features_length, 40), np.float32)
        return np.concatenate(outs, axis=0)


class ClipsFeatureSet:
    """On-the-fly feature set: generates freshly augmented spectrograms from
    audio files during training (reference ClipsHandlerWrapperGenerator,
    data.py:324-402).  Training-only; all other modes are empty.

    For the on-device sampler (data/sampler.py) -- which needs the corpus
    resident in HBM -- a pool of ``pack_pool_size`` augmented spectrograms is
    materialized at pack time (per-host sharded).  The host-side
    ``get_data`` path draws a fresh augmentation per sample, exactly like
    the reference.
    """

    stores = None  # marker: no on-disk ragged stores

    def __init__(
        self,
        clips_settings: dict,
        augmentation_settings: dict,
        spectrogram_generation_settings: dict,
        truth: bool,
        sampling_weight: float,
        penalty_weight: float,
        truncation_strategy: str,
        pack_pool_size: int = 2000,
    ):
        from microwakeword_tpu.audio.augmentation import Augmentation
        from microwakeword_tpu.audio.clips import Clips
        from microwakeword_tpu.audio.spectrograms import SpectrogramGeneration

        self.label = float(truth)
        self.sampling_weight = float(sampling_weight)
        self.penalty_weight = float(penalty_weight)
        self.truncation_strategy = truncation_strategy
        self.fixed_right_cutoffs = [0]
        self.pack_pool_size = int(pack_pool_size)

        clips = Clips(**clips_settings)
        augmenter = Augmentation(**augmentation_settings)
        self.spectrogram_generation = SpectrogramGeneration(
            clips, augmenter, **spectrogram_generation_settings
        )
        self._generator = self.spectrogram_generation.spectrogram_generator(
            random=True
        )

    def get_mode_size(self, mode: str) -> int:
        if mode == "training":
            return len(self.spectrogram_generation.clips.clips)
        return 0

    def get_mode_duration(self, mode: str) -> float:
        return 0.0

    def get_random_spectrogram(
        self, mode, features_length, truncation_strategy, rng=None
    ):
        if truncation_strategy == "default":
            truncation_strategy = self.truncation_strategy
        spec = next(self._generator)
        return _scale(
            fixed_length_spectrogram(
                spec, features_length, truncation_strategy, 0, rng
            )
        )

    def feature_generator(self, mode, features_length, truncation_strategy="default"):
        """Training-only provider: deterministic passes yield nothing
        (reference data.py:395-402)."""
        return iter(())

    def gather_mode(self, mode, features_length, truncation_strategy="default"):
        return None

    def _audio_pool(self, n: int):
        """Draws n freshly augmented raw clips (float32 [-1, 1])."""
        gen = self.spectrogram_generation.clips.random_audio_generator()
        if self.spectrogram_generation.augmenter is not None:
            gen = self.spectrogram_generation.augmenter.augment_generator(gen)
        return [np.asarray(next(gen), np.float32) for _ in range(n)]

    def generate_audio_pool(self, shard_index: int = 0, shard_count: int = 1):
        """This host's shard of raw augmented audio for PackedAudioData
        (sampler.pack_audio_data): features are then computed on-device
        inside the train step (reference data.py:324-402 equivalent)."""
        n = max(1, self.pack_pool_size // max(1, shard_count))
        return self._audio_pool(n)

    def generate_pool(self, shard_index: int = 0, shard_count: int = 1):
        """Materializes this host's shard of the sampler pool.

        Returns (frames uint16 [sum(T_i), 40], lengths int64 [n]).

        Spectrograms are computed with the batched on-device frontend
        (frontend/xla.py frontend_batch) over length-padded clip batches --
        one MXU program per batch instead of the per-clip host frontend
        (reference generates each spectrogram serially in Python,
        spectrograms.py:61-113).
        """
        from microwakeword_tpu.frontend import xla as F

        sg = self.spectrogram_generation
        n = max(1, self.pack_pool_size // max(1, shard_count))
        specs = []
        if sg.custom_frontend:
            # custom frontend: per-clip host path (reference semantics)
            for _ in range(n):
                spec = np.asarray(next(self._generator))
                if not np.issubdtype(spec.dtype, np.uint16):
                    spec = np.round(spec / FEATURE_SCALE).astype(np.uint16)
                specs.append(spec)
        else:
            step_ms = sg.step_ms
            hop = 160 * (step_ms // 10)
            clips = self._audio_pool(n)
            batch = 64
            for i in range(0, len(clips), batch):
                part = clips[i : i + batch]
                # bucket the pad length to bound XLA recompiles across pools
                max_len = -(-max(max(len(c) for c in part), 480) // 8000) * 8000
                x = np.zeros((len(part), max_len), np.float32)
                for row, c in enumerate(part):
                    x[row, : len(c)] = c
                feats = np.asarray(F.frontend_batch(x, step_ms=step_ms))
                for row, c in enumerate(part):
                    t = 1 + (len(c) - 480) // hop if len(c) >= 480 else 0
                    for spec in sg.postprocess(feats[row, :t]):
                        specs.append(
                            np.round(spec / FEATURE_SCALE).astype(np.uint16)
                        )
        lengths = np.asarray([s.shape[0] for s in specs], np.int64)
        return np.concatenate(specs, axis=0), lengths


class FeatureHandler:
    """Loads all configured feature sets (reference FeatureHandler,
    data.py:405-597); config schema matches the reference YAML."""

    def __init__(self, config: dict):
        self.providers: list = []
        stride = config.get("stride", 1)
        step_ms = config.get("window_step_ms", 10)
        for fs in config.get("features", []):
            if fs.get("type", "mmap") == "mmap":
                self.providers.append(
                    MmapFeatureSet(
                        fs["features_dir"],
                        fs["truth"],
                        fs["sampling_weight"],
                        fs["penalty_weight"],
                        fs["truncation_strategy"],
                        stride=stride,
                        step_ms=step_ms,
                        fixed_right_cutoffs=fs.get("fixed_right_cutoffs"),
                    )
                )
            elif fs.get("type") == "clips":
                self.providers.append(
                    ClipsFeatureSet(
                        fs["clips_settings"],
                        fs.get("augmentation_settings", {}),
                        fs.get("spectrogram_generation_settings", {}),
                        fs["truth"],
                        fs["sampling_weight"],
                        fs["penalty_weight"],
                        fs["truncation_strategy"],
                        pack_pool_size=fs.get("pack_pool_size", 2000),
                    )
                )
            else:
                raise NotImplementedError(
                    f"feature set type {fs.get('type')!r} not supported yet"
                )

    def get_mode_size(self, mode: str) -> int:
        return sum(p.get_mode_size(mode) for p in self.providers)

    def get_mode_duration(self, mode: str) -> float:
        return sum(p.get_mode_duration(mode) for p in self.providers)

    def get_data(
        self,
        mode: str,
        batch_size: int,
        features_length: int,
        truncation_strategy: str = "default",
        augmentation_policy: dict | None = None,
        rng: np.random.Generator | None = None,
    ):
        """Host-side batch assembly with reference semantics (data.py:497-597).

        Used for evaluation set assembly and as the golden model for the
        on-device sampler; the hot training path uses data/sampler.py.
        """
        rng = rng or np.random.default_rng()
        policy = augmentation_policy or {}
        data, labels, weights = [], [], []
        if mode == "training":
            active = [p for p in self.providers if p.get_mode_size("training")]
            probs = np.asarray([p.sampling_weight for p in active], dtype=np.float64)
            probs = probs / probs.sum()
            choices = rng.choice(len(active), size=batch_size, p=probs)
            for ci in choices:
                p = active[ci]
                spec = p.get_random_spectrogram(
                    "training", features_length, truncation_strategy, rng
                )
                spec = spec_augment(
                    spec,
                    policy.get("time_mask_max_size", 0),
                    policy.get("time_mask_count", 0),
                    policy.get("freq_mask_max_size", 0),
                    policy.get("freq_mask_count", 0),
                    rng,
                )
                data.append(spec)
                labels.append(p.label)
                weights.append(p.penalty_weight)
        else:
            # Per-provider blocks, native threaded gather when possible
            # (preserves provider order for label/weight alignment).
            blocks = []
            for p in self.providers:
                fast = (
                    p.gather_mode(mode, features_length, truncation_strategy)
                    if truncation_strategy != "none"
                    else None
                )
                if fast is None:
                    slow = list(
                        p.feature_generator(mode, features_length, truncation_strategy)
                    )
                    if truncation_strategy == "none":
                        data.extend(slow)
                        fast = slow  # only for the label/weight count below
                    else:
                        fast = (
                            np.stack(slow).astype(np.float32)
                            if slow
                            else np.zeros((0, features_length, 40), np.float32)
                        )
                        blocks.append(fast)
                else:
                    blocks.append(fast)
                labels.extend([p.label] * len(fast))
                weights.extend([p.penalty_weight] * len(fast))

        labels = np.asarray(labels, dtype=np.float32)
        weights = np.asarray(weights, dtype=np.float32)
        if truncation_strategy == "none":
            return data, labels, weights
        if mode == "training":
            data = (
                np.stack(data).astype(np.float32)
                if data
                else np.zeros((0, features_length, 40), np.float32)
            )
        else:
            data = (
                np.concatenate(blocks, axis=0)
                if blocks
                else np.zeros((0, features_length, 40), np.float32)
            )
        # The reference shuffles every non-"none" result (data.py:591-597;
        # its mode condition is an always-true quirk, SURVEY.md §8.1 -- the
        # *intent*, shuffling eval sets, is preserved deliberately).
        idx = rng.permutation(len(labels))
        return data[idx], labels[idx], weights[idx]

    # ------------------------------------------------------------------
    def pack_training(self, shard_index=None, shard_count=None):
        """Packs all training splits for the on-device sampler; on multi-host
        pods each process packs only its deterministic shard of the clips
        (data/sampler.py pack_training_data)."""
        from microwakeword_tpu.data.sampler import pack_training_data

        return pack_training_data(self.providers, shard_index, shard_count)

    def pack_training_audio(self, shard_index=None, shard_count=None,
                            step_ms: int = 10):
        """Packs for in-step frontend training (config ``raw_audio_training:
        true``).  clips-type sets contribute raw augmented audio; mmap sets
        contribute precomputed spectrograms -- mixed configs (e.g. generated
        positives + precomputed mmap negatives, like the reference's usual
        recipe, data.py:405-466) train on the fused path via
        sampler.PackedMixedData.  ``step_ms`` is the frontend hop (config
        window_step_ms; the reference's code default is 20, SURVEY §8.8)."""
        from microwakeword_tpu.data.sampler import pack_mixed_data

        return pack_mixed_data(self.providers, shard_index, shard_count,
                               step_ms)
