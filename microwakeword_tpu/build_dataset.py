"""Dataset-build CLI: audio clips -> augmented spectrogram ragged stores.

One-command version of the documentation/training.md §1 recipe (the
reference has no CLI for this step -- only notebook cell 7, SURVEY.md §3.4):

    python -m microwakeword_tpu.build_dataset --config dataset.yaml

YAML schema (one document per feature dir):

    output_dir: features/wakeword        # -> output_dir/<mode>/<name>_mmap
    name: wakeword
    clips:                               # audio/clips.py Clips(**...)
      input_directory: generated_samples
      file_pattern: "*.wav"
      random_split_seed: 10
      split_count: 0.1
    augmentation:                        # audio/augmentation.py (optional)
      augmentation_duration_s: 3.2
      augmentation_probabilities: {Gain: 1.0}
    spectrogram_generation:              # audio/spectrograms.py (optional)
      step_ms: 10
      slide_frames: 10
    splits:                              # which Clips split feeds which mode
      training:   {split: train, repeat: 2}
      testing:    {split: test}
      validation: {split: validation}

Ambient stores (long recordings, no splitting/augmentation) use
`splits: {testing_ambient: {split: null}}` with a separate clips dir and
typically `spectrogram_generation: {split_spectrogram_duration_s: ...}`.

Spectrograms are computed with the batched on-device frontend
(frontend/xla.py) in length-bucketed batches -- one MXU program per batch
instead of the reference's serial per-clip C calls.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import yaml

FEATURE_SCALE = 0.0390625


def _batched_spectrograms(audio_gen, sg, batch: int = 32):
    """Computes uint16 spectrograms for a clip generator with the batched
    frontend, applying sg.postprocess (split/slide) per clip."""
    from microwakeword_tpu.frontend import xla as F

    step_ms = sg.step_ms
    hop = 160 * (step_ms // 10)

    def flush(part):
        if not part:
            return
        max_len = -(-max(max(len(c) for c in part), 480) // 8000) * 8000
        x = np.zeros((len(part), max_len), np.float32)
        for row, c in enumerate(part):
            x[row, : len(c)] = c
        feats = np.asarray(F.frontend_batch(x, step_ms=step_ms))
        for row, c in enumerate(part):
            t = 1 + (len(c) - 480) // hop if len(c) >= 480 else 0
            for spec in sg.postprocess(feats[row, :t]):
                yield np.round(spec / FEATURE_SCALE).astype(np.uint16)

    part = []
    for clip in audio_gen:
        part.append(np.asarray(clip, np.float32))
        if len(part) == batch:
            yield from flush(part)
            part = []
    yield from flush(part)


def build_feature_dir(config: dict, log=print) -> dict:
    """Builds every split store for one feature-dir config; returns
    {mode: (count, total_frames)}."""
    import os

    from microwakeword_tpu.audio.augmentation import Augmentation
    from microwakeword_tpu.audio.clips import Clips
    from microwakeword_tpu.audio.spectrograms import SpectrogramGeneration
    from microwakeword_tpu.data.ragged_store import RaggedSpectrogramStore

    clips = Clips(**config["clips"])
    augmenter = (
        Augmentation(**config["augmentation"]) if config.get("augmentation") else None
    )
    sg = SpectrogramGeneration(
        clips, augmenter, **(config.get("spectrogram_generation") or {})
    )
    name = config.get("name", "features")
    out_root = config["output_dir"]
    results = {}
    for mode, split_cfg in config["splits"].items():
        split_cfg = split_cfg or {}
        gen = clips.audio_generator(
            split=split_cfg.get("split"), repeat=int(split_cfg.get("repeat", 1))
        )
        if augmenter is not None:
            gen = augmenter.augment_generator(gen)
        path = os.path.join(out_root, mode, f"{name}_mmap")
        if sg.custom_frontend:
            store = RaggedSpectrogramStore.create(
                path,
                (
                    np.round(np.asarray(s) / FEATURE_SCALE).astype(np.uint16)
                    if not np.issubdtype(np.asarray(s).dtype, np.uint16)
                    else np.asarray(s)
                    for clip in gen
                    for s in sg.postprocess(sg.frontend(clip))
                ),
            )
        else:
            store = RaggedSpectrogramStore.create(
                path, _batched_spectrograms(gen, sg)
            )
        results[mode] = (len(store), store.total_frames)
        log(
            f"  {mode}: {len(store)} spectrograms, "
            f"{store.total_frames} frames -> {path}"
        )
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Build spectrogram ragged stores from audio clips."
    )
    ap.add_argument("--config", required=True, help="dataset YAML (one or more "
                    "documents, each one feature dir)")
    args = ap.parse_args(argv)

    with open(args.config) as f:
        docs = [d for d in yaml.safe_load_all(f) if d]
    if not docs:
        print("empty config", file=sys.stderr)
        return 1
    for doc in docs:
        print(f"building {doc.get('output_dir')}:")
        build_feature_dir(doc)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
