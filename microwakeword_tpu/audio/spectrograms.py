"""Spectrogram generation from (augmented) audio clips
(rebuild of reference audio/spectrograms.py:23-113, using our frontend)."""

from __future__ import annotations

import numpy as np

from microwakeword_tpu.audio.augmentation import Augmentation
from microwakeword_tpu.audio.clips import Clips
from microwakeword_tpu.frontend import generate_features_for_clip


class SpectrogramGeneration:
    """Generates (augmented) spectrograms; optionally splits long ones into
    non-overlapping segments or yields ``slide_frames`` shifted copies to
    simulate streaming alignment (reference spectrograms.py:87-111)."""

    def __init__(
        self,
        clips: Clips,
        augmenter: Augmentation | None = None,
        step_ms: int = 10,
        split_spectrogram_duration_s: float | None = None,
        slide_frames: int | None = None,
        frontend=None,
    ):
        self.clips = clips
        self.augmenter = augmenter
        self.step_ms = step_ms
        self.split_spectrogram_duration_s = split_spectrogram_duration_s
        self.slide_frames = slide_frames
        self.custom_frontend = frontend is not None
        self.frontend = frontend or (
            lambda audio: generate_features_for_clip(audio, self.step_ms)
        )

    def postprocess(self, spectrogram: np.ndarray):
        """Applies the configured split/slide expansion to one spectrogram,
        yielding the training-pool views (reference spectrograms.py:87-111)."""
        if self.split_spectrogram_duration_s is not None:
            length = int(self.split_spectrogram_duration_s / (self.step_ms / 1000))
            if spectrogram.shape[0] > length + 20:
                for start in range(20, spectrogram.shape[0] - length + 1, length):
                    yield spectrogram[start : start + length]
            else:
                yield spectrogram
        elif self.slide_frames is not None:
            window = spectrogram.shape[0] - self.slide_frames + 1
            for i in range(self.slide_frames):
                yield spectrogram[i : i + window]
        else:
            yield spectrogram

    def get_random_spectrogram(self) -> np.ndarray:
        clip = self.clips.get_random_clip()
        if self.augmenter is not None:
            clip = self.augmenter.augment_clip(clip)
        return self.frontend(clip)

    def spectrogram_generator(self, random: bool = False, max_clips=None, **kwargs):
        if random:
            gen = (
                self.clips.random_audio_generator(max_clips=max_clips)
                if max_clips is not None
                else self.clips.random_audio_generator()
            )
        else:
            gen = self.clips.audio_generator(**kwargs)
        if self.augmenter is not None:
            gen = self.augmenter.augment_generator(gen)

        for clip in gen:
            yield from self.postprocess(self.frontend(clip))
