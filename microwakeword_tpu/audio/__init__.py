"""Offline audio pipeline: clip loading, augmentation, VAD, spectrograms."""

from microwakeword_tpu.audio.clips import Clips  # noqa: F401
from microwakeword_tpu.audio.augmentation import Augmentation  # noqa: F401
from microwakeword_tpu.audio.spectrograms import SpectrogramGeneration  # noqa: F401
