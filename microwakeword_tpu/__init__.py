"""microwakeword_tpu: a TPU-native wake-word training & inference framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
kahrendt/microWakeWord: micro_speech-style audio frontend, streaming
MixedNet/Inception wake-word models with explicit ring-buffer state,
fully on-device data sampling + SpecAugment, pod-scale data-parallel
training, ambient false-accept-per-hour evaluation, and int8 TFLite export.
"""

__version__ = "0.1.0"
