"""Streaming wake-word inference on raw audio
(rebuild of reference inference.py:34-125).

Three interchangeable backends:
- JAX: the native streaming model (ring-buffer cache scan) -- the TPU/dev
  path;
- TFLite: an exported stream_state_internal(.tflite) via the interpreter --
  the deployment-parity path;
- native: the C++ streaming runtime on an exported .mww model
  (export/native_runtime.py + native/src/mww_runtime.cc) -- the
  no-Python deployment path;
- StableHLO: a serialized .mwwx jax.export artifact
  (export/stablehlo.py) -- the portable pure-function path.

All consume our micro-frontend features (uint16*0.0390625 convention).
"""

from __future__ import annotations

import numpy as np

from microwakeword_tpu.frontend import generate_features_for_clip


class Model:
    """Wake-word model for clip/spectrogram prediction.

    Usage:
        Model.from_jax(bundle, variables)
        Model.from_tflite("stream_state_internal_quant.tflite", stride=3)
    """

    def __init__(self, predict_spectrogram_fn, stride: int = 1):
        self._predict = predict_spectrogram_fn
        self.stride = stride

    @classmethod
    def from_jax(cls, bundle, variables):
        def predict(spec: np.ndarray) -> np.ndarray:
            t = (spec.shape[0] // bundle.stride) * bundle.stride
            if t <= 0:
                return np.zeros((0,), np.float32)
            probs = bundle.stream_scan(
                variables, np.asarray(spec[:t], np.float32)[None]
            )
            return np.asarray(probs).reshape(-1)

        return cls(predict, stride=bundle.stride)

    @classmethod
    def from_native(cls, path: str, step_ms: int = 10):
        """Loads an exported .mww model into the C++ streaming runtime."""
        from microwakeword_tpu.native import StreamingRuntime

        runner = StreamingRuntime(path, step_ms=step_ms)

        def predict(spec: np.ndarray) -> np.ndarray:
            runner.reset()
            return runner.predict_spectrogram(np.asarray(spec, np.float32))

        return cls(predict, stride=runner.stride)

    @classmethod
    def from_stablehlo(cls, path: str):
        """Loads a .mwwx StableHLO artifact (export/stablehlo.py) -- the
        serialized pure-function deployment path (weights baked in, runs on
        any platform the artifact was lowered for)."""
        from microwakeword_tpu.export.stablehlo import StableHLOModel

        runner = StableHLOModel(path)
        return cls(runner.predict_spectrogram, stride=runner.stride)

    @classmethod
    def from_tflite(cls, path: str, stride: int = 1):
        from microwakeword_tpu.export.tflite import TFLiteStreamingModel

        runner = TFLiteStreamingModel(path, stride=stride)

        def predict(spec: np.ndarray) -> np.ndarray:
            runner.reset()
            return runner.predict_spectrogram(np.asarray(spec, np.float32))

        return cls(predict, stride=stride)

    def predict_spectrogram(self, spectrogram: np.ndarray) -> np.ndarray:
        """[T, 40] features -> [T // stride] wake probabilities."""
        return self._predict(np.asarray(spectrogram, dtype=np.float32))

    def predict_clip(self, audio: np.ndarray, step_ms: int = 10) -> np.ndarray:
        """Raw 16 kHz PCM (int16, or float in [-1, 1]) -> probabilities."""
        spec = generate_features_for_clip(np.asarray(audio), step_ms=step_ms)
        return self.predict_spectrogram(spec)
