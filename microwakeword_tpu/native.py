"""ctypes bindings for the native runtime library (native/libmwwnative.so).

The native library provides host-side runtime components (SURVEY.md §2.2):
threaded ragged-window gather, WAV decode/encode, polyphase resampling and
energy VAD.  Every entry point has a pure-Python/NumPy fallback in the
modules that consume it; `available()` gates the fast path.

Build with `make -C native` (auto-attempted once on first import).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# MWW_NATIVE_LIB overrides the library path (e.g. a -fsanitize=address build
# for memory-safety verification of the C++ runtime).
_LIB_PATH = os.environ.get(
    "MWW_NATIVE_LIB", os.path.join(_REPO_ROOT, "native", "libmwwnative.so")
)

_lib = None
_load_attempted = False

_i64 = ctypes.c_int64
_i32 = ctypes.c_int32
_f32p = ctypes.POINTER(ctypes.c_float)
_u16p = ctypes.POINTER(ctypes.c_uint16)
_i64p = ctypes.POINTER(ctypes.c_int64)
_i32p = ctypes.POINTER(ctypes.c_int32)


def _try_load():
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.exists(_LIB_PATH):
        try:  # build once if the toolchain is present
            subprocess.run(
                ["make", "-C", os.path.join(_REPO_ROOT, "native")],
                capture_output=True,
                timeout=120,
                check=True,
            )
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.mww_gather_windows.argtypes = [
        _u16p, _i64p, _i64, ctypes.c_int, _i32p, _i32p, _i64, ctypes.c_int,
        ctypes.c_float, _f32p, ctypes.c_int,
    ]
    lib.mww_gather_windows.restype = None
    lib.mww_wav_info.argtypes = [
        ctypes.c_char_p, _i32p, _i32p, _i32p, _i64p, _i32p,
    ]
    lib.mww_wav_info.restype = ctypes.c_int
    lib.mww_wav_read_mono_f32.argtypes = [ctypes.c_char_p, _f32p, _i64]
    lib.mww_wav_read_mono_f32.restype = _i64
    lib.mww_wav_write_16k_i16.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int16), _i64, ctypes.c_int,
    ]
    lib.mww_wav_write_16k_i16.restype = ctypes.c_int
    lib.mww_resample_len.argtypes = [_i64, ctypes.c_int, ctypes.c_int]
    lib.mww_resample_len.restype = _i64
    lib.mww_resample_poly.argtypes = [_f32p, _i64, ctypes.c_int, ctypes.c_int, _f32p]
    lib.mww_resample_poly.restype = None
    lib.mww_remove_silence_f32.argtypes = [
        _f32p, _i64, ctypes.c_int, _i64, ctypes.c_double, _f32p,
    ]
    lib.mww_remove_silence_f32.restype = _i64
    _lib = lib
    return _lib


def available() -> bool:
    return _try_load() is not None


def gather_windows(
    data: np.ndarray,
    offsets: np.ndarray,
    clip_idx: np.ndarray,
    starts: np.ndarray,
    length: int,
    scale: float = 0.0390625,
    n_threads: int = 0,
) -> np.ndarray:
    """Batched fixed-length window gather from a ragged uint16 store.

    data: [total_frames, F] uint16 (may be a np.memmap); offsets: int64
    [n_clips+1]; clip_idx/starts: int32 [B].  Returns [B, length, F] float32
    scaled by `scale`, zero-padded outside each clip.
    """
    lib = _try_load()
    assert lib is not None, "native library unavailable"
    data = np.ascontiguousarray(data, dtype=np.uint16)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    clip_idx = np.ascontiguousarray(clip_idx, dtype=np.int32)
    starts = np.ascontiguousarray(starts, dtype=np.int32)
    batch = len(clip_idx)
    n_feat = int(data.shape[1])
    out = np.empty((batch, length, n_feat), np.float32)
    lib.mww_gather_windows(
        data.ctypes.data_as(_u16p),
        offsets.ctypes.data_as(_i64p),
        _i64(len(offsets) - 1),
        n_feat,
        clip_idx.ctypes.data_as(_i32p),
        starts.ctypes.data_as(_i32p),
        _i64(batch),
        length,
        ctypes.c_float(scale),
        out.ctypes.data_as(_f32p),
        n_threads,
    )
    return out


def wav_read_mono_f32(path: str) -> tuple[np.ndarray, int]:
    """Decodes a WAV file (PCM 8/16/24/32 or float32) to mono float32.

    Returns (samples, sample_rate).  Raises ValueError on unsupported files.
    """
    lib = _try_load()
    assert lib is not None, "native library unavailable"
    rate = _i32(0)
    channels = _i32(0)
    bits = _i32(0)
    n_frames = _i64(0)
    is_float = _i32(0)
    rc = lib.mww_wav_info(
        path.encode(), ctypes.byref(rate), ctypes.byref(channels),
        ctypes.byref(bits), ctypes.byref(n_frames), ctypes.byref(is_float),
    )
    if rc != 0:
        raise ValueError(f"unsupported or unreadable wav: {path} (rc={rc})")
    out = np.empty(n_frames.value, np.float32)
    got = lib.mww_wav_read_mono_f32(path.encode(), out.ctypes.data_as(_f32p), n_frames)
    if got < 0:
        raise ValueError(f"wav decode failed: {path} (rc={got})")
    return out[: int(got)], rate.value


def wav_write_16k_i16(path: str, samples: np.ndarray, rate: int = 16000) -> None:
    lib = _try_load()
    assert lib is not None, "native library unavailable"
    samples = np.ascontiguousarray(samples, dtype=np.int16)
    rc = lib.mww_wav_write_16k_i16(
        path.encode(), samples.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        _i64(len(samples)), rate,
    )
    if rc != 0:
        raise OSError(f"wav write failed: {path}")


def resample_poly(x: np.ndarray, up: int, down: int) -> np.ndarray:
    """Rational resampling with scipy.signal.resample_poly-compatible filter."""
    lib = _try_load()
    assert lib is not None, "native library unavailable"
    x = np.ascontiguousarray(x, dtype=np.float32)
    n_out = lib.mww_resample_len(_i64(len(x)), up, down)
    out = np.empty(int(n_out), np.float32)
    lib.mww_resample_poly(
        x.ctypes.data_as(_f32p), _i64(len(x)), up, down, out.ctypes.data_as(_f32p)
    )
    return out


def remove_silence_f32(
    x: np.ndarray, step: int, min_start: int, threshold_ratio: float
) -> np.ndarray:
    lib = _try_load()
    assert lib is not None, "native library unavailable"
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty(len(x), np.float32)
    n = lib.mww_remove_silence_f32(
        x.ctypes.data_as(_f32p), _i64(len(x)), step, _i64(min_start),
        ctypes.c_double(threshold_ratio), out.ctypes.data_as(_f32p),
    )
    return out[: int(n)].copy()


# ---------------------------------------------------------------------------
# Streaming runtime (native/src/mww_runtime.cc)
# ---------------------------------------------------------------------------


def _runtime_lib():
    lib = _try_load()
    assert lib is not None, "native library unavailable"
    if not hasattr(lib, "_runtime_bound"):
        lib.mww_model_load.argtypes = [ctypes.c_char_p]
        lib.mww_model_load.restype = ctypes.c_void_p
        lib.mww_model_free.argtypes = [ctypes.c_void_p]
        lib.mww_model_stride.argtypes = [ctypes.c_void_p]
        lib.mww_model_stride.restype = ctypes.c_int
        lib.mww_model_input_features.argtypes = [ctypes.c_void_p]
        lib.mww_model_input_features.restype = ctypes.c_int
        lib.mww_model_reset.argtypes = [ctypes.c_void_p]
        lib.mww_model_step.argtypes = [ctypes.c_void_p, _f32p]
        lib.mww_model_step.restype = ctypes.c_float
        lib.mww_model_predict_spectrogram.argtypes = [
            ctypes.c_void_p, _f32p, _i64, _f32p,
        ]
        lib.mww_model_predict_spectrogram.restype = _i64
        lib.mww_frontend_create.argtypes = [ctypes.c_int]
        lib.mww_frontend_create.restype = ctypes.c_void_p
        lib.mww_frontend_free.argtypes = [ctypes.c_void_p]
        lib.mww_frontend_reset.argtypes = [ctypes.c_void_p]
        lib.mww_frontend_process_clip.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int16), _i64, _f32p,
        ]
        lib.mww_frontend_process_clip.restype = _i64
        lib.mww_predict_clip.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int16), _i64, _f32p,
        ]
        lib.mww_predict_clip.restype = _i64
        lib._runtime_bound = True
    return lib


class StreamingRuntime:
    """C++ streaming inference runtime: loads an exported .mww model
    (export/native_runtime.py) and runs PCM or spectrograms through it.

    The native-deployment analogue of the reference's TFLite interpreter
    path (reference inference.py:34-125)."""

    def __init__(self, model_path: str, step_ms: int = 10):
        lib = _runtime_lib()
        self._lib = lib
        self._model = lib.mww_model_load(model_path.encode())
        if not self._model:
            raise ValueError(f"cannot load native model: {model_path}")
        self._frontend = lib.mww_frontend_create(step_ms)
        self.stride = lib.mww_model_stride(self._model)
        self.input_features = lib.mww_model_input_features(self._model)
        self.step_ms = step_ms

    def __del__(self):  # pragma: no cover - destructor timing
        lib = getattr(self, "_lib", None)
        if lib is not None:
            if getattr(self, "_model", None):
                lib.mww_model_free(self._model)
            if getattr(self, "_frontend", None):
                lib.mww_frontend_free(self._frontend)

    def reset(self) -> None:
        self._lib.mww_model_reset(self._model)
        self._lib.mww_frontend_reset(self._frontend)

    def predict_spectrogram(self, spectrogram: np.ndarray) -> np.ndarray:
        """[T, 40] float features -> [T // stride] probabilities."""
        spec = np.ascontiguousarray(spectrogram, dtype=np.float32)
        steps = spec.shape[0] // self.stride
        probs = np.empty(steps, np.float32)
        got = self._lib.mww_model_predict_spectrogram(
            self._model, spec.ctypes.data_as(_f32p), _i64(spec.shape[0]),
            probs.ctypes.data_as(_f32p),
        )
        return probs[: int(got)]

    def predict_clip(self, pcm: np.ndarray) -> np.ndarray:
        """int16 (or float [-1,1]) 16 kHz PCM -> streaming probabilities."""
        if pcm.dtype in (np.float32, np.float64):
            pcm = np.clip(pcm * 32768, -32768, 32767).astype(np.int16)
        pcm = np.ascontiguousarray(pcm, dtype=np.int16)
        hop = 16 * self.step_ms
        n_frames = max(0, 1 + (len(pcm) - 480) // hop)
        probs = np.empty(max(n_frames // self.stride, 1), np.float32)
        got = self._lib.mww_predict_clip(
            self._frontend, self._model,
            pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), _i64(len(pcm)),
            probs.ctypes.data_as(_f32p),
        )
        return probs[: int(got)]

    def process_features(self, pcm: np.ndarray) -> np.ndarray:
        """int16 PCM -> [n_frames, 40] float32 features (native frontend)."""
        pcm = np.ascontiguousarray(pcm, dtype=np.int16)
        hop = 16 * self.step_ms
        n_frames = max(0, 1 + (len(pcm) - 480) // hop)
        out = np.empty((n_frames, 40), np.float32)
        got = self._lib.mww_frontend_process_clip(
            self._frontend,
            pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), _i64(len(pcm)),
            out.ctypes.data_as(_f32p),
        )
        return out[: int(got)]
