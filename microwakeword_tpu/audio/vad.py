"""Voice-activity-based silence trimming.

The reference uses webrtcvad (C++) at its least aggressive setting to trim
silence during data prep (audio_utils.py:99-140).  That package isn't a
dependency here; this is an adaptive-energy VAD with the same interface and
frame semantics (30 ms frames, always keep the first ``min_start`` samples,
concatenate voiced frames).  Used only in offline data prep.
"""

from __future__ import annotations

import numpy as np


def frame_energies(audio: np.ndarray, step: int) -> np.ndarray:
    n = (len(audio) // step) * step
    if n == 0:
        return np.zeros((0,))
    frames = audio[:n].reshape(-1, step).astype(np.float64)
    return np.sqrt((frames**2).mean(axis=1))


def remove_silence(
    audio_data: np.ndarray,
    frame_duration: float = 0.030,
    sample_rate: int = 16000,
    min_start: int = 2000,
    threshold_ratio: float = 0.1,
) -> np.ndarray:
    """Trims non-voice frames (interface of reference remove_silence_webrtc).

    A frame is voiced if its RMS exceeds max(noise_floor * 4,
    threshold_ratio * 90th-percentile RMS) -- least-aggressive behavior
    comparable to webrtcvad.Vad(0).
    """
    float_type = audio_data.dtype in (np.float32, np.float64)
    audio = (
        audio_data.astype(np.float64)
        if float_type
        else audio_data.astype(np.float64) / 32768.0
    )
    step = int(sample_rate * frame_duration)

    from microwakeword_tpu import native

    if native.available():
        out = native.remove_silence_f32(
            audio.astype(np.float32), step, min_start, threshold_ratio
        )
        if float_type:
            return out.astype(audio_data.dtype)
        return (out.astype(np.float64) * 32768.0).astype(np.int16)
    kept = [audio[:min_start]]
    if len(audio) > min_start + step:
        body = audio[min_start:]
        rms = frame_energies(body, step)
        if rms.size:
            noise_floor = np.percentile(rms, 10)
            thresh = max(noise_floor * 4.0, threshold_ratio * np.percentile(rms, 90))
            for i, r in enumerate(rms):
                if r > thresh:
                    kept.append(body[i * step : (i + 1) * step])
    out = np.concatenate(kept) if kept else audio[:0]
    if float_type:
        return out.astype(audio_data.dtype)
    return (out * 32768.0).astype(np.int16)
