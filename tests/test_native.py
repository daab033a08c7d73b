"""Native library (native/libmwwnative.so) vs the NumPy/SciPy references.

The native layer implements the host-runtime equivalents of the reference's
external C/C++ deps (SURVEY.md §2.2).  Each test pins the C implementation
against the pure-Python implementation it accelerates.
"""

import numpy as np
import pytest
from scipy.io import wavfile
from scipy.signal import resample_poly

from microwakeword_tpu import native
from microwakeword_tpu.audio import vad

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_gather_windows_matches_numpy():
    rng = np.random.default_rng(0)
    lengths = [7, 30, 12, 55]
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)
    data = rng.integers(0, 660, (offsets[-1], 40)).astype(np.uint16)
    clip_idx = np.array([0, 1, 2, 3, 1], np.int32)
    starts = np.array([0, -3, 5, 40, 10], np.int32)  # left pad / mid / overrun
    L = 20
    got = native.gather_windows(data, offsets, clip_idx, starts, L)
    scale = np.float32(0.0390625)
    for b, (ci, st) in enumerate(zip(clip_idx, starts)):
        clip = data[offsets[ci] : offsets[ci + 1]].astype(np.float32) * scale
        want = np.zeros((L, 40), np.float32)
        for r in range(L):
            src = st + r
            if 0 <= src < len(clip):
                want[r] = clip[src]
        np.testing.assert_allclose(got[b], want, rtol=1e-6)


def test_gather_windows_threaded_matches_serial():
    rng = np.random.default_rng(1)
    lengths = rng.integers(10, 60, 100)
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)
    data = rng.integers(0, 660, (offsets[-1], 40)).astype(np.uint16)
    clip_idx = rng.integers(0, 100, 512).astype(np.int32)
    starts = rng.integers(-5, 50, 512).astype(np.int32)
    a = native.gather_windows(data, offsets, clip_idx, starts, 30, n_threads=1)
    b = native.gather_windows(data, offsets, clip_idx, starts, 30, n_threads=8)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("dtype", ["int16", "int32", "float32"])
def test_wav_roundtrip(tmp_path, dtype):
    rng = np.random.default_rng(2)
    path = str(tmp_path / f"t_{dtype}.wav")
    x = rng.uniform(-0.8, 0.8, 4000).astype(np.float32)
    if dtype == "int16":
        wavfile.write(path, 16000, (x * 32767).astype(np.int16))
        tol = 1e-4
    elif dtype == "int32":
        wavfile.write(path, 16000, (x * 2147483647).astype(np.int32))
        tol = 1e-6
    else:
        wavfile.write(path, 16000, x)
        tol = 1e-7
    got, rate = native.wav_read_mono_f32(path)
    assert rate == 16000 and len(got) == 4000
    np.testing.assert_allclose(got, x, atol=tol)


def test_wav_stereo_monomix(tmp_path):
    rng = np.random.default_rng(3)
    stereo = rng.uniform(-0.5, 0.5, (1000, 2)).astype(np.float32)
    path = str(tmp_path / "stereo.wav")
    wavfile.write(path, 22050, (stereo * 32767).astype(np.int16))
    got, rate = native.wav_read_mono_f32(path)
    assert rate == 22050
    want = (stereo * 32767).astype(np.int16).astype(np.float32).mean(1) / 32768.0
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_wav_write_reads_back(tmp_path):
    rng = np.random.default_rng(4)
    samples = rng.integers(-30000, 30000, 2000).astype(np.int16)
    path = str(tmp_path / "w.wav")
    native.wav_write_16k_i16(path, samples)
    rate, back = wavfile.read(path)
    assert rate == 16000
    np.testing.assert_array_equal(back, samples)


@pytest.mark.parametrize("up,down", [(2, 1), (1, 2), (160, 441), (320, 147)])
def test_resample_matches_scipy(up, down):
    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, 4410).astype(np.float32)
    want = resample_poly(x.astype(np.float64), up, down)
    got = native.resample_poly(x, up, down)
    assert len(got) == len(want)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_remove_silence_matches_python(monkeypatch):
    rng = np.random.default_rng(6)
    audio = np.concatenate(
        [
            rng.uniform(-0.01, 0.01, 8000),  # quiet
            rng.uniform(-0.8, 0.8, 8000),  # loud
            rng.uniform(-0.005, 0.005, 8000),  # quiet
        ]
    ).astype(np.float32)
    # vad.remove_silence routes to native when available; force the pure
    # NumPy path for the golden value.
    monkeypatch.setattr(native, "available", lambda: False)
    want = vad.remove_silence(audio)
    monkeypatch.undo()
    got = native.remove_silence_f32(audio, step=480, min_start=2000, threshold_ratio=0.1)
    assert len(got) == len(want)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_gather_mode_matches_feature_generator(tmp_path):
    from microwakeword_tpu.data.ragged_store import RaggedSpectrogramStore
    from microwakeword_tpu.data.store import MmapFeatureSet

    rng = np.random.default_rng(7)
    specs = [
        rng.integers(0, 660, (n, 40)).astype(np.uint16)
        for n in [12, 35, 60, 8, 200]
    ]
    for mode in ("validation", "validation_ambient"):
        d = tmp_path / mode
        d.mkdir(parents=True)
        RaggedSpectrogramStore.create(str(d / "x_mmap"), specs)

    for strategy, mode in [
        ("truncate_start", "validation"),
        ("truncate_end", "validation"),
        ("fixed_right_cutoff", "validation"),
        ("split", "validation_ambient"),
    ]:
        fs = MmapFeatureSet(
            str(tmp_path), True, 1.0, 1.0, strategy,
            stride=3, step_ms=10, fixed_right_cutoffs=[0, 2],
        )
        want = list(fs.feature_generator(mode, 25, strategy))
        got = fs.gather_mode(mode, 25, strategy)
        assert got is not None
        assert len(got) == len(want), (strategy, len(got), len(want))
        np.testing.assert_allclose(got, np.stack(want), rtol=1e-6, atol=1e-6)
