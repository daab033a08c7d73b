"""Frontend tests: our NumPy reference vs golden vectors recorded from the
true C microfrontend (TFLM audio_microfrontend op), and internal invariants.

Golden vectors: tests/golden/frontend.npz, written by
scripts/generate_frontend_golden.py.  Tolerances are in uint16 feature units
(1 unit = 0.0390625 float units): broadband agreement is ~1 LSB MAE; sparse
large diffs can occur at the pcan->log zero threshold, so we bound the
fraction of mismatched cells rather than the max.
"""
import os

import numpy as np
import pytest

from microwakeword_tpu.frontend import reference as ref

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "frontend.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


BROADBAND = ["noise_2000", "noise_50", "modulated", "speechish"]


@pytest.mark.parametrize("step_ms", [10, 20])
@pytest.mark.parametrize("name", BROADBAND)
def test_matches_c_frontend_broadband(golden, name, step_ms):
    audio = golden[f"audio_{name}"]
    want = golden[f"feat{step_ms}_{name}"].astype(np.int64)
    fe = ref.MicroFrontend(step_ms=step_ms)
    got = fe.process_clip(audio).astype(np.int64)
    n = min(len(want), len(got))
    assert n > 50
    d = np.abs(got[:n] - want[:n])
    mae = d.mean()
    frac_large = (d > 30).mean()
    assert mae < 4.0, f"MAE {mae} too high vs C frontend"
    assert frac_large < 0.02, f"{frac_large:.3%} cells differ by >30 units"


def test_silence_is_zero(golden):
    audio = golden["audio_silence"]
    fe = ref.MicroFrontend(step_ms=10)
    got = fe.process_clip(audio)
    want = golden["feat10_silence"]
    n = min(len(want), len(got))
    np.testing.assert_array_equal(got[:n], want[:n])


def test_frame_count_formula():
    # n_frames = 1 + (len - 480) // hop  (reference model_train_eval.py:68-84)
    for step_ms in (10, 20):
        hop = 16 * step_ms
        for n in (480, 481, 16000, 47999):
            frames = ref.frame_audio(np.zeros(n, dtype=np.int16), step_ms)
            assert frames.shape[0] == 1 + (n - 480) // hop
    assert ref.frame_audio(np.zeros(400, dtype=np.int16), 10).shape[0] == 0


def test_float_range_and_scale(golden):
    # float = uint16 * 0.0390625, range ~[0, 26] (reference data.py:268-269)
    audio = golden["audio_speechish"]
    feats = ref.generate_features_for_clip(audio.astype(np.int16), step_ms=10)
    assert feats.dtype == np.float32
    assert feats.min() >= 0.0
    assert feats.max() <= 26.0 + 1e-3
    assert feats.max() > 5.0  # non-degenerate


def test_streaming_chunks_match_full_clip(golden):
    # Processing a clip in chunks through the stateful frontend must equal
    # processing it in one call (state carried across calls).
    audio = golden["audio_modulated"]
    fe_full = ref.MicroFrontend(step_ms=10)
    full = fe_full.process_clip(audio)

    fe_chunk = ref.MicroFrontend(step_ms=10)
    outs = []
    hop = 160
    # feed exactly hop-aligned chunks: maintain leftover window context manually
    # by passing growing prefixes frame-by-frame via process_window.
    frames = ref.frame_audio(audio, 10)
    for t in range(frames.shape[0]):
        outs.append(fe_chunk.process_window(frames[t]))
    chunked = np.stack(outs)
    np.testing.assert_array_equal(full, chunked)


def test_mel_matrix_properties():
    m = ref.mel_filterbank_matrix()
    assert m.shape == (257, 40)
    assert (m >= 0).all()
    # Each channel has some support; triangles overlap pairwise.
    assert (m.sum(axis=0) > 0).all()
    # Bins below 125 Hz and above 7500 Hz contribute nothing.
    freqs = np.arange(257) * 16000 / 512
    assert m[freqs <= 125].sum() == 0
    assert m[freqs > 7520].sum() == 0
