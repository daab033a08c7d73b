"""Fused Pallas frontend kernel vs the XLA pipeline.

Runs the Mosaic interpreter on CPU (tests/conftest.py forces the cpu
backend) with a small time-tile so the cross-tile noise-EMA carry, batch
grid, and both hop sizes are exercised; the math is identical so agreement
is exact.  On TPU hardware the kernel compiles to a single fused program
(frontend/pallas.py docstring).
"""

import numpy as np
import pytest

from microwakeword_tpu.frontend import pallas as fp
from microwakeword_tpu.frontend import xla as fx


@pytest.mark.parametrize(
    "step_ms,shape,t_tile",
    [
        (10, (1, 480 + 160 * 15), 16),  # exactly one tile
        (10, (2, 480 + 160 * 40), 16),  # multi-tile carry + batch + ragged tail
        (20, (2, 480 + 320 * 21), 8),  # 20 ms hop (2-part DFT decomposition)
        (10, (1, 500), 8),  # single hop
    ],
)
def test_pallas_frontend_matches_xla(step_ms, shape, t_tile):
    rng = np.random.default_rng(0)
    audio = rng.integers(-25000, 25000, shape).astype(np.int16)
    want = np.asarray(fx.frontend_batch(audio, step_ms=step_ms))
    got = np.asarray(
        fp.frontend_batch(audio, step_ms=step_ms, interpret=True, t_tile=t_tile)
    )
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_pallas_frontend_float_input():
    rng = np.random.default_rng(1)
    audio = rng.uniform(-0.9, 0.9, (1, 8000)).astype(np.float32)
    want = np.asarray(fx.frontend_batch(audio))
    got = np.asarray(fp.frontend_batch(audio, interpret=True, t_tile=16))
    np.testing.assert_array_equal(got, want)


def test_pallas_frontend_short_audio():
    audio = np.zeros((2, 100), np.int16)  # < one window
    got = np.asarray(fp.frontend_batch(audio, interpret=True, t_tile=8))
    assert got.shape == (2, 0, 40)
