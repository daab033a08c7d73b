"""Full-int8 native runtime (.mww v3, export/native_quant.py +
native/src/mww_runtime.cc quantized ops).

The int8 model must track the float native runtime closely (the reference's
int8-TFLite accuracy claim is "typically no reduction"; our TFLite int8
parity test uses max |dprob| < 0.08 -- the same envelope applies here),
shrink the artifact, and stay deterministic under reset."""

import os

import jax
import numpy as np
import pytest

from microwakeword_tpu import native
from microwakeword_tpu.export.native_runtime import export_model
from microwakeword_tpu.models import build_model
from microwakeword_tpu.models.mixednet import MixedNetConfig

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)

CONFIGS = [
    MixedNetConfig(  # residual + repeats + strided first conv
        pointwise_filters=(8, 10),
        repeat_in_block=(2, 1),
        mixconv_kernel_sizes=((3,), (5, 7)),
        residual_connection=(True, False),
        first_conv_filters=8,
        first_conv_kernel_size=3,
        stride=2,
        spectrogram_length=40,
    ),
    MixedNetConfig(  # flagship-like: stride 3, residual second block
        pointwise_filters=(16, 16),
        repeat_in_block=(1, 1),
        mixconv_kernel_sizes=((5,), (7, 11)),
        residual_connection=(False, True),
        first_conv_filters=16,
        first_conv_kernel_size=5,
        stride=3,
        spectrogram_length=52,
    ),
    MixedNetConfig(  # pooled max tail
        pointwise_filters=(8,),
        repeat_in_block=(1,),
        mixconv_kernel_sizes=((5,),),
        residual_connection=(False,),
        first_conv_filters=8,
        first_conv_kernel_size=3,
        stride=1,
        pooled=True,
        max_pool=True,
        spectrogram_length=30,
    ),
]


def _trained_ish(cfg):
    """Random init + one grad-free BN pass so batch_stats are non-trivial
    and activations have realistic scale structure."""
    bundle = build_model("mixednet", cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (32, cfg.spectrogram_length, 40)
    ) * 20
    _, upd = bundle.forward_train(variables, x)
    return bundle, dict(variables, batch_stats=upd["batch_stats"])


@pytest.mark.parametrize("cfg", CONFIGS)
def test_int8_tracks_float_runtime(tmp_path, cfg):
    bundle, variables = _trained_ish(cfg)
    rng = np.random.default_rng(0)
    calib = rng.uniform(0, 26, (64, cfg.spectrogram_length, 40))

    f32_path = str(tmp_path / "model.mww")
    i8_path = str(tmp_path / "model_quant.mww")
    export_model(bundle, variables, f32_path)
    export_model(bundle, variables, i8_path, quantize=True, calibration=calib)

    # int8 weights + quant params shrink the artifact substantially
    assert os.path.getsize(i8_path) < 0.6 * os.path.getsize(f32_path)

    rt_f = native.StreamingRuntime(f32_path)
    rt_q = native.StreamingRuntime(i8_path)
    assert rt_q.stride == cfg.stride

    spec = rng.uniform(0, 26, (40 * cfg.stride, 40)).astype(np.float32)
    pf = rt_f.predict_spectrogram(spec)
    pq = rt_q.predict_spectrogram(spec)
    assert pq.shape == pf.shape
    # same envelope as the TFLite int8 parity test (tests/test_export.py)
    assert np.abs(pq - pf).max() < 0.08

    # quantized ring-buffer state resets exactly
    rt_q.reset()
    np.testing.assert_array_equal(pq, rt_q.predict_spectrogram(spec))


def test_int8_preserves_detections(tmp_path):
    """On a separable task-shaped input, the int8 model makes the same
    accept/reject decisions as the float model at cutoff 0.5."""
    cfg = CONFIGS[1]
    bundle, variables = _trained_ish(cfg)
    rng = np.random.default_rng(2)
    calib = rng.uniform(0, 26, (64, cfg.spectrogram_length, 40))
    i8_path = str(tmp_path / "q.mww")
    f32_path = str(tmp_path / "f.mww")
    export_model(bundle, variables, f32_path)
    export_model(bundle, variables, i8_path, quantize=True, calibration=calib)
    rt_f = native.StreamingRuntime(f32_path)
    rt_q = native.StreamingRuntime(i8_path)
    spec = rng.uniform(0, 26, (120 * cfg.stride, 40)).astype(np.float32)
    pf = rt_f.predict_spectrogram(spec)
    pq = rt_q.predict_spectrogram(spec)
    # decisions may only differ where the float prob is within the int8
    # error envelope of the cutoff
    differs = (pf > 0.5) != (pq > 0.5)
    assert np.all(np.abs(pf[differs] - 0.5) < 0.08)


def test_int8_inception_tracks_float_runtime(tmp_path):
    from microwakeword_tpu.models.inception import InceptionConfig

    cfg = InceptionConfig(
        cnn1_filters=(8,),
        cnn1_kernel_sizes=(3,),
        cnn1_subspectral_groups=(2,),
        cnn2_filters1=(6, 8),
        cnn2_filters2=(10, 12),
        cnn2_kernel_sizes=(3, 5),
        cnn2_subspectral_groups=(1, 2),
        cnn2_dilation=(1, 2),
        spectrogram_length=60,
    )
    bundle = build_model("inception", cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (16, cfg.spectrogram_length, 40)
    ) * 20
    _, upd = bundle.forward_train(
        variables, x, dropout_rng=jax.random.PRNGKey(2)
    )
    variables = dict(variables, batch_stats=upd["batch_stats"])
    rng = np.random.default_rng(0)
    calib = rng.uniform(0, 26, (64, cfg.spectrogram_length, 40))
    f32_path = str(tmp_path / "inc.mww")
    i8_path = str(tmp_path / "inc_q.mww")
    export_model(bundle, variables, f32_path)
    export_model(bundle, variables, i8_path, quantize=True, calibration=calib)
    assert os.path.getsize(i8_path) < 0.6 * os.path.getsize(f32_path)
    rt_f = native.StreamingRuntime(f32_path)
    rt_q = native.StreamingRuntime(i8_path)
    spec = rng.uniform(0, 26, (cfg.spectrogram_length * 3, 40)).astype(
        np.float32
    )
    pf = rt_f.predict_spectrogram(spec)
    pq = rt_q.predict_spectrogram(spec)
    assert np.abs(pq - pf).max() < 0.08
    rt_q.reset()
    np.testing.assert_array_equal(pq, rt_q.predict_spectrogram(spec))


def test_int8_rejects_unsupported_configs(tmp_path):
    cfg = MixedNetConfig(
        pointwise_filters=(8,),
        repeat_in_block=(1,),
        mixconv_kernel_sizes=((5,),),
        residual_connection=(False,),
        first_conv_filters=8,
        first_conv_kernel_size=3,
        stride=1,
        pooled=True,
        spatial_attention=True,
        spectrogram_length=30,
    )
    bundle, variables = _trained_ish(cfg)
    with pytest.raises(ValueError, match="spatial_attention"):
        export_model(
            bundle, variables, str(tmp_path / "x.mww"), quantize=True
        )
