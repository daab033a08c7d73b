"""Inference API tests: predict_clip / predict_spectrogram on both backends."""
import jax
import numpy as np
import pytest

from microwakeword_tpu.inference import Model
from microwakeword_tpu.models import build_model
from microwakeword_tpu.models.mixednet import MixedNetConfig


@pytest.fixture(scope="module")
def small():
    cfg = MixedNetConfig(
        pointwise_filters=(8,),
        repeat_in_block=(1,),
        mixconv_kernel_sizes=((5,),),
        residual_connection=(False,),
        first_conv_filters=8,
        first_conv_kernel_size=3,
        stride=3,
        spectrogram_length=24,
    )
    bundle = build_model("mixednet", cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    return cfg, bundle, variables


def test_predict_clip_jax(small):
    cfg, bundle, variables = small
    model = Model.from_jax(bundle, variables)
    rng = np.random.default_rng(0)
    audio = rng.integers(-8000, 8000, 32000).astype(np.int16)  # 2 s
    probs = model.predict_clip(audio, step_ms=10)
    # 2 s -> 198 frames -> 66 steps at stride 3
    assert probs.shape == (66,)
    assert ((probs >= 0) & (probs <= 1)).all()
    # float audio path gives identical results
    probs_f = model.predict_clip(audio.astype(np.float32) / 32768.0)
    np.testing.assert_allclose(probs, probs_f, atol=1e-6)


def test_predict_spectrogram_matches_stream_scan(small):
    cfg, bundle, variables = small
    model = Model.from_jax(bundle, variables)
    rng = np.random.default_rng(1)
    spec = rng.uniform(0, 26, (60, 40)).astype(np.float32)
    probs = model.predict_spectrogram(spec)
    want = np.asarray(bundle.stream_scan(variables, spec[None])).reshape(-1)
    np.testing.assert_allclose(probs, want, atol=1e-6)


def test_tflite_backend_agrees(small, tmp_path):
    tf = pytest.importorskip("tensorflow")
    from microwakeword_tpu.export import tflite as EX

    cfg, bundle, variables = small
    module = EX.build_tf_streaming_mixednet(
        cfg, variables["params"], variables["batch_stats"]
    )
    path = EX.convert_to_tflite(module, str(tmp_path / "s.tflite"))
    jax_model = Model.from_jax(bundle, variables)
    lite_model = Model.from_tflite(path, stride=cfg.stride)
    rng = np.random.default_rng(2)
    spec = rng.uniform(0, 26, (48, 40)).astype(np.float32)
    np.testing.assert_allclose(
        lite_model.predict_spectrogram(spec),
        jax_model.predict_spectrogram(spec),
        atol=1e-4,
    )
