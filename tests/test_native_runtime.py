"""C++ streaming runtime (native/src/mww_runtime.cc) parity tests.

Pins the native runtime against the JAX streaming path on randomly
initialized and on trained-ish models, and the native frontend against the
NumPy golden frontend.
"""

import jax
import numpy as np
import pytest

from microwakeword_tpu import native
from microwakeword_tpu.export.native_runtime import export_mixednet
from microwakeword_tpu.frontend import reference as fref
from microwakeword_tpu.models import build_model
from microwakeword_tpu.models.mixednet import MixedNetConfig

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _bundle(cfg):
    bundle = build_model("mixednet", cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    # Perturb batch_stats so BN folding is actually exercised.
    variables["batch_stats"] = jax.tree.map(
        lambda x: x + np.float32(0.05), variables["batch_stats"]
    )
    return bundle, variables


CONFIGS = [
    MixedNetConfig(
        pointwise_filters=(8, 10),
        repeat_in_block=(2, 1),
        mixconv_kernel_sizes=((3,), (5, 7)),
        residual_connection=(True, False),
        first_conv_filters=8,
        first_conv_kernel_size=3,
        stride=2,
        spectrogram_length=40,
    ),
    MixedNetConfig(  # flagship-like: stride 3, no residual, tail window
        pointwise_filters=(16, 16),
        repeat_in_block=(1, 1),
        mixconv_kernel_sizes=((5,), (7, 11)),
        residual_connection=(False, True),
        first_conv_filters=16,
        first_conv_kernel_size=5,
        stride=3,
        spectrogram_length=52,
    ),
    MixedNetConfig(  # pooled tail
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


@pytest.mark.parametrize("cfg", CONFIGS)
def test_native_runtime_matches_stream_scan(tmp_path, cfg):
    bundle, variables = _bundle(cfg)
    path = str(tmp_path / "model.mww")
    export_mixednet(bundle, variables, path)
    rt = native.StreamingRuntime(path)
    assert rt.stride == cfg.stride

    rng = np.random.default_rng(0)
    t = 40 * cfg.stride
    spec = rng.uniform(0, 26, (t, 40)).astype(np.float32)
    want = np.asarray(bundle.stream_scan(variables, spec[None])).reshape(-1)
    got = rt.predict_spectrogram(spec)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    # reset() restores the initial state exactly.
    rt.reset()
    got2 = rt.predict_spectrogram(spec)
    np.testing.assert_array_equal(got, got2)


def test_native_frontend_matches_reference():
    rng = np.random.default_rng(1)
    pcm = rng.integers(-20000, 20000, 16000).astype(np.int16)
    want = fref.generate_features_for_clip(pcm, step_ms=10)
    cfg = CONFIGS[0]
    bundle, variables = _bundle(cfg)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.mww")
        export_mixednet(bundle, variables, path)
        rt = native.StreamingRuntime(path, step_ms=10)
        got = rt.process_features(pcm)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=0.05)


def test_native_predict_clip_end_to_end(tmp_path):
    cfg = CONFIGS[1]
    bundle, variables = _bundle(cfg)
    path = str(tmp_path / "model.mww")
    export_mixednet(bundle, variables, path)
    rt = native.StreamingRuntime(path)
    rng = np.random.default_rng(2)
    pcm = rng.integers(-8000, 8000, 32000).astype(np.int16)
    probs = rt.predict_clip(pcm)
    n_frames = 1 + (32000 - 480) // 160
    assert probs.shape == (n_frames // cfg.stride,)
    assert np.all((probs >= 0) & (probs <= 1))
    # Cross-check against JAX frontend + JAX streaming model.
    feats = fref.generate_features_for_clip(pcm, step_ms=10)
    t = len(feats) - len(feats) % cfg.stride
    want = np.asarray(bundle.stream_scan(variables, feats[None, :t])).reshape(-1)
    np.testing.assert_allclose(probs, want, rtol=2e-3, atol=2e-3)


def test_model_native_backend(tmp_path):
    from microwakeword_tpu.inference import Model

    cfg = CONFIGS[0]
    bundle, variables = _bundle(cfg)
    path = str(tmp_path / "model.mww")
    export_mixednet(bundle, variables, path)
    m_native = Model.from_native(path)
    m_jax = Model.from_jax(bundle, variables)
    rng = np.random.default_rng(3)
    pcm = rng.integers(-8000, 8000, 24000).astype(np.int16)
    a = m_native.predict_clip(pcm)
    b = m_jax.predict_clip(pcm)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_native_runtime_spatial_attention(tmp_path):
    """SPATTN op matches the JAX streaming SpatialAttention gate."""
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
    bundle, variables = _bundle(cfg)
    path = str(tmp_path / "sa.mww")
    from microwakeword_tpu.export.native_runtime import export_model

    export_model(bundle, variables, path)
    rt = native.StreamingRuntime(path)
    rng = np.random.default_rng(3)
    spec = rng.uniform(0, 26, (50, 40)).astype(np.float32)
    want = np.asarray(bundle.stream_scan(variables, spec[None])).reshape(-1)
    got = rt.predict_spectrogram(spec)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_native_runtime_inception(tmp_path):
    """Inception export runs in the C++ runtime with stream parity."""
    from microwakeword_tpu.export.native_runtime import export_model
    from microwakeword_tpu.models.inception import InceptionConfig

    cfg = InceptionConfig(
        cnn1_filters=(8,),
        cnn1_kernel_sizes=(3,),
        cnn1_subspectral_groups=(4,),
        cnn2_filters1=(6, 8),
        cnn2_filters2=(8, 12),
        cnn2_kernel_sizes=(3, 5),
        cnn2_subspectral_groups=(1, 2),
        cnn2_dilation=(1, 2),
        spectrogram_length=60,
    )
    bundle = build_model("inception", cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    variables["batch_stats"] = jax.tree.map(
        lambda x: x + np.float32(0.05), variables["batch_stats"]
    )
    path = str(tmp_path / "inc.mww")
    export_model(bundle, variables, path)
    rt = native.StreamingRuntime(path)
    rng = np.random.default_rng(4)
    spec = rng.uniform(0, 26, (90, 40)).astype(np.float32)
    want = np.asarray(bundle.stream_scan(variables, spec[None])).reshape(-1)
    got = rt.predict_spectrogram(spec)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    rt.reset()
    np.testing.assert_array_equal(got, rt.predict_spectrogram(spec))
