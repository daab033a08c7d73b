"""StableHLO deployment artifacts (.mwwx, export/stablehlo.py): the
serialized pure functions must reproduce the live bundle exactly, for both
model families, through the same inference API the other backends use."""
import jax
import numpy as np
import pytest

from microwakeword_tpu.export import stablehlo as SH
from microwakeword_tpu.inference import Model
from microwakeword_tpu.models import build_model
from microwakeword_tpu.models.inception import InceptionConfig
from microwakeword_tpu.models.mixednet import MixedNetConfig


def make_mixednet():
    cfg = MixedNetConfig(
        pointwise_filters=(16, 16),
        repeat_in_block=(1, 1),
        mixconv_kernel_sizes=((5,), (3, 7)),
        residual_connection=(False, True),
        first_conv_filters=8,
        first_conv_kernel_size=5,
        stride=3,
        spectrogram_length=47,
    )
    bundle = build_model("mixednet", cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (16, cfg.spectrogram_length, 40)
    ) * 20
    _, upd = bundle.forward_train(variables, x)
    return bundle, dict(variables, batch_stats=upd["batch_stats"])


def make_inception():
    cfg = InceptionConfig(
        cnn1_filters=(8,),
        cnn1_kernel_sizes=(3,),
        cnn2_filters1=(6,),
        cnn2_filters2=(8,),
        cnn2_kernel_sizes=(3,),
        cnn2_dilation=(1,),
        spectrogram_length=32,
    )
    bundle = build_model("inception", cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    return bundle, variables


@pytest.mark.parametrize("family", ["mixednet", "inception"])
def test_roundtrip_matches_bundle(family, tmp_path):
    bundle, variables = (
        make_mixednet() if family == "mixednet" else make_inception()
    )
    path = str(tmp_path / f"{family}.mwwx")
    SH.export_streaming(bundle, variables, path)
    loaded = SH.StableHLOModel(path)
    assert loaded.meta["model"] == family
    assert loaded.stride == bundle.stride

    rng = np.random.default_rng(0)
    # forward at two batch sizes exercises the symbolic batch dimension
    for b in (1, 5):
        x = rng.uniform(0, 26, (b, bundle.spectrogram_length, 40)).astype(
            np.float32
        )
        np.testing.assert_allclose(
            np.asarray(loaded.forward(x)),
            np.asarray(bundle.forward(variables, x)),
            atol=1e-6,
        )

    # streamed scan through the artifact == live stream_scan
    t = bundle.spectrogram_length * 2
    spec = rng.uniform(0, 26, (t, 40)).astype(np.float32)
    steps = t // bundle.stride
    want = np.asarray(
        bundle.stream_scan(variables, spec[None, : steps * bundle.stride])
    ).reshape(-1)
    got = loaded.predict_spectrogram(spec)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_inference_model_backend(tmp_path):
    bundle, variables = make_mixednet()
    path = str(tmp_path / "m.mwwx")
    SH.export_streaming(bundle, variables, path)
    model = Model.from_stablehlo(path)
    rng = np.random.default_rng(1)
    spec = rng.uniform(0, 26, (60, 40)).astype(np.float32)
    ref = Model.from_jax(bundle, variables)
    np.testing.assert_allclose(
        model.predict_spectrogram(spec),
        ref.predict_spectrogram(spec),
        atol=1e-6,
    )


def test_roundtrip_spatial_attention(tmp_path):
    """spatial_attention=1, pooled=1 exports to .mwwx and the artifact's
    forward/stream functions match the live bundle (the flax streaming
    semantics -- newest-frame gating -- carry through serialization)."""
    cfg = MixedNetConfig(
        pointwise_filters=(12,),
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
    bundle = build_model("mixednet", cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "attn.mwwx")
    SH.export_streaming(bundle, variables, path)
    loaded = SH.StableHLOModel(path)

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 26, (2, cfg.spectrogram_length, 40)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(loaded.forward(x)),
        np.asarray(bundle.forward(variables, x)),
        atol=1e-6,
    )
    spec = rng.uniform(0, 26, (60, 40)).astype(np.float32)
    want = np.asarray(bundle.stream_scan(variables, spec[None])).reshape(-1)
    np.testing.assert_allclose(loaded.predict_spectrogram(spec), want,
                               atol=1e-6)
