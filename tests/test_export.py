"""Export tests: the TF streaming graph and its TFLite conversions must
match the JAX streaming model (BASELINE config[2]: streaming allclose).

TF is heavyweight; these tests are skipped if it's unavailable."""
import os

import jax
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from microwakeword_tpu.export import tflite as EX  # noqa: E402
from microwakeword_tpu.models import build_model  # noqa: E402
from microwakeword_tpu.models.mixednet import MixedNetConfig  # noqa: E402


def make_bundle(**kw):
    base = dict(
        pointwise_filters=(16, 16),
        repeat_in_block=(1, 1),
        mixconv_kernel_sizes=((5,), (3, 7)),
        residual_connection=(False, True),
        first_conv_filters=8,
        first_conv_kernel_size=5,
        stride=3,
        spectrogram_length=47,  # (47-5)//3+1=15; tail=15-(4+6)=5
    )
    base.update(kw)
    cfg = MixedNetConfig(**base)
    bundle = build_model("mixednet", cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    # give batch_stats non-trivial values so BN folding is actually tested
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, cfg.spectrogram_length, 40)) * 20
    _, upd = bundle.forward_train(variables, x)
    variables = dict(variables, batch_stats=upd["batch_stats"])
    return cfg, bundle, variables


@pytest.fixture(scope="module")
def exported():
    cfg, bundle, variables = make_bundle()
    return cfg, bundle, variables


def test_tf_streaming_graph_matches_jax(exported):
    cfg, bundle, variables = exported
    module = EX.build_tf_streaming_mixednet(
        cfg, variables["params"], variables["batch_stats"]
    )
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 26, (1, cfg.spectrogram_length * 3, 40)).astype(np.float32)
    jax_probs = np.asarray(bundle.stream_scan(variables, x)).reshape(-1)
    tf_probs = []
    for i in range(0, x.shape[1], cfg.stride):
        out = module.forward(tf.convert_to_tensor(x[:, i : i + cfg.stride]))
        tf_probs.append(float(np.asarray(out).reshape(-1)[0]))
    np.testing.assert_allclose(tf_probs, jax_probs, atol=2e-5)


def test_tflite_float_matches_jax(exported, tmp_path):
    cfg, bundle, variables = exported
    module = EX.build_tf_streaming_mixednet(
        cfg, variables["params"], variables["batch_stats"]
    )
    path = EX.convert_to_tflite(module, str(tmp_path / "stream.tflite"))
    runner = EX.TFLiteStreamingModel(path, stride=cfg.stride)
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 26, (cfg.spectrogram_length * 3, 40)).astype(np.float32)
    lite = runner.predict_spectrogram(x)
    jax_probs = np.asarray(bundle.stream_scan(variables, x[None])).reshape(-1)
    np.testing.assert_allclose(lite, jax_probs, atol=1e-4)


def test_tflite_int8_close_to_float(exported, tmp_path):
    cfg, bundle, variables = exported
    module = EX.build_tf_streaming_mixednet(
        cfg, variables["params"], variables["batch_stats"]
    )
    rng = np.random.default_rng(2)

    def rep_gen():
        for _ in range(300):
            chunk = rng.uniform(0, 26, (1, cfg.stride, 40)).astype(np.float32)
            chunk[0, 0, 0] = 0.0
            chunk[0, -1, -1] = 26.0
            yield [chunk]

    path = EX.convert_to_tflite(
        module, str(tmp_path / "stream_q.tflite"), quantize=True,
        representative_gen=rep_gen,
    )
    runner = EX.TFLiteStreamingModel(path, stride=cfg.stride)
    assert runner.input_details[0]["dtype"] == np.int8
    assert runner.output_details[0]["dtype"] == np.uint8
    x = rng.uniform(0, 26, (cfg.spectrogram_length * 4, 40)).astype(np.float32)
    lite = runner.predict_spectrogram(x)
    jax_probs = np.asarray(bundle.stream_scan(variables, x[None])).reshape(-1)
    # int8: allow coarse agreement; after warmup the probabilities must
    # track within a few quantization steps.
    warm = len(lite) // 2
    err = np.abs(lite[warm:] - jax_probs[warm:])
    assert err.max() < 0.08, err.max()


def test_tflite_ops_are_tflm_compatible(exported, tmp_path):
    """The exported model must only use ops available in TFLite-Micro
    (ESP32 deployment, reference README.md:31)."""
    cfg, bundle, variables = exported
    module = EX.build_tf_streaming_mixednet(
        cfg, variables["params"], variables["batch_stats"]
    )
    path = EX.convert_to_tflite(module, str(tmp_path / "s.tflite"))
    interp = tf.lite.Interpreter(model_path=path)
    ops = {d["op_name"] for d in interp._get_ops_details()}
    allowed = {
        "CONV_2D", "DEPTHWISE_CONV_2D", "FULLY_CONNECTED", "CONCATENATION",
        "STRIDED_SLICE", "SLICE", "RESHAPE", "ADD", "MUL", "SUB",
        "LOGISTIC", "RELU", "AVERAGE_POOL_2D", "MAX_POOL_2D",
        "VAR_HANDLE", "READ_VARIABLE", "ASSIGN_VARIABLE", "CALL_ONCE",
        "PAD", "TRANSPOSE", "QUANTIZE", "DEQUANTIZE",
    }
    assert ops <= allowed, ops - allowed


# ---------------------------------------------------------------------------
# Inception export
# ---------------------------------------------------------------------------

def make_inception_bundle():
    from microwakeword_tpu.models.inception import InceptionConfig, tail_length

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
    assert tail_length(cfg) > 1
    bundle = build_model("inception", cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, cfg.spectrogram_length, 40)) * 20
    _, upd = bundle.forward_train(variables, x, dropout_rng=jax.random.PRNGKey(2))
    variables = dict(variables, batch_stats=upd["batch_stats"])
    return cfg, bundle, variables


def test_tf_streaming_inception_matches_jax():
    cfg, bundle, variables = make_inception_bundle()
    module = EX.build_tf_streaming_inception(
        cfg, variables["params"], variables["batch_stats"]
    )
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 26, (1, cfg.spectrogram_length * 2, 40)).astype(np.float32)
    jax_probs = np.asarray(bundle.stream_scan(variables, x)).reshape(-1)
    tf_probs = []
    for i in range(x.shape[1]):
        out = module.forward(tf.convert_to_tensor(x[:, i : i + 1]))
        tf_probs.append(float(np.asarray(out).reshape(-1)[0]))
    np.testing.assert_allclose(tf_probs, jax_probs, atol=2e-5)


def test_tflite_inception_float_matches_jax(tmp_path):
    cfg, bundle, variables = make_inception_bundle()
    module = EX.build_tf_streaming_inception(
        cfg, variables["params"], variables["batch_stats"]
    )
    path = EX.convert_to_tflite(module, str(tmp_path / "inc.tflite"))
    runner = EX.TFLiteStreamingModel(path, stride=1)
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 26, (cfg.spectrogram_length * 2, 40)).astype(np.float32)
    lite = runner.predict_spectrogram(x)
    jax_probs = np.asarray(bundle.stream_scan(variables, x[None])).reshape(-1)
    np.testing.assert_allclose(lite, jax_probs, atol=1e-4)


def test_tflite_nonstreaming_matches_jax(exported, tmp_path):
    """Non-streaming TFLite export (reference tflite_non_stream artifact):
    full-window input, slid by stride over a longer track."""
    cfg, bundle, variables = exported
    module = EX.build_tf_streaming_mixednet(
        cfg, variables["params"], variables["batch_stats"], streaming=False
    )
    path = EX.convert_to_tflite(module, str(tmp_path / "non_stream.tflite"))
    runner = EX.TFLiteStreamingModel(path, stride=cfg.stride)
    assert runner.window == cfg.spectrogram_length
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 26, (cfg.spectrogram_length + 4 * cfg.stride, 40)).astype(
        np.float32
    )
    lite = runner.predict_spectrogram(x)
    assert len(lite) == 5  # windows ending at L, L+s, ..., L+4s
    for j in range(5):
        w = x[j * cfg.stride : j * cfg.stride + cfg.spectrogram_length]
        want = float(np.asarray(bundle.forward(variables, w[None])).reshape(-1)[0])
        np.testing.assert_allclose(lite[j], want, atol=1e-4)


def test_tflite_model_accuracy_semantics(exported, tmp_path):
    """tflite_model_accuracy mirrors reference test.py:406-517: last-window
    prediction on testing, 0.5-crossing count with refractory on ambient."""
    from microwakeword_tpu.data.ragged_store import RaggedSpectrogramStore
    from microwakeword_tpu.data.store import FeatureHandler

    cfg, bundle, variables = exported
    rng = np.random.default_rng(3)

    def specs(n, lo, hi):
        return [
            rng.uniform(0, 660, (int(rng.integers(lo, hi)), 40)).astype(np.uint16)
            for _ in range(n)
        ]

    d = tmp_path / "pos" / "testing"
    d.mkdir(parents=True)
    RaggedSpectrogramStore.create(str(d / "w_mmap"), specs(4, 50, 80))
    d = tmp_path / "pos" / "testing_ambient"
    d.mkdir(parents=True)
    RaggedSpectrogramStore.create(str(d / "a_mmap"), specs(2, 200, 300))
    config = {
        "stride": cfg.stride,
        "window_step_ms": 10,
        "spectrogram_length": cfg.spectrogram_length,
        "spectrogram_length_final_layer": 5,
        "batch_size": 8,
        "features": [
            {"features_dir": str(tmp_path / "pos"), "truth": True,
             "sampling_weight": 1.0, "penalty_weight": 1.0,
             "truncation_strategy": "truncate_start", "type": "mmap"},
        ],
    }
    fh = FeatureHandler(config)
    module = EX.build_tf_streaming_mixednet(
        cfg, variables["params"], variables["batch_stats"]
    )
    path = EX.convert_to_tflite(module, str(tmp_path / "s.tflite"))

    m = EX.tflite_model_accuracy(
        path, fh, config, data_set="testing", folder=str(tmp_path / "out")
    )
    assert m["count"] == 4 and np.isfinite(m["accuracy"])
    assert (tmp_path / "out" / "tflite_model_accuracy.txt").exists()

    # hand-check against direct predictions
    x, y, _ = fh.get_data("testing", 8, cfg.spectrogram_length, "truncate_start")
    runner = EX.TFLiteStreamingModel(path, stride=cfg.stride)
    want_tp = 0
    for spec in x:
        runner.reset()
        probs = runner.predict_spectrogram(np.asarray(spec))
        want_tp += int(probs[-1] > 0.5)
    assert m["recall"] == want_tp / 4

    ma = EX.tflite_model_accuracy(
        path, fh, config, data_set="testing_ambient",
        folder=str(tmp_path / "out"), accuracy_name="amb.txt",
    )
    assert "false_accepts_per_hour" in ma and np.isfinite(
        ma["false_accepts_per_hour"]
    )
    assert (tmp_path / "out" / "amb.txt").exists()


def test_manifest_generation(tmp_path):
    """ESPHome manifest v2: cutoff picked at the FAH target, schema complete."""
    import json

    from microwakeword_tpu.export import manifest as M

    tflite = tmp_path / "wake.tflite"
    tflite.write_bytes(b"\0" * 19456)

    # faph falls below 0.5 first at cutoff index 97 on the 101-point grid
    faph = np.linspace(40.0, 0.0, 101)
    assert M.recommended_cutoff({"faph_at_cutoffs": faph}, 0.5) == 0.99
    faph2 = np.zeros(101)
    assert M.recommended_cutoff({"faph_at_cutoffs": faph2}, 0.5) == 0.0
    # nothing meets the target -> strictest cutoff
    assert M.recommended_cutoff({"faph_at_cutoffs": np.full(101, 9.9)}, 0.5) == 1.0

    path = M.write_manifest(
        str(tflite), wake_word="okay nabu", probability_cutoff=0.97,
        sliding_window_size=5, feature_step_size=10,
    )
    with open(path) as f:
        data = json.load(f)
    assert data["type"] == "micro" and data["version"] == 2
    assert data["wake_word"] == "okay nabu"
    assert data["model"] == "wake.tflite"
    micro = data["micro"]
    assert micro["probability_cutoff"] == 0.97
    assert micro["sliding_window_size"] == 5
    assert micro["feature_step_size"] == 10
    assert micro["tensor_arena_size"] >= 19456  # flatbuffer + headroom
    assert micro["tensor_arena_size"] % 1024 == 0
    assert micro["minimum_esphome_version"]


def test_spatial_attention_export_roundtrip(tmp_path):
    """spatial_attention=1, pooled=1 (VERDICT r3 item 7): the TF streaming
    builder implements the CBAM gate with the same newest-frame streaming
    semantics as the flax model, the non-streaming graph matches the flax
    forward, and the int8 TFLite stays within the usual envelope."""
    cfg, bundle, variables = make_bundle(
        spatial_attention=True, pooled=True, max_pool=False,
        residual_connection=(False, False),
    )
    rng = np.random.default_rng(3)

    # streaming graph == flax stream_scan
    module = EX.build_tf_streaming_mixednet(
        cfg, variables["params"], variables["batch_stats"]
    )
    x = rng.uniform(0, 26, (1, cfg.spectrogram_length * 3, 40)).astype(np.float32)
    jax_probs = np.asarray(bundle.stream_scan(variables, x)).reshape(-1)
    tf_probs = []
    for i in range(0, x.shape[1], cfg.stride):
        out = module.forward(tf.convert_to_tensor(x[:, i : i + cfg.stride]))
        tf_probs.append(float(np.asarray(out).reshape(-1)[0]))
    np.testing.assert_allclose(tf_probs, jax_probs, atol=2e-5)

    # non-streaming graph == flax forward
    module_ns = EX.build_tf_streaming_mixednet(
        cfg, variables["params"], variables["batch_stats"], streaming=False
    )
    xw = rng.uniform(0, 26, (1, cfg.spectrogram_length, 40)).astype(np.float32)
    want = float(np.asarray(bundle.forward(variables, xw)).reshape(-1)[0])
    got = float(np.asarray(
        module_ns.forward(tf.convert_to_tensor(xw))
    ).reshape(-1)[0])
    np.testing.assert_allclose(got, want, atol=2e-5)

    # int8 TFLite round-trips within the standard envelope
    path_f = EX.convert_to_tflite(module, str(tmp_path / "attn.tflite"))
    calib = rng.uniform(0, 26, (40, cfg.spectrogram_length, 40))

    def rep():
        for spec in calib:
            for i in range(0, cfg.spectrogram_length - cfg.stride + 1,
                           cfg.stride):
                yield [spec[None, i : i + cfg.stride].astype(np.float32)]

    module_q = EX.build_tf_streaming_mixednet(
        cfg, variables["params"], variables["batch_stats"]
    )
    path_q = EX.convert_to_tflite(
        module_q, str(tmp_path / "attn_q.tflite"), quantize=True,
        representative_gen=rep,
    )
    spec = rng.uniform(0, 26, (cfg.spectrogram_length * 2, 40)).astype(np.float32)
    pf = EX.TFLiteStreamingModel(path_f, stride=cfg.stride).predict_spectrogram(spec)
    pq = EX.TFLiteStreamingModel(path_q, stride=cfg.stride).predict_spectrogram(spec)
    assert np.abs(pq - pf).max() < 0.08

    # streaming attention without pooling stays an explicit error,
    # consistent with the native exporter
    cfg2, bundle2, variables2 = make_bundle(
        spatial_attention=True, pooled=False,
        residual_connection=(False, False),
    )
    with pytest.raises(ValueError, match="pooled=True"):
        EX.build_tf_streaming_mixednet(
            cfg2, variables2["params"], variables2["batch_stats"]
        )
