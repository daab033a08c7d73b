"""Sharded training tests on the 8-virtual-device CPU mesh (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microwakeword_tpu.data import sampler as S
from microwakeword_tpu.models import build_model
from microwakeword_tpu.models.mixednet import MixedNetConfig
from microwakeword_tpu.parallel import create_mesh, make_sharded_train_step, replicate


def synthetic_packed(n_clips=24, length=40):
    rng = np.random.default_rng(0)
    lengths = rng.integers(30, 60, n_clips)
    frames = rng.uniform(0, 660, (int(lengths.sum()), 40)).astype(np.uint16)
    offsets = np.concatenate([[0], np.cumsum(lengths)])[:-1]
    half = n_clips // 2
    return S.PackedTrainingData(
        frames=jnp.asarray(frames),
        clip_offset=jnp.asarray(offsets.astype(np.int32)),
        clip_length=jnp.asarray(lengths.astype(np.int32)),
        provider_logits=jnp.asarray([0.0, 0.0], jnp.float32),
        provider_clip_start=jnp.asarray([0, half], jnp.int32),
        provider_clip_count=jnp.asarray([half, n_clips - half], jnp.int32),
        provider_label=jnp.asarray([1.0, 0.0], jnp.float32),
        provider_penalty=jnp.asarray([1.0, 0.8], jnp.float32),
        provider_strategy=jnp.asarray([1, 0], jnp.int32),
        provider_cutoffs=jnp.zeros((2, S.MAX_CUTOFFS), jnp.int32),
        provider_n_cutoffs=jnp.asarray([1, 1], jnp.int32),
    )


def test_mesh_creation():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"
    mesh = create_mesh()
    assert mesh.shape["data"] == 8


def test_sharded_train_step_runs_and_matches_semantics():
    mesh = create_mesh()
    cfg = MixedNetConfig(
        pointwise_filters=(8,),
        repeat_in_block=(1,),
        mixconv_kernel_sizes=((5,),),
        residual_connection=(False,),
        first_conv_filters=8,
        first_conv_kernel_size=3,
        spectrogram_length=20,
    )
    bundle = build_model("mixednet", cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    packed = synthetic_packed()
    optimizer, step = make_sharded_train_step(bundle, packed, 32, 20, mesh)
    params = replicate(variables["params"], mesh)
    batch_stats = replicate(variables["batch_stats"], mesh)
    opt_state = replicate(optimizer.init(variables["params"]), mesh)

    losses = []
    for i in range(5):
        params, batch_stats, opt_state, metrics = step(
            params,
            batch_stats,
            opt_state,
            jax.random.PRNGKey(i),
            0.01,
            time_mask_max_size=0,
            time_mask_count=0,
            freq_mask_max_size=0,
            freq_mask_count=0,
            positive_class_weight=1.0,
            negative_class_weight=1.0,
        )
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    # params updated
    delta = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), params, variables["params"]
    )
    assert max(jax.tree_util.tree_leaves(delta)) > 0

    # batch not divisible -> clear error
    with pytest.raises(ValueError):
        make_sharded_train_step(bundle, packed, 12, 20, mesh)


def test_sharded_matches_single_device():
    """The DP step must compute the same update as the unsharded step
    (same rng => same batch => same grads, modulo reduction order)."""
    from microwakeword_tpu.train.loop import make_train_step

    mesh = create_mesh()
    cfg = MixedNetConfig(
        pointwise_filters=(8,),
        repeat_in_block=(1,),
        mixconv_kernel_sizes=((3,),),
        residual_connection=(False,),
        first_conv_filters=4,
        first_conv_kernel_size=3,
        spectrogram_length=16,
    )
    bundle = build_model("mixednet", cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    packed = synthetic_packed()

    _, step1 = make_train_step(bundle, packed, 16, 16)
    opt1, _ = make_train_step(bundle, packed, 16, 16)
    o1 = opt1.init(variables["params"])
    p1, bs1, o1, m1 = step1(
        variables["params"], variables["batch_stats"], o1, jax.random.PRNGKey(7),
        learning_rate=0.01, time_mask_max_size=0, time_mask_count=0,
        freq_mask_max_size=0, freq_mask_count=0,
        positive_class_weight=1.0, negative_class_weight=1.0,
    )

    optN, stepN = make_sharded_train_step(bundle, packed, 16, 16, mesh)
    oN = replicate(optN.init(variables["params"]), mesh)
    pN, bsN, oN, mN = stepN(
        replicate(variables["params"], mesh),
        replicate(variables["batch_stats"], mesh),
        oN, jax.random.PRNGKey(7), 0.01,
        time_mask_max_size=0, time_mask_count=0,
        freq_mask_max_size=0, freq_mask_count=0,
        positive_class_weight=1.0, negative_class_weight=1.0,
    )
    np.testing.assert_allclose(float(m1["loss"]), float(mN["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(pN)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_production_train_mesh_matches_single_device(tmp_path):
    """The full production train() (packing, fused step, validation, best
    selection) over the 8-device mesh must match the unsharded run with the
    same seeds (VERDICT r1 item 1)."""
    from tests.test_train import _synthetic_dataset
    from microwakeword_tpu.data.store import FeatureHandler
    from microwakeword_tpu.train import loop as T

    config = _synthetic_dataset(tmp_path, n_train=24)
    config.update(
        {
            "batch_size": 16,
            "spectrogram_length": 25,
            "training_steps": [8],
            "learning_rates": [0.01],
            "eval_step_interval": 4,
            "minimization_metric": "ambient_false_positives_per_hour",
            "maximization_metric": "average_viable_recall",
            "target_minimization": 0.5,
        }
    )
    cfg = MixedNetConfig(
        pointwise_filters=(8,),
        repeat_in_block=(1,),
        mixconv_kernel_sizes=((3,),),
        residual_connection=(False,),
        first_conv_filters=4,
        first_conv_kernel_size=3,
        spectrogram_length=25,
    )
    bundle = build_model("mixednet", cfg)
    fh = FeatureHandler(config)

    config_a = dict(config, train_dir=str(tmp_path / "run_1dev"))
    v1, h1 = T.train(bundle, config_a, fh)
    config_b = dict(config, train_dir=str(tmp_path / "run_dp8"))
    v8, h8 = T.train(bundle, config_b, fh, mesh=create_mesh())

    for a, b in zip(
        jax.tree_util.tree_leaves(v1["params"]),
        jax.tree_util.tree_leaves(v8["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # validation metric math identical too
    assert h1[-1]["validation"].keys() == h8[-1]["validation"].keys()
    np.testing.assert_allclose(
        h1[-1]["validation"]["recall"], h8[-1]["validation"]["recall"], atol=1e-6
    )


def test_auto_mesh_divisibility():
    from microwakeword_tpu.parallel import auto_mesh

    m = auto_mesh(16)
    assert m is not None and m.shape["data"] == 8
    m = auto_mesh(12)  # 8 does not divide 12 -> falls back to 6 devices
    assert m is not None and m.shape["data"] == 6
    assert auto_mesh(1) is None


def test_sharded_streaming_eval_matches_per_track():
    """batched_track_probs (tracks sharded over the mesh) == per-track
    stream_scan, including padding/bucketing edge cases."""
    from microwakeword_tpu.parallel.eval import batched_track_probs

    mesh = create_mesh()
    cfg = MixedNetConfig(
        pointwise_filters=(8, 8),
        repeat_in_block=(1, 1),
        mixconv_kernel_sizes=((3,), (5,)),
        residual_connection=(False, False),
        first_conv_filters=8,
        first_conv_kernel_size=3,
        stride=3,
        spectrogram_length=30,
    )
    bundle = build_model("mixednet", cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    tracks = [
        rng.uniform(0, 26, (t, 40)).astype(np.float32)
        for t in (45, 120, 46, 300, 2)  # mixed buckets; 2 < stride -> empty
    ]
    got = batched_track_probs(bundle, variables, tracks, mesh, bucket_granularity=16)
    for track, g in zip(tracks, got):
        t = track.shape[0] - track.shape[0] % bundle.stride
        if t <= 0:
            assert g.shape == (0,)
            continue
        want = np.asarray(
            bundle.stream_scan(variables, track[None, :t])
        ).reshape(-1)
        np.testing.assert_allclose(g, want, rtol=1e-5, atol=1e-5)


def test_streaming_roc_mesh_matches_serial(tmp_path):
    """streaming_model_roc(mesh=...) reproduces the serial result."""
    from microwakeword_tpu.data.ragged_store import RaggedSpectrogramStore
    from microwakeword_tpu.data.store import FeatureHandler
    from microwakeword_tpu.evaluate.streaming_eval import streaming_model_roc

    rng = np.random.default_rng(1)

    def make(n, positive, lo, hi):
        out = []
        for _ in range(n):
            t = rng.integers(lo, hi)
            s = rng.uniform(0, 80, size=(t, 40))
            if positive:
                s[:, 20:] += 300.0
            else:
                s[:, :20] += 300.0
            out.append(s.astype(np.uint16))
        return out

    d = tmp_path / "pos" / "testing"
    d.mkdir(parents=True)
    RaggedSpectrogramStore.create(str(d / "w_mmap"), make(6, True, 40, 60))
    d = tmp_path / "neg" / "testing_ambient"
    d.mkdir(parents=True)
    RaggedSpectrogramStore.create(str(d / "a_mmap"), make(3, False, 200, 400))

    config = {
        "stride": 1,
        "window_step_ms": 10,
        "spectrogram_length": 30,
        "features": [
            {"features_dir": str(tmp_path / "pos"), "truth": True,
             "sampling_weight": 1.0, "penalty_weight": 1.0,
             "truncation_strategy": "truncate_start", "type": "mmap"},
            {"features_dir": str(tmp_path / "neg"), "truth": False,
             "sampling_weight": 1.0, "penalty_weight": 1.0,
             "truncation_strategy": "random", "type": "mmap"},
        ],
    }
    cfg = MixedNetConfig(
        pointwise_filters=(8, 8),
        repeat_in_block=(1, 1),
        mixconv_kernel_sizes=((3,), (5,)),
        residual_connection=(False, False),
        first_conv_filters=8,
        first_conv_kernel_size=3,
        spectrogram_length=30,
    )
    bundle = build_model("mixednet", cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    fh = FeatureHandler(config)
    serial = streaming_model_roc(bundle, variables, fh, config)
    sharded = streaming_model_roc(
        bundle, variables, fh, config, mesh=create_mesh()
    )
    np.testing.assert_allclose(sharded["auc"], serial["auc"], atol=1e-6)
    np.testing.assert_allclose(
        sharded["faph_at_cutoffs"], serial["faph_at_cutoffs"], atol=1e-6
    )
    np.testing.assert_allclose(
        sharded["frr_at_cutoffs"], serial["frr_at_cutoffs"], atol=1e-6
    )
