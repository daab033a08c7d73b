"""Data layer tests: ragged store round-trip, FeatureHandler semantics,
and the on-device sampler's mechanics vs the host (reference) semantics."""
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microwakeword_tpu.data.ragged_store import RaggedSpectrogramStore
from microwakeword_tpu.data.store import (
    FeatureHandler,
    fixed_length_spectrogram,
    spec_augment,
)
from microwakeword_tpu.data import sampler as S


def make_specs(rng, n, min_len=5, max_len=60):
    return [
        (rng.uniform(0, 660, size=(rng.integers(min_len, max_len), 40))).astype(
            np.uint16
        )
        for _ in range(n)
    ]


@pytest.fixture()
def dataset_dir(tmp_path):
    """Two feature sets (positive wakeword / negative ambient) with stores."""
    rng = np.random.default_rng(0)
    pos = tmp_path / "pos"
    neg = tmp_path / "neg"
    specs = {}
    for root, n, min_len, max_len in [
        (pos / "training", 20, 30, 70),
        (pos / "validation", 6, 30, 70),
        (pos / "testing", 6, 30, 70),
        (neg / "training", 15, 10, 40),
        (neg / "validation", 5, 10, 40),
        (neg / "validation_ambient", 2, 400, 500),
        (neg / "testing_ambient", 2, 400, 500),
    ]:
        root.mkdir(parents=True, exist_ok=True)
        s = make_specs(rng, n, min_len, max_len)
        RaggedSpectrogramStore.create(str(root / "wakeword_mmap"), s)
        specs[str(root)] = s
    config = {
        "stride": 1,
        "window_step_ms": 10,
        "features": [
            {
                "features_dir": str(pos),
                "truth": True,
                "sampling_weight": 2.0,
                "penalty_weight": 1.0,
                "truncation_strategy": "truncate_start",
                "type": "mmap",
            },
            {
                "features_dir": str(neg),
                "truth": False,
                "sampling_weight": 1.0,
                "penalty_weight": 0.8,
                "truncation_strategy": "random",
                "type": "mmap",
            },
        ],
    }
    return config, specs


def test_ragged_store_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    specs = make_specs(rng, 7)
    store = RaggedSpectrogramStore.create(str(tmp_path / "x_mmap"), specs)
    assert len(store) == 7
    for i, s in enumerate(specs):
        np.testing.assert_array_equal(store[i], s)
    reopened = RaggedSpectrogramStore(str(tmp_path / "x_mmap"))
    np.testing.assert_array_equal(reopened[3], specs[3])
    assert reopened.total_frames == sum(s.shape[0] for s in specs)


def test_fixed_length_strategies():
    spec = np.arange(50 * 40, dtype=np.float32).reshape(50, 40)
    out = fixed_length_spectrogram(spec, 20, "truncate_start")
    np.testing.assert_array_equal(out, spec[30:])
    out = fixed_length_spectrogram(spec, 20, "truncate_end")
    np.testing.assert_array_equal(out, spec[:20])
    out = fixed_length_spectrogram(spec, 20, "fixed_right_cutoff", right_cutoff=5)
    np.testing.assert_array_equal(out, spec[25:45])
    out = fixed_length_spectrogram(spec, 60, "random")
    assert out.shape == (60, 40)
    np.testing.assert_array_equal(out[:10], 0)  # left zero pad
    np.testing.assert_array_equal(out[10:], spec)
    out = fixed_length_spectrogram(spec, 20, "none")
    assert out.shape == (50, 40)
    rng = np.random.default_rng(0)
    for _ in range(10):
        out = fixed_length_spectrogram(spec, 20, "random", rng=rng)
        assert out.shape == (20, 40)
        # window is a contiguous slice
        start = int(out[0, 0] // 40)
        np.testing.assert_array_equal(out, spec[start : start + 20])


def test_spec_augment_masks():
    rng = np.random.default_rng(2)
    spec = np.ones((30, 40), np.float32)
    out = spec_augment(spec, 10, 2, 10, 2, rng)
    assert out.shape == spec.shape
    assert (out == 0).any()
    # zeros form full rows / columns only
    zero_rows = (out == 0).all(axis=1)
    zero_cols = (out == 0).all(axis=0)
    mixed = (out == 0) & ~zero_rows[:, None] & ~zero_cols[None, :]
    assert not mixed.any()


def test_feature_handler_modes(dataset_dir):
    config, _ = dataset_dir
    fh = FeatureHandler(config)
    assert fh.get_mode_size("training") == 35
    assert fh.get_mode_size("validation") == 11
    assert fh.get_mode_size("validation_ambient") == 2
    assert fh.get_mode_duration("validation_ambient") > 0
    x, y, w = fh.get_data("training", batch_size=32, features_length=30)
    assert x.shape == (32, 30, 40) and y.shape == (32,) and w.shape == (32,)
    assert set(np.unique(y)) <= {0.0, 1.0}
    assert x.max() <= 26.0 and x.min() >= 0.0
    # validation covers every spectrogram once
    x, y, w = fh.get_data("validation", batch_size=0, features_length=30,
                          truncation_strategy="truncate_start")
    assert x.shape[0] == 11
    # ambient split windows advance int(1000*step_s*stride) slices
    x, y, w = fh.get_data("validation_ambient", batch_size=0, features_length=30,
                          truncation_strategy="split")
    assert x.shape[0] > 50
    assert (y == 0).all()
    # "none" returns ragged list
    x, y, w = fh.get_data("testing_ambient", batch_size=0, features_length=30,
                          truncation_strategy="none")
    assert isinstance(x, list) and x[0].shape[1] == 40


def test_device_sampler(dataset_dir):
    config, _ = dataset_dir
    fh = FeatureHandler(config)
    packed = fh.pack_training()
    assert packed.frames.shape[1] == 40
    sample = jax.jit(
        functools.partial(S.sample_batch, batch_size=64, features_length=30,
                          time_mask_max_size=5, time_mask_count=2,
                          freq_mask_max_size=5, freq_mask_count=2)
    )
    feats, labels, weights = sample(packed, jax.random.PRNGKey(0))
    assert feats.shape == (64, 30, 40)
    assert float(feats.max()) <= 26.0 and float(feats.min()) >= 0.0
    # labels/weights consistent with provider definitions
    labels = np.asarray(labels)
    weights = np.asarray(weights)
    assert set(np.unique(labels)) <= {0.0, 1.0}
    np.testing.assert_allclose(weights[labels == 1], 1.0)
    np.testing.assert_allclose(weights[labels == 0], 0.8, rtol=1e-6)
    # sampling weights respected within statistical tolerance (2:1)
    counts = [int((labels == v).sum()) for v in (1.0, 0.0)]
    many = np.concatenate(
        [
            np.asarray(sample(packed, jax.random.PRNGKey(k))[1])
            for k in range(20)
        ]
    )
    frac_pos = (many == 1.0).mean()
    assert 0.56 < frac_pos < 0.77, frac_pos  # expect 2/3

    # windows must be genuine slices of stored clips: check feature values
    # exist in the packed frame array (scaled); sample w/o SpecAugment
    feats_na, _, _ = S.sample_batch(packed, jax.random.PRNGKey(3), 4, 30)
    f0 = np.asarray(feats_na[0])
    nonzero = f0[(f0 != 0).any(axis=1)]
    allframes = np.asarray(packed.frames, dtype=np.float32) * 0.0390625
    # each sampled frame appears in the corpus
    row = nonzero[len(nonzero) // 2]
    dists = np.abs(allframes - row[None, :]).sum(axis=1)
    assert dists.min() < 1e-4


def test_device_sampler_short_clip_padding(tmp_path):
    """Clips shorter than features_length are right-aligned, left-zero-padded."""
    spec = (np.ones((7, 40)) * 100).astype(np.uint16)
    root = tmp_path / "p" / "training"
    root.mkdir(parents=True)
    RaggedSpectrogramStore.create(str(root / "s_mmap"), [spec])
    config = {
        "stride": 1,
        "window_step_ms": 10,
        "features": [
            {
                "features_dir": str(tmp_path / "p"),
                "truth": True,
                "sampling_weight": 1.0,
                "penalty_weight": 1.0,
                "truncation_strategy": "truncate_start",
                "type": "mmap",
            }
        ],
    }
    fh = FeatureHandler(config)
    packed = fh.pack_training()
    feats, _, _ = S.sample_batch(packed, jax.random.PRNGKey(0), 4, 12)
    feats = np.asarray(feats)
    np.testing.assert_allclose(feats[:, :5], 0.0)
    np.testing.assert_allclose(feats[:, 5:], 100 * 0.0390625, rtol=1e-5)


def test_pack_training_data_host_sharding(tmp_path):
    """Shards partition the clips disjointly and preserve per-clip content."""
    import numpy as np

    from microwakeword_tpu.data import sampler as S
    from microwakeword_tpu.data.ragged_store import RaggedSpectrogramStore
    from microwakeword_tpu.data.store import FeatureHandler

    rng = np.random.default_rng(0)
    specs = [rng.integers(0, 660, (n, 40)).astype(np.uint16) for n in range(10, 21)]
    d = tmp_path / "pos" / "training"
    d.mkdir(parents=True)
    RaggedSpectrogramStore.create(str(d / "w_mmap"), specs)
    config = {
        "features": [
            {"features_dir": str(tmp_path / "pos"), "truth": True,
             "sampling_weight": 1.0, "penalty_weight": 1.0,
             "truncation_strategy": "random", "type": "mmap"},
        ]
    }
    fh = FeatureHandler(config)
    full = fh.pack_training(0, 1)
    shards = [fh.pack_training(i, 3) for i in range(3)]
    # Disjoint cover: shard i holds clips i, i+3, ...
    total = sum(int(s.clip_length.shape[0]) for s in shards)
    assert total == len(specs) == int(full.clip_length.shape[0])
    for i, s in enumerate(shards):
        want_clips = specs[i::3]
        assert list(np.asarray(s.clip_length)) == [c.shape[0] for c in want_clips]
        frames = np.asarray(s.frames)
        offs = np.asarray(s.clip_offset)
        for j, clip in enumerate(want_clips):
            np.testing.assert_array_equal(
                frames[offs[j] : offs[j] + clip.shape[0]], clip
            )


def test_clips_feature_set(tmp_path):
    """'clips'-type feature sets generate augmented spectrograms on the fly
    (reference ClipsHandlerWrapperGenerator, data.py:324-402) and pack a
    materialized pool for the on-device sampler."""
    from microwakeword_tpu.audio.io import save_clip

    rng = np.random.default_rng(0)
    audio_dir = tmp_path / "clips"
    audio_dir.mkdir()
    t = np.arange(16000)
    for i in range(4):
        tone = (0.3 * np.sin(2 * np.pi * (300 + 80 * i) * t / 16000)).astype(
            np.float32
        )
        save_clip(tone, str(audio_dir / f"c{i}.wav"))

    config = {
        "stride": 1,
        "window_step_ms": 10,
        "features": [
            {
                "type": "clips",
                "truth": True,
                "sampling_weight": 1.0,
                "penalty_weight": 1.0,
                "truncation_strategy": "truncate_start",
                "pack_pool_size": 6,
                "clips_settings": {
                    "input_directory": str(audio_dir),
                    "file_pattern": "*.wav",
                },
                "augmentation_settings": {
                    "augmentation_duration_s": 1.2,
                    "augmentation_probabilities": {"Gain": 1.0},
                },
                "spectrogram_generation_settings": {"step_ms": 10},
            },
        ],
    }
    fh = FeatureHandler(config)
    assert fh.get_mode_size("training") == 4
    assert fh.get_mode_size("validation") == 0

    # Host path: fresh augmented spectrogram, fixed length, scaled.
    x, y, w = fh.get_data(
        "training", batch_size=3, features_length=50, rng=np.random.default_rng(1)
    )
    assert x.shape == (3, 50, 40) and x.dtype == np.float32
    assert np.all(y == 1.0) and np.all(w == 1.0)
    assert 0.0 <= x.min() and x.max() <= 26.0 and x.max() > 0

    # Pack path: materialized pool feeds the on-device sampler.
    packed = fh.pack_training(0, 1)
    assert int(packed.clip_length.shape[0]) == 6
    feats, labels, weights = jax.jit(
        functools.partial(S.sample_batch, batch_size=4, features_length=50)
    )(packed, jax.random.PRNGKey(0))
    assert feats.shape == (4, 50, 40)
    assert np.all(np.asarray(labels) == 1.0)

    # Sharded pool: each host generates pool_size // shard_count clips.
    shard = fh.pack_training(1, 3)
    assert int(shard.clip_length.shape[0]) == 2


def test_sample_audio_feature_batch_matches_frontend():
    """Raw-audio sampling + in-step frontend == frontend_batch on the same
    window (truncate_start on an exact-length clip makes it deterministic)."""
    from microwakeword_tpu.frontend import xla as F

    rng = np.random.default_rng(3)
    L = 30  # frames
    n_chunks = L + S.WINDOW_CHUNKS - 1
    audio = rng.integers(-8000, 8000, n_chunks * S.HOP_SAMPLES).astype(np.int16)
    packed = S.PackedAudioData(
        chunks=jnp.asarray(audio.reshape(n_chunks, S.HOP_SAMPLES)),
        clip_offset=jnp.asarray([0], jnp.int32),
        clip_chunks=jnp.asarray([n_chunks], jnp.int32),
        provider_logits=jnp.asarray([0.0], jnp.float32),
        provider_clip_start=jnp.asarray([0], jnp.int32),
        provider_clip_count=jnp.asarray([1], jnp.int32),
        provider_label=jnp.asarray([1.0], jnp.float32),
        provider_penalty=jnp.asarray([0.5], jnp.float32),
        provider_strategy=jnp.asarray([S.TRUNCATE_START], jnp.int32),
    )
    feats, labels, weights = jax.jit(
        functools.partial(S.sample_audio_feature_batch, batch_size=2,
                          features_length=L)
    )(packed, jax.random.PRNGKey(0))
    assert feats.shape == (2, L, 40)
    assert np.all(np.asarray(labels) == 1.0) and np.all(np.asarray(weights) == 0.5)
    want = np.asarray(F.frontend_batch(jnp.asarray(audio)[None, :], step_ms=10))
    np.testing.assert_allclose(np.asarray(feats[0]), want[0, :L], atol=1e-4)
    np.testing.assert_allclose(np.asarray(feats[1]), want[0, :L], atol=1e-4)


def test_sample_audio_feature_batch_short_clip_left_pad():
    """Clips shorter than the window get leading silence (right-aligned)."""
    rng = np.random.default_rng(4)
    L = 20
    n_clip = 10  # chunks, < L + 2
    audio = rng.integers(-8000, 8000, n_clip * S.HOP_SAMPLES).astype(np.int16)
    packed = S.PackedAudioData(
        chunks=jnp.asarray(audio.reshape(n_clip, S.HOP_SAMPLES)),
        clip_offset=jnp.asarray([0], jnp.int32),
        clip_chunks=jnp.asarray([n_clip], jnp.int32),
        provider_logits=jnp.asarray([0.0], jnp.float32),
        provider_clip_start=jnp.asarray([0], jnp.int32),
        provider_clip_count=jnp.asarray([1], jnp.int32),
        provider_label=jnp.asarray([0.0], jnp.float32),
        provider_penalty=jnp.asarray([1.0], jnp.float32),
        provider_strategy=jnp.asarray([S.RANDOM], jnp.int32),
    )
    feats, _, _ = S.sample_audio_feature_batch(
        packed, jax.random.PRNGKey(1), 1, L
    )
    f = np.asarray(feats)[0]
    assert f.shape == (L, 40)
    # leading frames are pure silence -> zero features
    n_silent = (L + S.WINDOW_CHUNKS - 1) - n_clip  # leading zero chunks
    assert np.all(f[: n_silent - S.WINDOW_CHUNKS + 1] == 0.0)
    # trailing frames carry signal
    assert f[-1].max() > 0


def test_raw_audio_training_end_to_end(tmp_path):
    """config raw_audio_training: train() packs raw augmented audio and the
    jitted step computes features on device; the separable tone task is
    learned (VERDICT r1 item 5)."""
    from microwakeword_tpu.audio.io import save_clip
    from microwakeword_tpu.models import build_model
    from microwakeword_tpu.models.mixednet import MixedNetConfig
    from microwakeword_tpu.train import loop as T

    rng = np.random.default_rng(0)
    t = np.arange(24000)
    # Pulsed tones: the frontend's noise suppression removes *stationary*
    # signals, so the separable signal must be transient (8 Hz gate).
    gate = (np.sin(2 * np.pi * 8.0 * t / 16000) > 0).astype(np.float32)
    for name, freqs in [("pos", (2000, 2400)), ("neg", (200, 300))]:
        d = tmp_path / name
        d.mkdir()
        for i, f0 in enumerate(freqs):
            tone = 0.4 * gate * np.sin(2 * np.pi * f0 * t / 16000)
            tone += 0.004 * rng.standard_normal(len(t))
            save_clip(tone.astype(np.float32), str(d / f"c{i}.wav"))

    def clips_feature(name, truth):
        return {
            "type": "clips",
            "truth": truth,
            "sampling_weight": 1.0,
            "penalty_weight": 1.0,
            "truncation_strategy": "random",
            "pack_pool_size": 8,
            "clips_settings": {
                "input_directory": str(tmp_path / name),
                "file_pattern": "*.wav",
            },
            "augmentation_settings": {
                "augmentation_duration_s": 1.5,
                "augmentation_probabilities": {"Gain": 1.0},
            },
            "spectrogram_generation_settings": {"step_ms": 10},
        }

    config = {
        "train_dir": str(tmp_path / "run"),
        "stride": 1,
        "window_step_ms": 10,
        "batch_size": 16,
        "spectrogram_length": 40,
        "raw_audio_training": True,
        "training_steps": [80],
        "learning_rates": [0.02],
        "eval_step_interval": 40,
        "features": [clips_feature("pos", True), clips_feature("neg", False)],
    }
    cfg = MixedNetConfig(
        pointwise_filters=(12, 12),
        repeat_in_block=(1, 1),
        mixconv_kernel_sizes=((3,), (5,)),
        residual_connection=(False, False),
        first_conv_filters=8,
        first_conv_kernel_size=3,
        spectrogram_length=40,
    )
    bundle = build_model("mixednet", cfg)
    fh = FeatureHandler(config)
    variables, history = T.train(bundle, config, fh)
    final = history[-1]
    assert np.isfinite(final["train"]["loss"])
    assert final["train"]["accuracy"] > 0.9, final


def test_sample_audio_feature_batch_pallas_backend_matches_xla():
    """The pallas frontend option inside the sampler == the XLA path
    (interpreted off-TPU; real-TPU parity covered by the frontend tests)."""
    rng = np.random.default_rng(6)
    L = 24
    n_chunks = L + S.WINDOW_CHUNKS - 1
    audio = rng.integers(-8000, 8000, n_chunks * S.HOP_SAMPLES).astype(np.int16)
    packed = S.PackedAudioData(
        chunks=jnp.asarray(audio.reshape(n_chunks, S.HOP_SAMPLES)),
        clip_offset=jnp.asarray([0], jnp.int32),
        clip_chunks=jnp.asarray([n_chunks], jnp.int32),
        provider_logits=jnp.asarray([0.0], jnp.float32),
        provider_clip_start=jnp.asarray([0], jnp.int32),
        provider_clip_count=jnp.asarray([1], jnp.int32),
        provider_label=jnp.asarray([1.0], jnp.float32),
        provider_penalty=jnp.asarray([1.0], jnp.float32),
        provider_strategy=jnp.asarray([S.TRUNCATE_START], jnp.int32),
    )
    fx, _, _ = S.sample_audio_feature_batch(
        packed, jax.random.PRNGKey(0), 1, L, frontend_backend="xla"
    )
    fp, _, _ = S.sample_audio_feature_batch(
        packed, jax.random.PRNGKey(0), 1, L, frontend_backend="pallas"
    )
    np.testing.assert_allclose(np.asarray(fx), np.asarray(fp), atol=0.05)


def test_mixed_provider_raw_audio_training(tmp_path):
    """clips-type positives (raw audio, in-step frontend) + mmap negatives
    (precomputed spectrograms) train in ONE fused jitted step via
    PackedMixedData (VERDICT r2 item 2; reference FeatureHandler mixes
    provider types freely, data.py:405-466)."""
    from microwakeword_tpu.audio.io import save_clip
    from microwakeword_tpu.models import build_model
    from microwakeword_tpu.models.mixednet import MixedNetConfig
    from microwakeword_tpu.train import loop as T

    rng = np.random.default_rng(0)
    t = np.arange(24000)
    gate = (np.sin(2 * np.pi * 8.0 * t / 16000) > 0).astype(np.float32)
    pos_dir = tmp_path / "pos"
    pos_dir.mkdir()
    for i, f0 in enumerate((2000, 2400)):
        tone = 0.4 * gate * np.sin(2 * np.pi * f0 * t / 16000)
        tone += 0.004 * rng.standard_normal(len(t))
        save_clip(tone.astype(np.float32), str(pos_dir / f"c{i}.wav"))

    # mmap negatives: precomputed spectrograms with low-channel energy
    neg_dir = tmp_path / "neg" / "training"
    neg_dir.mkdir(parents=True)
    negs = []
    for _ in range(12):
        spec = rng.uniform(0, 60, size=(rng.integers(45, 70), 40))
        spec[:, :12] += 250
        negs.append(spec.astype(np.uint16))
    RaggedSpectrogramStore.create(str(neg_dir / "x_mmap"), negs)

    config = {
        "train_dir": str(tmp_path / "run"),
        "stride": 1,
        "window_step_ms": 10,
        "batch_size": 16,
        "spectrogram_length": 40,
        "raw_audio_training": True,
        "training_steps": [80],
        "learning_rates": [0.02],
        "eval_step_interval": 40,
        "features": [
            {
                "type": "clips",
                "truth": True,
                "sampling_weight": 1.0,
                "penalty_weight": 1.0,
                "truncation_strategy": "random",
                "pack_pool_size": 8,
                "clips_settings": {
                    "input_directory": str(pos_dir),
                    "file_pattern": "*.wav",
                },
                "augmentation_settings": {
                    "augmentation_duration_s": 1.5,
                    "augmentation_probabilities": {"Gain": 1.0},
                },
                "spectrogram_generation_settings": {"step_ms": 10},
            },
            {
                "type": "mmap",
                "truth": False,
                "sampling_weight": 1.0,
                "penalty_weight": 0.5,
                "truncation_strategy": "random",
                "features_dir": str(tmp_path / "neg"),
            },
        ],
    }
    fh = FeatureHandler(config)
    packed = fh.pack_training_audio(0, 1)
    assert isinstance(packed, S.PackedMixedData)
    assert abs(packed.audio_fraction - 0.5) < 1e-6

    # direct sampler check: half the batch raw-audio positives, half mmap
    # negatives, with per-provider labels/penalties
    feats, labels, weights = jax.jit(
        functools.partial(S.sample_mixed_batch, batch_size=8,
                          features_length=40)
    )(packed, jax.random.PRNGKey(0))
    assert feats.shape == (8, 40, 40)
    assert np.all(np.asarray(labels)[:4] == 1.0)
    assert np.all(np.asarray(labels)[4:] == 0.0)
    assert np.all(np.asarray(weights)[:4] == 1.0)
    assert np.all(np.asarray(weights)[4:] == 0.5)

    cfg = MixedNetConfig(
        pointwise_filters=(12, 12),
        repeat_in_block=(1, 1),
        mixconv_kernel_sizes=((3,), (5,)),
        residual_connection=(False, False),
        first_conv_filters=8,
        first_conv_kernel_size=3,
        spectrogram_length=40,
    )
    bundle = build_model("mixednet", cfg)
    variables, history = T.train(bundle, config, fh)
    final = history[-1]
    assert np.isfinite(final["train"]["loss"])
    assert final["train"]["accuracy"] > 0.9, final


def test_pool_refresher_swaps_without_retrace(tmp_path):
    """Background pool refresh (VERDICT r2 item 3): regenerated pools keep
    the pack layout (same shapes, no jit retrace), change contents across
    refresh boundaries, and the training loop learns through swaps."""
    from microwakeword_tpu.audio.io import save_clip
    from microwakeword_tpu.data.refresh import PoolRefresher
    from microwakeword_tpu.models import build_model
    from microwakeword_tpu.models.mixednet import MixedNetConfig
    from microwakeword_tpu.train import loop as T

    rng = np.random.default_rng(0)
    t = np.arange(24000)
    gate = (np.sin(2 * np.pi * 8.0 * t / 16000) > 0).astype(np.float32)
    for name, freqs in [("pos", (2000, 2400)), ("neg", (200, 300))]:
        d = tmp_path / name
        d.mkdir()
        for i, f0 in enumerate(freqs):
            tone = 0.4 * gate * np.sin(2 * np.pi * f0 * t / 16000)
            tone += 0.004 * rng.standard_normal(len(t))
            save_clip(tone.astype(np.float32), str(d / f"c{i}.wav"))

    def clips_feature(name, truth):
        return {
            "type": "clips",
            "truth": truth,
            "sampling_weight": 1.0,
            "penalty_weight": 1.0,
            "truncation_strategy": "random",
            "pack_pool_size": 6,
            "clips_settings": {
                "input_directory": str(tmp_path / name),
                "file_pattern": "*.wav",
            },
            "augmentation_settings": {
                "augmentation_duration_s": 1.5,
                "augmentation_probabilities": {"Gain": 1.0},
            },
            "spectrogram_generation_settings": {"step_ms": 10},
        }

    config = {
        "train_dir": str(tmp_path / "run"),
        "stride": 1,
        "window_step_ms": 10,
        "batch_size": 16,
        "spectrogram_length": 40,
        "raw_audio_training": True,
        "pool_refresh_steps": 10,
        # pool augmentations are deliberately unseeded (fresh randomness per
        # refresh), so train long enough that the accuracy gate is robust
        # to the draw
        "training_steps": [120],
        "learning_rates": [0.02],
        "eval_step_interval": 30,
        "features": [clips_feature("pos", True), clips_feature("neg", False)],
    }
    fh = FeatureHandler(config)

    # unit: layout-preserving regeneration with changed contents
    packed = fh.pack_training_audio(0, 1)
    refresher = PoolRefresher(fh, packed, interval_steps=5)
    c1 = refresher._build_chunks()
    c2 = refresher._build_chunks()
    assert c1.shape == tuple(packed.chunks.shape)
    assert not np.array_equal(c1, c2)  # fresh random augmentations
    refresher._queue.put(c2)
    new_packed = refresher.maybe_swap(packed, step=5)
    assert new_packed is not None
    assert new_packed.chunks.shape == packed.chunks.shape
    np.testing.assert_array_equal(np.asarray(new_packed.clip_offset),
                                  np.asarray(packed.clip_offset))

    # swap must not retrace the jitted step
    _, step = T.make_train_step(bundle := build_model(
        "mixednet",
        MixedNetConfig(
            pointwise_filters=(12,),
            repeat_in_block=(1,),
            mixconv_kernel_sizes=((3,),),
            residual_connection=(False,),
            first_conv_filters=8,
            first_conv_kernel_size=3,
            spectrogram_length=40,
        ),
    ), packed, 8, 40)
    variables = bundle.init(jax.random.PRNGKey(0))
    opt = T.make_train_step(bundle, packed, 8, 40)[0]
    opt_state = opt.init(variables["params"])
    kw = dict(learning_rate=0.01, time_mask_max_size=0, time_mask_count=0,
              freq_mask_max_size=0, freq_mask_count=0,
              positive_class_weight=1.0, negative_class_weight=1.0)
    p, bs, opt_state, _ = step(
        variables["params"], variables["batch_stats"], opt_state,
        jax.random.PRNGKey(1), **kw)
    assert step.cache_size() == 1
    step.swap_corpus(new_packed)
    p, bs, opt_state, m = step(p, bs, opt_state, jax.random.PRNGKey(2), **kw)
    assert step.cache_size() == 1  # same shapes: no retrace
    assert np.isfinite(float(m["loss"]))

    # integration: the training loop learns through background swaps
    cfg = MixedNetConfig(
        pointwise_filters=(12, 12),
        repeat_in_block=(1, 1),
        mixconv_kernel_sizes=((3,), (5,)),
        residual_connection=(False, False),
        first_conv_filters=8,
        first_conv_kernel_size=3,
        spectrogram_length=40,
    )
    bundle = build_model("mixednet", cfg)
    variables, history = T.train(bundle, config, fh)
    final = history[-1]
    assert np.isfinite(final["train"]["loss"])
    assert final["train"]["accuracy"] > 0.9, final


def test_sample_audio_feature_batch_20ms_matches_frontend():
    """window_step_ms=20 on the fused raw-audio path (VERDICT r3 item 5):
    hop-320 chunks + in-step frontend == frontend_batch(step_ms=20) on the
    same window.  The reference's *code default* step is 20 ms
    (model_train_eval.py:61, SURVEY §8.8)."""
    from microwakeword_tpu.frontend import xla as F

    rng = np.random.default_rng(7)
    L = 30  # frames
    hop = 320  # 16 * 20 ms
    wc = S.window_chunks_for_hop(hop)
    assert wc == 2  # 480-sample window spans 2 hop-320 rows
    n_chunks = L + wc - 1
    audio = rng.integers(-8000, 8000, n_chunks * hop).astype(np.int16)
    packed = S.PackedAudioData(
        chunks=jnp.asarray(audio.reshape(n_chunks, hop)),
        clip_offset=jnp.asarray([0], jnp.int32),
        clip_chunks=jnp.asarray([n_chunks], jnp.int32),
        provider_logits=jnp.asarray([0.0], jnp.float32),
        provider_clip_start=jnp.asarray([0], jnp.int32),
        provider_clip_count=jnp.asarray([1], jnp.int32),
        provider_label=jnp.asarray([1.0], jnp.float32),
        provider_penalty=jnp.asarray([1.0], jnp.float32),
        provider_strategy=jnp.asarray([S.TRUNCATE_START], jnp.int32),
        hop_samples=hop,
    )
    feats, _, _ = jax.jit(
        functools.partial(S.sample_audio_feature_batch, batch_size=2,
                          features_length=L)
    )(packed, jax.random.PRNGKey(0))
    assert feats.shape == (2, L, 40)
    want = np.asarray(F.frontend_batch(jnp.asarray(audio)[None, :], step_ms=20))
    np.testing.assert_allclose(np.asarray(feats[0]), want[0, :L], atol=1e-4)


class _FakeAudioProvider:
    """Minimal clips-type provider for pack/refresh unit tests."""

    def __init__(self, clips):
        self.sampling_weight = 1.0
        self.penalty_weight = 1.0
        self.label = 1.0
        self.truncation_strategy = "random"
        self.fixed_right_cutoffs = []
        self.clips = clips
        self.calls = 0
        self.fail_after = None

    def generate_audio_pool(self, shard_index, shard_count):
        self.calls += 1
        if self.fail_after is not None and self.calls > self.fail_after:
            raise RuntimeError("augmentation backend exploded")
        return self.clips


def test_pack_audio_data_20ms_hop():
    """pack_audio_data(step_ms=20) chunks at hop 320 and the sampler reads
    the hop from the packed data (no hidden 10 ms assumption)."""
    rng = np.random.default_rng(8)
    clips = [rng.uniform(-0.2, 0.2, 16000).astype(np.float32) for _ in range(3)]
    packed = S.pack_audio_data([_FakeAudioProvider(clips)], 0, 1, step_ms=20)
    assert packed.hop_samples == 320
    assert packed.chunks.shape[1] == 320
    L = 20
    feats, _, _ = S.sample_audio_feature_batch(
        packed, jax.random.PRNGKey(0), 2, L
    )
    assert feats.shape == (2, L, 40)
    assert float(np.asarray(feats).max()) > 0


def test_pool_refresher_worker_death_warns():
    """A dead refresher worker must surface (VERDICT r3 weak #4): the
    failure is recorded and the next due swap warns that training continues
    on the stale pool."""
    import types

    from microwakeword_tpu.data.refresh import PoolRefresher

    rng = np.random.default_rng(9)
    clips = [rng.uniform(-0.2, 0.2, 8000).astype(np.float32) for _ in range(2)]
    p = _FakeAudioProvider(clips)
    packed = S.pack_audio_data([p], 0, 1)
    p.fail_after = p.calls  # every future pool build raises
    fh = types.SimpleNamespace(providers=[p])
    r = PoolRefresher(fh, packed, interval_steps=1)
    r.start()
    r._thread.join(timeout=30)
    assert not r._thread.is_alive()
    assert r.failure is not None and "exploded" in r.failure
    with pytest.warns(UserWarning, match="worker died"):
        assert r.maybe_swap(packed, step=5) is None
    # the warning is emitted once, not per step
    import warnings as W

    with W.catch_warnings():
        W.simplefilter("error")
        assert r.maybe_swap(packed, step=10) is None
    r.stop()


def test_pool_refresher_slot_mismatch_warns():
    """Regenerated pools smaller than the packed layout cycle clips -- with
    a warning, not silently (VERDICT r3 weak #5)."""
    import types

    from microwakeword_tpu.data.refresh import PoolRefresher

    rng = np.random.default_rng(10)
    clips = [rng.uniform(-0.2, 0.2, 8000).astype(np.float32) for _ in range(4)]
    p = _FakeAudioProvider(clips)
    packed = S.pack_audio_data([p], 0, 1)
    p.clips = clips[:2]  # refresh returns fewer clips than packed slots
    fh = types.SimpleNamespace(providers=[p])
    r = PoolRefresher(fh, packed, interval_steps=1)
    with pytest.warns(UserWarning, match="packed slots"):
        chunks = r._build_chunks()
    assert chunks.shape == tuple(packed.chunks.shape)


def test_wide_gather_matches_row_gather():
    """The wide-row gather fast path (EDGE_PAD/WIDE_K, sampler.sample_batch)
    must return features bit-identical to the per-frame-row gather for the
    same corpus and rng -- including short clips (left silence), random and
    fixed_right_cutoff strategies, and SpecAugment."""
    import jax

    from microwakeword_tpu.data import sampler as S

    rng = np.random.default_rng(3)
    n_clips, L = 30, 25
    lengths = rng.integers(8, 60, n_clips)  # includes short clips (n < L)
    total = int(lengths.sum())
    pad = S.EDGE_PAD
    end_pad = pad + (-(pad + total)) % S.WIDE_K
    frames = np.zeros((pad + total + end_pad, 40), np.uint16)
    frames[pad : pad + total] = rng.integers(0, 660, (total, 40))
    offsets = np.concatenate([[0], np.cumsum(lengths)])[:-1] + pad
    half = n_clips // 2
    arrays = dict(
        frames=frames,
        edge_pad=pad,
        clip_offset=offsets.astype(np.int32),
        clip_length=lengths.astype(np.int32),
        provider_logits=np.asarray([0.0, 0.0], np.float32),
        provider_clip_start=np.asarray([0, half], np.int32),
        provider_clip_count=np.asarray([half, n_clips - half], np.int32),
        provider_label=np.asarray([1.0, 0.0], np.float32),
        provider_penalty=np.asarray([1.0, 2.0], np.float32),
        provider_strategy=np.asarray([0, 3], np.int32),  # random, fixed_cutoff
        provider_cutoffs=np.tile(
            np.asarray([0, 5, 0, 0, 0, 0, 0, 0], np.int32), (2, 1)
        ),
        provider_n_cutoffs=np.asarray([1, 2], np.int32),
    )
    padded = S.upload_training_arrays(arrays)
    stripped = padded.replace(edge_pad=0)  # same arrays, per-frame-row path
    kw = dict(time_mask_max_size=3, time_mask_count=1,
              freq_mask_max_size=3, freq_mask_count=1)
    for seed in range(4):
        r = jax.random.PRNGKey(seed)
        fw, lw, ww = S.sample_batch(padded, r, 16, L, wide_gather=True, **kw)
        fs, ls, ws = S.sample_batch(stripped, r, 16, L, **kw)
        np.testing.assert_array_equal(np.asarray(fw), np.asarray(fs))
        np.testing.assert_array_equal(np.asarray(lw), np.asarray(ls))
        np.testing.assert_array_equal(np.asarray(ww), np.asarray(ws))


def test_audio_wide_gather_matches_row_gather():
    """The raw-audio wide chunk gather (sample_audio_feature_batch
    wide_gather=True) must produce features identical to the per-hop row
    gather for the same corpus and rng (edge-padded pack)."""
    import jax

    from microwakeword_tpu.data import sampler as S

    rng = np.random.default_rng(5)
    n_clips, L = 20, 25
    hop = 160
    wc = S.window_chunks_for_hop(hop)
    counts = rng.integers(max(wc, 8), L + 40, n_clips)
    total = int(counts.sum())
    pad = S.EDGE_PAD
    end_pad = pad + (-(pad + total)) % S.WIDE_K
    chunks = np.zeros((pad + total + end_pad, hop), np.int16)
    chunks[pad : pad + total] = rng.integers(-8000, 8000, (total, hop))
    offsets = np.concatenate([[0], np.cumsum(counts)])[:-1] + pad
    half = n_clips // 2
    import jax.numpy as jnp

    packed = S.PackedAudioData(
        chunks=jnp.asarray(chunks),
        clip_offset=jnp.asarray(offsets.astype(np.int32)),
        clip_chunks=jnp.asarray(counts.astype(np.int32)),
        provider_logits=jnp.asarray([0.0, 0.0], jnp.float32),
        provider_clip_start=jnp.asarray([0, half], jnp.int32),
        provider_clip_count=jnp.asarray([half, n_clips - half], jnp.int32),
        provider_label=jnp.asarray([1.0, 0.0], jnp.float32),
        provider_penalty=jnp.asarray([1.0, 1.0], jnp.float32),
        provider_strategy=jnp.asarray([0, 1], jnp.int32),
        hop_samples=hop,
        edge_pad=pad,
    )
    stripped = packed.replace(edge_pad=0)
    kw = dict(time_mask_max_size=3, time_mask_count=1,
              freq_mask_max_size=3, freq_mask_count=1)
    for seed in range(3):
        r = jax.random.PRNGKey(seed)
        fw, lw, ww = S.sample_audio_feature_batch(
            packed, r, 8, L, wide_gather=True, **kw)
        fs, ls, ws = S.sample_audio_feature_batch(
            stripped, r, 8, L, **kw)
        np.testing.assert_array_equal(np.asarray(fw), np.asarray(fs))
        np.testing.assert_array_equal(np.asarray(lw), np.asarray(ls))
        np.testing.assert_array_equal(np.asarray(ww), np.asarray(ws))
