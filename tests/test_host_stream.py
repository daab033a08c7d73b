"""Corpus residency: host-streamed corpora (> HBM budget) and mesh-sharded
corpora must train correctly -- the capacity axis the reference gets for
free from disk-mmap streaming (reference data.py:190,540-569), closed here
without giving up the fused on-device step (VERDICT r4 item 1)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from test_train import _synthetic_dataset

from microwakeword_tpu.data import sampler as S
from microwakeword_tpu.data.host_stream import (
    HostBatchProducer,
    HostStreamedData,
    hbm_corpus_budget,
    pack_training_with_residency,
)
from microwakeword_tpu.data.store import FeatureHandler
from microwakeword_tpu.models import build_model
from microwakeword_tpu.models.mixednet import MixedNetConfig
from microwakeword_tpu.train import loop as T

LENGTH = 25


def _small_model():
    return build_model(
        "mixednet",
        MixedNetConfig(
            pointwise_filters=(12, 12),
            repeat_in_block=(1, 1),
            mixconv_kernel_sizes=((3,), (5,)),
            residual_connection=(False, False),
            first_conv_filters=8,
            first_conv_kernel_size=3,
            spectrogram_length=LENGTH,
        ),
    )


def _train_config(tmp_path, run_name, **overrides):
    config = _synthetic_dataset(tmp_path)
    config.update(
        {
            "train_dir": str(tmp_path / run_name),
            "batch_size": 32,
            "spectrogram_length": LENGTH,
            "training_steps": [24],
            "learning_rates": [0.01],
            "eval_step_interval": 12,
            "minimization_metric": "ambient_false_positives_per_hour",
            "maximization_metric": "average_viable_recall",
            "target_minimization": 0.5,
        }
    )
    config.update(overrides)
    return config


def test_budget_accounting_and_residency_knob(tmp_path, monkeypatch):
    config = _synthetic_dataset(tmp_path)
    fh = FeatureHandler(config)

    # budget bigger than the corpus -> HBM-resident
    monkeypatch.setenv("MWW_CORPUS_HBM_BUDGET", str(10**12))
    packed = pack_training_with_residency(fh.providers, {})
    assert isinstance(packed, S.PackedTrainingData)

    # budget smaller than the corpus, residency hbm -> clear error naming
    # the limit and the fallback knob
    monkeypatch.setenv("MWW_CORPUS_HBM_BUDGET", "1000")
    assert hbm_corpus_budget() == 1000
    with pytest.raises(ValueError, match="corpus_residency"):
        pack_training_with_residency(fh.providers, {"corpus_residency": "hbm"})

    # auto -> host streamed
    packed = pack_training_with_residency(fh.providers, {})
    assert isinstance(packed, HostStreamedData)
    assert packed.nbytes > 1000


def test_host_batches_bit_identical_to_packed(tmp_path):
    """For the same step rng, the host producer + finish_batch must yield
    exactly the batch the device sampler gathers (backend-invariant
    threefry + shared index math)."""
    config = _synthetic_dataset(tmp_path)
    fh = FeatureHandler(config)
    arrays = S.pack_training_arrays(fh.providers)
    packed = S.PackedTrainingData(**{k: jnp.asarray(v) for k, v in arrays.items()})
    host = HostStreamedData(arrays)

    b, L = 16, LENGTH
    producer = HostBatchProducer(host, b, L, steps=1)
    for seed in (0, 1, 2):
        step_rng = jax.random.PRNGKey(seed)
        r_batch, _ = jax.random.split(step_rng)
        feats_dev, labels_dev, w_dev = S.sample_batch(
            packed, r_batch, b, L, time_mask_max_size=4, time_mask_count=2,
            freq_mask_max_size=4, freq_mask_count=2,
        )
        windows, valid, labels, weights = producer(np.asarray(step_rng))
        feats_host = S.finish_batch(
            r_batch, windows, valid, time_mask_max_size=4, time_mask_count=2,
            freq_mask_max_size=4, freq_mask_count=2,
        )
        np.testing.assert_array_equal(np.asarray(feats_dev), np.asarray(feats_host))
        np.testing.assert_array_equal(np.asarray(labels_dev), np.asarray(labels))
        np.testing.assert_array_equal(np.asarray(w_dev), np.asarray(weights))


@pytest.mark.slow
def test_host_streamed_training_matches_packed(tmp_path, monkeypatch):
    """End-to-end: training from a corpus forced over the HBM budget
    (host-streamed) must reproduce the packed-mode run -- same seed, same
    batches, near-identical parameters."""
    cfg_packed = _train_config(tmp_path, "run_packed")
    bundle = _small_model()
    fh = FeatureHandler(cfg_packed)
    monkeypatch.delenv("MWW_CORPUS_HBM_BUDGET", raising=False)
    vars_packed, hist_packed = T.train(bundle, cfg_packed, fh)

    # force the corpus over the budget -> auto falls back to host streaming
    monkeypatch.setenv("MWW_CORPUS_HBM_BUDGET", "1000")
    cfg_host = _train_config(tmp_path, "run_host")
    vars_host, hist_host = T.train(bundle, cfg_host, fh)

    flat_p = jax.tree_util.tree_leaves(vars_packed["params"])
    flat_h = jax.tree_util.tree_leaves(vars_host["params"])
    for a, b in zip(flat_p, flat_h):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert hist_host[-1]["train"]["accuracy"] > 0.85


@pytest.mark.slow
def test_host_streamed_training_chained(tmp_path, monkeypatch):
    """steps_per_call > 1 in host mode: scan over staged batches, same
    results as packed chained mode."""
    bundle = _small_model()
    cfg_packed = _train_config(tmp_path, "run_packed_c", steps_per_call=4)
    fh = FeatureHandler(cfg_packed)
    monkeypatch.delenv("MWW_CORPUS_HBM_BUDGET", raising=False)
    vars_packed, _ = T.train(bundle, cfg_packed, fh)

    monkeypatch.setenv("MWW_CORPUS_HBM_BUDGET", "1000")
    cfg_host = _train_config(tmp_path, "run_host_c", steps_per_call=4)
    vars_host, hist = T.train(bundle, cfg_host, fh)
    for a, b in zip(
        jax.tree_util.tree_leaves(vars_packed["params"]),
        jax.tree_util.tree_leaves(vars_host["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert hist[-1]["step"] == 24


def test_sharded_corpus_mesh_training(tmp_path, monkeypatch):
    """Mesh path with corpus_sharding: shard -- each device holds 1/8 of
    the clips; training runs and learns the separable synthetic task."""
    from jax.sharding import Mesh

    from microwakeword_tpu.parallel.corpus import (
        ShardedTrainingData,
        pack_for_mesh,
        shard_training_data,
    )

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    cfg = _train_config(tmp_path, "run_shard", corpus_sharding="shard",
                        batch_size=32)
    fh = FeatureHandler(cfg)
    sharded = shard_training_data(fh.providers, mesh)
    # every device shard is non-empty and the union covers the corpus
    counts = np.asarray(sharded.stacked.provider_clip_count)
    assert counts.shape[0] == 8
    arrays = S.pack_training_arrays(fh.providers)
    total_clips = len(arrays["clip_offset"])
    # padded entries exist, but real clip totals must sum to the corpus
    real = [
        len(S.pack_training_arrays(fh.providers, shard_index=i, shard_count=8)[
            "clip_offset"])
        for i in range(8)
    ]
    assert sum(real) == total_clips

    bundle = _small_model()
    monkeypatch.delenv("MWW_CORPUS_HBM_BUDGET", raising=False)
    variables, history = T.train(bundle, cfg, fh, mesh=mesh)
    assert history[-1]["train"]["accuracy"] > 0.85
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert np.isfinite(np.asarray(leaf)).all()

    # pack_for_mesh auto mode: over-budget corpus -> sharded
    monkeypatch.setenv("MWW_CORPUS_HBM_BUDGET", "1000")
    packed = pack_for_mesh(fh.providers, {}, mesh)
    assert isinstance(packed, ShardedTrainingData)
    # replicate mode over budget -> clear error naming corpus_sharding
    with pytest.raises(ValueError, match="corpus_sharding"):
        pack_for_mesh(fh.providers, {"corpus_sharding": "replicate"}, mesh)


def test_sharded_sampling_preserves_provider_marginals(tmp_path):
    """Per-device local sampling must preserve the global provider label
    marginal (weights 1:1 -> ~50% positives over many draws)."""
    from jax.sharding import Mesh

    from microwakeword_tpu.parallel.corpus import (
        make_sharded_sample,
        shard_training_data,
    )

    config = _synthetic_dataset(tmp_path, n_train=40)
    fh = FeatureHandler(config)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sharded = shard_training_data(fh.providers, mesh)
    sample = make_sharded_sample(mesh, batch_size=64)
    labels_all = []
    for seed in range(20):
        _, labels, _ = sample(
            sharded, jax.random.PRNGKey(seed), 64, LENGTH
        )
        labels_all.append(np.asarray(labels))
    frac = np.concatenate(labels_all).mean()
    assert 0.4 < frac < 0.6
