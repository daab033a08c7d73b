"""Training tests: metric math against hand-computed cases (the test strategy
the reference lacks, SURVEY.md §4.3), the checkpoint-selection predicate,
and a small end-to-end training run on separable synthetic data."""
import os

import jax
import numpy as np
import pytest

from microwakeword_tpu.data.ragged_store import RaggedSpectrogramStore
from microwakeword_tpu.data.store import FeatureHandler
from microwakeword_tpu.models import build_model
from microwakeword_tpu.models.mixednet import MixedNetConfig
from microwakeword_tpu.train import loop as T
from microwakeword_tpu.train import metrics as M


def test_confusion_at_cutoffs_hand_case():
    probs = np.array([0.1, 0.6, 0.9, 0.4])
    labels = np.array([0.0, 1.0, 1.0, 0.0])
    c = M.confusion_at_cutoffs(np.asarray(probs), np.asarray(labels))
    # cutoff 0.5 (index 50): preds = [F, T, T, F] -> tp=2 fp=0 tn=2 fn=0
    assert c["tp"][50] == 2 and c["fp"][50] == 0
    assert c["tn"][50] == 2 and c["fn"][50] == 0
    # cutoff 0.0: everything > 0 is positive -> tp=2, fp=2
    assert c["tp"][0] == 2 and c["fp"][0] == 2
    # cutoff 1.0: nothing is > 1 -> fn=2, tn=2
    assert c["tp"][100] == 0 and c["fn"][100] == 2


def test_binary_metrics_hand_case():
    probs = np.array([0.2, 0.8, 0.7, 0.3])
    labels = np.array([0.0, 1.0, 0.0, 1.0])
    m = {k: float(v) for k, v in M.binary_metrics(
        np.asarray(probs), np.asarray(labels)).items()}
    assert m["accuracy"] == 0.5  # tp=1 (0.8), tn=1 (0.2), fp=1 (0.7), fn=1 (0.3)
    assert m["recall"] == 0.5
    assert m["precision"] == 0.5
    # AUC: pairs (pos, neg): (0.8>0.2, 0.8>0.7, 0.3>0.2, 0.3<0.7) -> 3/4
    assert abs(m["auc"] - 0.75) < 1e-6


def test_validation_metrics_curve_math():
    # Validation: 4 positives with known probs; ambient: zero FPs above 0.3.
    val_probs = np.array([0.9, 0.8, 0.7, 0.05])
    val_labels = np.ones(4)
    ambient = np.array([0.25, 0.29, 0.1, 0.2])  # all < 0.3
    m = M.validation_metrics(val_probs, val_labels, ambient, ambient_duration_hours=1.0)
    # first cutoff with 0 faph: cutoff 0.29 (ambient max=0.29; need >cutoff
    # false) -> cutoffs are 0.29? grid is 0.01 steps: faph==0 first at 0.29.
    assert abs(m["cutoff_for_no_faph"] - 0.29) < 1e-9
    # at cutoff 0.29, 3 of 4 positives are > 0.29 -> recall 0.75
    assert abs(m["recall_at_no_faph"] - 0.75) < 1e-9
    assert m["ambient_false_positives"] == 0.0  # at cutoff 0.5
    # average_viable_recall: recall is 0.75 for all faph in [0, 2] region
    assert abs(m["average_viable_recall"] - 0.75) < 0.01


def test_validation_metrics_interpolation_branch():
    # Force faph[0] > 2: many ambient FPs at low cutoffs, 1h duration.
    val_probs = np.array([0.9, 0.6])
    val_labels = np.ones(2)
    ambient = np.concatenate([np.full(10, 0.05), [0.3]])  # faph[0]=11
    m = M.validation_metrics(val_probs, val_labels, ambient, 1.0)
    assert m["cutoff_for_no_faph"] > 0.25
    assert 0 < m["average_viable_recall"] <= 1.0


def test_is_new_best_predicate():
    # exact port of reference train.py:411-442
    target = 0.5
    # not at target yet: decreasing min is an improvement
    assert M.is_new_best(0.8, 0.1, 0.9, 0.5, target)
    assert not M.is_new_best(0.95, 0.9, 0.9, 0.5, target)
    # reaching target for the first time
    assert M.is_new_best(0.4, 0.1, 0.9, 0.5, target)
    # at target: maximization must improve
    assert M.is_new_best(0.45, 0.6, 0.4, 0.5, target)
    assert not M.is_new_best(0.45, 0.4, 0.4, 0.5, target)
    # tie on min with improved max
    assert M.is_new_best(0.4, 0.6, 0.4, 0.5, target)


def test_resolve_schedules_padding():
    cfg = {
        "training_steps": [100, 50, 25],
        "learning_rates": [0.01, 0.001],
        "time_mask_count": [3],
    }
    phases = T.resolve_schedules(cfg)
    assert [p["steps"] for p in phases] == [100, 50, 25]
    assert [p["learning_rate"] for p in phases] == [0.01, 0.001, 0.001]
    assert [p["time_mask_count"] for p in phases] == [3, 3, 3]


def _synthetic_dataset(tmp_path, n_train=40, length=25):
    """Positives: energy concentrated in high channels; negatives: low."""
    rng = np.random.default_rng(0)

    def make(n, positive, lo, hi):
        out = []
        for _ in range(n):
            t = rng.integers(lo, hi)
            spec = rng.uniform(0, 80, size=(t, 40))
            if positive:
                spec[:, 20:] += 300.0
            else:
                spec[:, :20] += 300.0
            out.append(spec.astype(np.uint16))
        return out

    for name, positive in [("pos", True), ("neg", False)]:
        for mode, n in [("training", n_train), ("validation", 10)]:
            d = tmp_path / name / mode
            d.mkdir(parents=True, exist_ok=True)
            RaggedSpectrogramStore.create(
                str(d / "w_mmap"), make(n, positive, length, length + 20)
            )
    amb = tmp_path / "neg" / "validation_ambient"
    amb.mkdir(parents=True, exist_ok=True)
    RaggedSpectrogramStore.create(str(amb / "a_mmap"), make(2, False, 300, 400))

    return {
        "stride": 1,
        "window_step_ms": 10,
        "features": [
            {
                "features_dir": str(tmp_path / "pos"),
                "truth": True,
                "sampling_weight": 1.0,
                "penalty_weight": 1.0,
                "truncation_strategy": "truncate_start",
                "type": "mmap",
            },
            {
                "features_dir": str(tmp_path / "neg"),
                "truth": False,
                "sampling_weight": 1.0,
                "penalty_weight": 1.0,
                "truncation_strategy": "random",
                "type": "mmap",
            },
        ],
    }


@pytest.mark.slow
def test_train_end_to_end(tmp_path):
    config = _synthetic_dataset(tmp_path)
    config.update(
        {
            "train_dir": str(tmp_path / "run"),
            "batch_size": 32,
            "spectrogram_length": 25,
            "training_steps": [60],
            "learning_rates": [0.01],
            "eval_step_interval": 30,
            "minimization_metric": "ambient_false_positives_per_hour",
            "maximization_metric": "average_viable_recall",
            "target_minimization": 0.5,
        }
    )
    cfg = MixedNetConfig(
        pointwise_filters=(12, 12),
        repeat_in_block=(1, 1),
        mixconv_kernel_sizes=((3,), (5,)),
        residual_connection=(False, False),
        first_conv_filters=8,
        first_conv_kernel_size=3,
        spectrogram_length=25,
    )
    bundle = build_model("mixednet", cfg)
    fh = FeatureHandler(config)
    variables, history = T.train(bundle, config, fh)

    assert len(history) == 2
    final = history[-1]
    assert final["train"]["accuracy"] > 0.85, final
    assert final["validation"]["recall"] > 0.8
    # artifacts
    run = tmp_path / "run"
    for f in ("best_weights.msgpack", "last_weights.msgpack", "metrics.jsonl"):
        assert (run / f).exists()
    assert (run / "restore" / "ckpt.msgpack").exists()

    # load_weights round-trips
    loaded = T.load_weights(bundle, str(run / "best_weights.msgpack"))
    x, y, _ = fh.get_data("validation", 0, 25, "truncate_start")
    probs = np.asarray(bundle.forward(loaded, x)).reshape(-1)
    acc = ((probs > 0.5) == (y > 0.5)).mean()
    assert acc > 0.8

    # resume from checkpoint
    config2 = dict(config, training_steps=[5])
    variables2, h2 = T.train(bundle, config2, fh, restore_checkpoint=True)
    assert h2[-1]["step"] >= 60  # restored_from_step + local step


@pytest.mark.slow
def test_train_steps_per_call_chaining(tmp_path):
    """steps_per_call>1 chains optimizer steps inside one XLA call; the run
    must hit the same step count, eval cadence, and learn the task."""
    config = _synthetic_dataset(tmp_path)
    config.update(
        {
            "train_dir": str(tmp_path / "run_chain"),
            "batch_size": 32,
            "spectrogram_length": 25,
            "training_steps": [60],
            "learning_rates": [0.01],
            "eval_step_interval": 30,
            "steps_per_call": 8,  # does not divide 30 -> exercises fallback
            "minimization_metric": "ambient_false_positives_per_hour",
            "maximization_metric": "average_viable_recall",
            "target_minimization": 0.5,
        }
    )
    cfg = MixedNetConfig(
        pointwise_filters=(12, 12),
        repeat_in_block=(1, 1),
        mixconv_kernel_sizes=((3,), (5,)),
        residual_connection=(False, False),
        first_conv_filters=8,
        first_conv_kernel_size=3,
        spectrogram_length=25,
    )
    bundle = build_model("mixednet", cfg)
    fh = FeatureHandler(config)
    variables, history = T.train(bundle, config, fh)
    assert len(history) == 2  # evals at steps 30 and 60 exactly
    assert history[0]["step"] == 30 and history[1]["step"] == 60
    assert history[-1]["train"]["accuracy"] > 0.85


def test_load_checkpoint_migrates_preflat_opt_state(tmp_path):
    """Checkpoints written before the flat-optimizer change stored per-leaf
    Adam mu/nu pytrees; _load_checkpoint must migrate them to the raveled
    layout exactly (Adam is elementwise, so concatenation in tree order is
    bit-identical)."""
    import flax.serialization
    import jax.flatten_util
    import jax.numpy as jnp
    import optax

    params = {
        "a": {"kernel": np.arange(6, dtype=np.float32).reshape(2, 3),
              "bias": np.ones(3, np.float32)},
        "b": {"w": np.full((4,), 2.0, np.float32)},
    }
    grads = jax.tree_util.tree_map(
        lambda x: jnp.asarray(0.1 + 0.01 * np.arange(x.size, dtype=np.float32)
                              .reshape(x.shape)), params)
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=0.001, eps=1e-7)

    # old (pre-flat) layout, advanced one step so mu/nu are nonzero
    old_state = opt.init(params)
    _, old_state = opt.update(grads, old_state, params)

    # expected: same update applied in the flat layout
    flat, _ = jax.flatten_util.ravel_pytree(params)
    gflat, _ = jax.flatten_util.ravel_pytree(grads)
    expected = opt.init(flat)
    _, expected = opt.update(gflat, expected, flat)

    path = tmp_path / "ckpt.msgpack"
    path.write_bytes(flax.serialization.to_bytes({"opt_state": old_state,
                                                  "step": 7}))
    template = {"opt_state": opt.init(flat), "step": 0}
    restored = T._load_checkpoint(str(path), template)
    assert restored["step"] == 7
    for got, want in zip(jax.tree_util.tree_leaves(restored["opt_state"]),
                         jax.tree_util.tree_leaves(expected)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-7)

    # current-format checkpoints still round-trip through the fast path
    path.write_bytes(flax.serialization.to_bytes({"opt_state": expected,
                                                  "step": 9}))
    again = T._load_checkpoint(str(path), template)
    assert again["step"] == 9


def test_steps_per_call_auto_config(tmp_path):
    """steps_per_call: 'auto' resolves without error (1 on CPU; TPU uses
    min(100, eval_step_interval)) and trains normally."""
    config = _synthetic_dataset(tmp_path, n_train=12)
    config.update(
        {
            "train_dir": str(tmp_path / "run_auto"),
            "batch_size": 16,
            "spectrogram_length": 25,
            "training_steps": [8],
            "learning_rates": [0.01],
            "eval_step_interval": 4,
            "steps_per_call": "auto",
        }
    )
    cfg = MixedNetConfig(
        pointwise_filters=(8,),
        repeat_in_block=(1,),
        mixconv_kernel_sizes=((3,),),
        residual_connection=(False,),
        first_conv_filters=8,
        first_conv_kernel_size=3,
        spectrogram_length=25,
    )
    bundle = build_model("mixednet", cfg)
    fh = FeatureHandler(config)
    _, history = T.train(bundle, config, fh)
    assert history[-1]["step"] == 8
