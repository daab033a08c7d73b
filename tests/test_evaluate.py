"""Evaluation math tests: cooldown accept counting, moving average, ROC
curve construction against hand-computed cases, and the streamed eval
harness end-to-end on a trained-ish model."""
import numpy as np
import pytest

from microwakeword_tpu.evaluate import roc as R


def test_moving_average():
    p = np.array([0, 1, 2, 3, 4], dtype=np.float32)
    np.testing.assert_allclose(R.moving_average(p, 3), [1, 2, 3])
    np.testing.assert_allclose(R.moving_average(p, 5), [2])
    assert R.moving_average(p[:2], 5).shape == (0,)


def test_cooldown_accept_counting():
    # Spikes at t=0 and t=2 fall inside the *initial* cooldown of 10
    # (reference initializes cooldown to ignore_slices, test.py:121); the
    # t=12 spike fires; t=14 is suppressed by the new cooldown; t=25 fires.
    track = np.zeros(30, dtype=np.float32)
    track[[0, 2, 12, 14, 25]] = 0.9
    cutoffs = np.array([0.5])
    faph = R.compute_false_accepts_per_hour(
        [track], cutoffs, ignore_slices_after_accept=10, stride=1, step_s=0.01
    )
    hours = 30 * 0.01 / 3600
    np.testing.assert_allclose(faph, [2 / hours])


def test_cooldown_initial_suppression():
    # Reference initializes cooldown to the full refractory (test.py:121),
    # so accepts within the first ignore_slices are suppressed.
    track = np.zeros(30, dtype=np.float32)
    track[2] = 0.9  # within initial cooldown of 5
    track[20] = 0.9
    faph = R.compute_false_accepts_per_hour(
        [track], np.array([0.5]), ignore_slices_after_accept=5, stride=1, step_s=0.01
    )
    hours = 30 * 0.01 / 3600
    np.testing.assert_allclose(faph, [1 / hours])


def test_roc_curve_simple():
    cutoffs = np.array([0.0, 0.25, 0.5, 0.75, 1.0])
    faph = np.array([10.0, 4.0, 1.0, 0.5, 0.0])
    fnr = np.array([0.0, 0.05, 0.1, 0.2, 1.0])
    xs, ys, cs = R.generate_roc_curve(faph, fnr, cutoffs, max_faph=2.0)
    # interpolation between (4, 0.05) and (1, 0.1) at x=2:
    want_fnr = (0.05 * (1 - 2) + 0.1 * (2 - 4)) / (1 - 4)
    assert xs[-1] == 2.0
    np.testing.assert_allclose(ys[-1], want_fnr)
    # terminates at 0 faph with its real fnr (no synthetic (0,1) point needed)
    assert xs[0] == 0.0 and ys[0] == 1.0
    auc = R.roc_auc(xs, ys)
    assert 0 < auc < 2.0 * 1.0


def test_roc_curve_no_zero_faph_terminal():
    cutoffs = np.array([0.0, 0.5, 1.0])
    faph = np.array([1.5, 1.0, 0.5])  # never reaches 0
    fnr = np.array([0.1, 0.2, 0.3])
    xs, ys, cs = R.generate_roc_curve(faph, fnr, cutoffs)
    # adds (0, 1) terminal
    assert xs[0] == 0.0 and ys[0] == 1.0


def test_streaming_eval_end_to_end(tmp_path):
    """Full harness on a tiny model + synthetic sets: shapes & files."""
    import jax
    from microwakeword_tpu.data.ragged_store import RaggedSpectrogramStore
    from microwakeword_tpu.data.store import FeatureHandler
    from microwakeword_tpu.evaluate.streaming_eval import (
        model_accuracy,
        streaming_model_roc,
    )
    from microwakeword_tpu.models import build_model
    from microwakeword_tpu.models.mixednet import MixedNetConfig

    rng = np.random.default_rng(0)
    for name, truth, modes in [
        ("pos", True, {"testing": 6}),
        ("neg", False, {"testing": 4, "testing_ambient": 2}),
    ]:
        for mode, n in modes.items():
            d = tmp_path / name / mode
            d.mkdir(parents=True)
            lo, hi = (600, 700) if mode.endswith("ambient") else (30, 50)
            specs = [
                rng.uniform(0, 660, size=(rng.integers(lo, hi), 40)).astype(np.uint16)
                for _ in range(n)
            ]
            RaggedSpectrogramStore.create(str(d / "m_mmap"), specs)
    config = {
        "stride": 1,
        "window_step_ms": 10,
        "spectrogram_length": 25,
        "spectrogram_length_final_layer": 19,
        "batch_size": 16,
        "features": [
            {"features_dir": str(tmp_path / "pos"), "truth": True,
             "sampling_weight": 1.0, "penalty_weight": 1.0,
             "truncation_strategy": "truncate_start", "type": "mmap"},
            {"features_dir": str(tmp_path / "neg"), "truth": False,
             "sampling_weight": 1.0, "penalty_weight": 1.0,
             "truncation_strategy": "random", "type": "mmap"},
        ],
    }
    fh = FeatureHandler(config)
    cfg = MixedNetConfig(
        pointwise_filters=(8,), repeat_in_block=(1,),
        mixconv_kernel_sizes=((5,),), residual_connection=(False,),
        first_conv_filters=8, first_conv_kernel_size=3, spectrogram_length=25,
    )
    bundle = build_model("mixednet", cfg)
    variables = bundle.init(jax.random.PRNGKey(0))

    out = streaming_model_roc(
        bundle, variables, fh, config, folder=str(tmp_path / "eval")
    )
    assert 0 <= out["auc"] <= 2.0
    assert (tmp_path / "eval" / "streaming_roc.txt").exists()
    txt = (tmp_path / "eval" / "streaming_roc.txt").read_text()
    assert txt.startswith("AUC ")
    assert out["positive_count"] == 6
    assert len(out["faph_at_cutoffs"]) == 101

    acc = model_accuracy(bundle, variables, fh, config, data_set="testing")
    assert acc["count"] == 10
    amb = model_accuracy(bundle, variables, fh, config, data_set="testing_ambient")
    assert "false_accepts_per_hour" in amb


def test_count_crossings_matches_python_loop():
    """Vectorized 0.5-crossing counting == the reference's Python loop
    semantics (test.py:476-483)."""
    rng = np.random.default_rng(0)
    for refractory in (0, 3, 10):
        probs = rng.uniform(0, 1, 200).astype(np.float32)

        def python_loop():
            previous, last_accept, fp = 0.0, 0, 0
            for i, p in enumerate(probs):
                if previous <= 0.5 < p and (i - last_accept > refractory):
                    fp += 1
                    last_accept = i
                previous = float(p)
            return fp

        assert R.count_crossings(probs, 0.5, refractory) == python_loop()


def test_streaming_roc_process_sharded_matches_serial(tmp_path):
    """Multi-host ROC: per-process track shards + summed counts reproduce
    the single-process curve exactly (VERDICT r1 item 10).  Simulated by
    computing shard 1's local counts directly and patching _global_sum."""
    import jax

    from microwakeword_tpu.data.ragged_store import RaggedSpectrogramStore
    from microwakeword_tpu.data.store import FeatureHandler
    from microwakeword_tpu.evaluate import streaming_eval as SE
    from microwakeword_tpu.models import build_model
    from microwakeword_tpu.models.mixednet import MixedNetConfig

    rng = np.random.default_rng(5)

    def make(n, positive, lo, hi):
        out = []
        for _ in range(n):
            t = rng.integers(lo, hi)
            s = rng.uniform(0, 80, size=(t, 40))
            if positive:
                s[:, 20:] += 300.0
            out.append(s.astype(np.uint16))
        return out

    d = tmp_path / "pos" / "testing"
    d.mkdir(parents=True)
    RaggedSpectrogramStore.create(str(d / "w_mmap"), make(5, True, 60, 90))
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
        pointwise_filters=(8,),
        repeat_in_block=(1,),
        mixconv_kernel_sizes=((3,),),
        residual_connection=(False,),
        first_conv_filters=8,
        first_conv_kernel_size=3,
        spectrogram_length=30,
    )
    bundle = build_model("mixednet", cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    fh = FeatureHandler(config)

    serial = SE.streaming_model_roc(bundle, variables, fh, config)

    # shard 1's local pieces, computed directly
    ambient, _, _ = fh.get_data("testing_ambient", 8, 30, "none")
    cutoffs = R.DEFAULT_CUTOFFS
    amb1_counts, amb1_hours = SE.ambient_accept_counts(
        [SE._track_stream_probs(bundle, variables, t)
         for t in list(ambient)[1::2]],
        cutoffs, 25, 5, stride=1, step_s=0.01,
    )
    test_x, test_y, _ = fh.get_data("testing", 8, 30, "none")
    pos1 = [s for s, l in zip(test_x, test_y) if l > 0.5][1::2]
    maxp1 = []
    for spec in pos1:
        probs = SE._track_stream_probs(bundle, variables, spec)
        ma = R.moving_average(probs[25:], 5)
        if len(ma):
            maxp1.append(float(ma.max()))
    det1, n1 = SE.positive_detection_counts(maxp1, cutoffs)

    shard1 = [np.concatenate([amb1_counts, [amb1_hours]]),
              np.concatenate([det1, [float(n1)]])]
    calls = iter(shard1)

    real_global_sum = SE._global_sum

    def fake_global_sum(arr):
        return arr + next(calls)

    SE._global_sum = fake_global_sum
    try:
        sharded = SE.streaming_model_roc(
            bundle, variables, fh, config, process_shard=(0, 2)
        )
    finally:
        SE._global_sum = real_global_sum

    np.testing.assert_allclose(
        sharded["faph_at_cutoffs"], serial["faph_at_cutoffs"], atol=1e-9
    )
    np.testing.assert_allclose(
        sharded["frr_at_cutoffs"], serial["frr_at_cutoffs"], atol=1e-9
    )
    np.testing.assert_allclose(sharded["auc"], serial["auc"], atol=1e-9)
    assert sharded["positive_count"] == serial["positive_count"] == 5
