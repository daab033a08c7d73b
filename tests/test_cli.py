"""End-to-end CLI test: YAML config + synthetic dataset -> train -> eval."""
import os

import numpy as np
import yaml

from microwakeword_tpu.data.ragged_store import RaggedSpectrogramStore


def test_cli_end_to_end(tmp_path, capsys):
    rng = np.random.default_rng(0)

    def make(n, positive, lo, hi):
        out = []
        for _ in range(n):
            t = rng.integers(lo, hi)
            spec = rng.uniform(0, 80, size=(t, 40))
            if positive:
                spec[:, 20:] += 300
            else:
                spec[:, :20] += 300
            out.append(spec.astype(np.uint16))
        return out

    for name, positive, modes in [
        ("pos", True, {"training": 24, "validation": 8, "testing": 8}),
        ("neg", False, {"training": 20, "validation": 6, "testing": 6,
                        "validation_ambient": 1, "testing_ambient": 1}),
    ]:
        for mode, n in modes.items():
            d = tmp_path / name / mode
            d.mkdir(parents=True)
            lo, hi = (500, 600) if mode.endswith("ambient") else (40, 70)
            RaggedSpectrogramStore.create(
                str(d / "w_mmap"), make(n, positive, lo, hi)
            )

    config = {
        "train_dir": str(tmp_path / "run"),
        "clip_duration_ms": 390,  # -> final = 1 + (6240-480)//160 = 37
        "window_step_ms": 10,
        "batch_size": 16,
        "training_steps": [40],
        "learning_rates": [0.01],
        "eval_step_interval": 20,
        "time_mask_max_size": [0],
        "time_mask_count": [0],
        "freq_mask_max_size": [0],
        "freq_mask_count": [0],
        "minimization_metric": None,
        "maximization_metric": "average_viable_recall",
        "target_minimization": 0.9,
        "features": [
            {"features_dir": str(tmp_path / "pos"), "truth": True,
             "sampling_weight": 1.0, "penalty_weight": 1.0,
             "truncation_strategy": "truncate_start", "type": "mmap"},
            {"features_dir": str(tmp_path / "neg"), "truth": False,
             "sampling_weight": 1.0, "penalty_weight": 1.0,
             "truncation_strategy": "random", "type": "mmap"},
        ],
    }
    cfg_path = tmp_path / "training_parameters.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    from microwakeword_tpu.model_train_eval import main

    main([
        "--training_config", str(cfg_path),
        "--train", "1",
        "--test_streaming", "1",
        "--test_tf_nonstreaming", "1",
        "--test_native_quantized", "1",
        "mixednet",
        "--pointwise_filters", "12,12",
        "--repeat_in_block", "1,1",
        "--mixconv_kernel_sizes", "[3], [5]",
        "--residual_connection", "0,0",
        "--first_conv_filters", "8",
        "--first_conv_kernel_size", "3",
        "--stride", "1",
    ])

    run = tmp_path / "run"
    assert (run / "best_weights.msgpack").exists()
    assert (run / "training_config.yaml").exists()
    assert (run / "streaming" / "streaming_roc.txt").exists()
    assert (run / "non_stream" / "testing_set_metrics.txt").exists()
    assert (run / "stablehlo" / "model.mwwx").exists()
    out = capsys.readouterr().out
    assert "streaming ROC AUC" in out
    assert "nonstreaming accuracy" in out
    from microwakeword_tpu import native

    if native.available():
        assert (run / "native" / "model_quant.mww").exists()
        assert (run / "native" / "quantized_streaming_roc.txt").exists()
        assert "native int8 streaming ROC AUC" in out

    # --train 0 path reuses saved weights
    main([
        "--training_config", str(cfg_path),
        "--train", "0",
        "--test_streaming", "0",
        "--test_tf_nonstreaming", "1",
        "mixednet",
        "--pointwise_filters", "12,12",
        "--repeat_in_block", "1,1",
        "--mixconv_kernel_sizes", "[3], [5]",
        "--residual_connection", "0,0",
        "--first_conv_filters", "8",
        "--first_conv_kernel_size", "3",
        "--stride", "1",
    ])


def test_cli_inception_end_to_end(tmp_path):
    """The inception subparser trains and evaluates through the same CLI
    (reference model_train_eval.py inception subparser)."""
    rng = np.random.default_rng(1)

    def make(n, positive, lo, hi):
        out = []
        for _ in range(n):
            t = rng.integers(lo, hi)
            spec = rng.uniform(0, 80, size=(t, 40))
            if positive:
                spec[:, 20:] += 300
            else:
                spec[:, :20] += 300
            out.append(spec.astype(np.uint16))
        return out

    for name, positive, modes in [
        ("pos", True, {"training": 20, "validation": 6}),
        ("neg", False, {"training": 16, "validation": 6,
                        "validation_ambient": 1, "testing_ambient": 1}),
    ]:
        for mode, n in modes.items():
            d = tmp_path / name / mode
            d.mkdir(parents=True)
            lo, hi = (400, 500) if mode.endswith("ambient") else (45, 70)
            RaggedSpectrogramStore.create(
                str(d / "w_mmap"), make(n, positive, lo, hi)
            )

    config = {
        "train_dir": str(tmp_path / "run_inc"),
        "clip_duration_ms": 600,
        "window_step_ms": 10,
        "batch_size": 8,
        "training_steps": [10],
        "learning_rates": [0.01],
        "eval_step_interval": 5,
        "minimization_metric": None,
        "maximization_metric": "average_viable_recall",
        "features": [
            {"features_dir": str(tmp_path / "pos"), "truth": True,
             "sampling_weight": 1.0, "penalty_weight": 1.0,
             "truncation_strategy": "truncate_start", "type": "mmap"},
            {"features_dir": str(tmp_path / "neg"), "truth": False,
             "sampling_weight": 1.0, "penalty_weight": 1.0,
             "truncation_strategy": "random", "type": "mmap"},
        ],
    }
    cfg_path = tmp_path / "inc.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    from microwakeword_tpu.model_train_eval import main

    main([
        "--training_config", str(cfg_path),
        "--train", "1",
        "--test_streaming", "1",
        "--export_native", "0",
        "inception",
        "--cnn1_filters", "8",
        "--cnn1_kernel_sizes", "3",
        "--cnn1_subspectral_groups", "1",
        "--cnn2_filters1", "6,6",
        "--cnn2_filters2", "8,8",
        "--cnn2_kernel_sizes", "3,3",
        "--cnn2_subspectral_groups", "1,1",
        "--cnn2_dilation", "1,1",
    ])
    run = tmp_path / "run_inc"
    assert (run / "best_weights.msgpack").exists()
    assert (run / "streaming" / "streaming_roc.txt").exists()


def test_build_dataset_cli(tmp_path):
    """python -m microwakeword_tpu.build_dataset: wavs -> ragged stores the
    FeatureHandler can train from (documentation/training.md §1 recipe)."""
    import yaml

    from microwakeword_tpu.audio.io import save_clip
    from microwakeword_tpu.build_dataset import main as build_main
    from microwakeword_tpu.data.ragged_store import RaggedSpectrogramStore
    from microwakeword_tpu.data.store import FeatureHandler

    rng = np.random.default_rng(0)
    audio_dir = tmp_path / "wavs"
    audio_dir.mkdir()
    t = np.arange(20000)
    for i in range(6):
        tone = 0.3 * np.sin(2 * np.pi * (400 + 100 * i) * t / 16000)
        save_clip(tone.astype(np.float32), str(audio_dir / f"c{i}.wav"))

    config = {
        "output_dir": str(tmp_path / "features" / "word"),
        "name": "word",
        "clips": {
            "input_directory": str(audio_dir),
            "file_pattern": "*.wav",
            "random_split_seed": 3,
            "split_count": 2,  # 2 clips each to test/validation
        },
        "augmentation": {
            "augmentation_duration_s": 1.3,
            "augmentation_probabilities": {"Gain": 1.0},
        },
        "spectrogram_generation": {"step_ms": 10, "slide_frames": 3},
        "splits": {
            "training": {"split": "train", "repeat": 2},
            "testing": {"split": "test"},
            "validation": {"split": "validation"},
        },
    }
    cfg_path = tmp_path / "dataset.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)
    assert build_main(["--config", str(cfg_path)]) == 0

    store = RaggedSpectrogramStore(
        str(tmp_path / "features" / "word" / "training" / "word_mmap")
    )
    # 2 train clips x repeat 2 x slide_frames 3 = 12 spectrograms
    assert len(store) == 12
    assert store[0].dtype == np.uint16 and store[0].shape[1] == 40

    fh = FeatureHandler(
        {
            "stride": 1,
            "window_step_ms": 10,
            "features": [
                {"features_dir": str(tmp_path / "features" / "word"),
                 "truth": True, "sampling_weight": 1.0, "penalty_weight": 1.0,
                 "truncation_strategy": "truncate_start", "type": "mmap"},
            ],
        }
    )
    assert fh.get_mode_size("training") == 12
    x, y, _ = fh.get_data("training", 4, 30, "truncate_start")
    assert x.shape == (4, 30, 40) and np.all(y == 1.0)


def test_convert_mmap_ninja(tmp_path, monkeypatch):
    """convert_mmap_ninja migrates a reference features tree (shimmed
    RaggedMmap reader) into RaggedSpectrogramStore dirs."""
    import importlib
    import sys
    import types

    sys.path.insert(0, "/root/repo/scripts")
    from reference_compat import RaggedMmapShim

    ragged = types.ModuleType("mmap_ninja.ragged")
    ragged.RaggedMmap = RaggedMmapShim
    pkg = types.ModuleType("mmap_ninja")
    pkg.ragged = ragged
    monkeypatch.setitem(sys.modules, "mmap_ninja", pkg)
    monkeypatch.setitem(sys.modules, "mmap_ninja.ragged", ragged)

    rng = np.random.default_rng(0)
    specs = {
        "training/w_mmap": [rng.integers(0, 600, (t, 40)).astype(np.uint16)
                            for t in (30, 45, 20)],
        "testing_ambient/a_mmap": [rng.integers(0, 600, (200, 40)).astype(np.uint16)],
    }
    src = tmp_path / "ref"
    for rel, arrays in specs.items():
        RaggedMmapShim.create(str(src / rel), arrays)

    import convert_mmap_ninja as CM

    importlib.reload(CM)
    dst = tmp_path / "converted"
    assert CM.convert_tree(str(src), str(dst), log=lambda *_: None) == 2

    from microwakeword_tpu.data.ragged_store import RaggedSpectrogramStore

    for rel, arrays in specs.items():
        store = RaggedSpectrogramStore(str(dst / rel))
        assert len(store) == len(arrays)
        for got, want in zip(store, arrays):
            np.testing.assert_array_equal(got, want)


def test_bench_roofline_math():
    """bench.py roofline accounting: per-step normalization, MFU and
    floor/bound fields (pure math; no device needed)."""
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "bench", _os.path.join(_os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    peaks = {"peak_flops_per_sec": 100e12, "hbm_bytes_per_sec": 1e12,
             "flops_basis": "bf16"}
    cost = {"flops": 50e9, "bytes_accessed": 1e9}
    # 10 units per call, 1 ms per unit
    r = bench._roofline(cost, 10, 1e-3, peaks)
    assert r["flops_per_step"] == 5e9
    assert r["hbm_bytes_per_step"] == 1e8
    np.testing.assert_allclose(r["achieved_flops_per_sec"], 5e12)
    np.testing.assert_allclose(r["mfu"], 0.05)
    np.testing.assert_allclose(r["hbm_utilization"], 0.1)
    # intensity 50 < ridge 100 -> memory bound
    assert r["roofline_bound"] == "memory"
    np.testing.assert_allclose(r["compute_floor_sec"], 5e9 / 100e12)
    # no cost -> no roofline
    assert bench._roofline(None, 1, 1e-3, peaks) is None


def test_sweep_cli_share_batch(tmp_path):
    """python -m microwakeword_tpu.sweep --share_batch 1: trains a small
    population on the shared batch stream end-to-end, writes per-member
    weights + leaderboard."""
    rng = np.random.default_rng(5)

    def make(n, positive, lo, hi):
        out = []
        for _ in range(n):
            t = rng.integers(lo, hi)
            spec = rng.uniform(0, 80, size=(t, 40))
            if positive:
                spec[:, 20:] += 300
            else:
                spec[:, :20] += 300
            out.append(spec.astype(np.uint16))
        return out

    for name, positive, modes in [
        ("pos", True, {"training": 16, "validation": 8}),
        ("neg", False, {"training": 16, "validation": 8}),
    ]:
        for mode, n in modes.items():
            d = tmp_path / name / mode
            d.mkdir(parents=True)
            RaggedSpectrogramStore.create(
                str(d / "w_mmap"), make(n, positive, 40, 60)
            )

    config = {
        "train_dir": str(tmp_path / "sweep_run"),
        "clip_duration_ms": 390,
        "window_step_ms": 10,
        "batch_size": 8,
        "training_steps": [30],
        "learning_rates": [0.01],
        "eval_step_interval": 15,
        "maximization_metric": "average_viable_recall",
        "target_minimization": 0.9,
        "minimization_metric": None,
        "features": [
            {"features_dir": str(tmp_path / "pos"), "truth": True,
             "sampling_weight": 1.0, "penalty_weight": 1.0,
             "truncation_strategy": "truncate_start", "type": "mmap"},
            {"features_dir": str(tmp_path / "neg"), "truth": False,
             "sampling_weight": 1.0, "penalty_weight": 1.0,
             "truncation_strategy": "random", "type": "mmap"},
        ],
    }
    cfg_path = tmp_path / "sweep.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    from microwakeword_tpu.sweep import main as sweep_main

    sweep_main([
        "--training_config", str(cfg_path),
        "--n_models", "2",
        "--share_batch", "1",
        "--mesh", "off",
        "mixednet",
        "--pointwise_filters", "8,8",
        "--repeat_in_block", "1,1",
        "--mixconv_kernel_sizes", "[3], [5]",
        "--residual_connection", "0,0",
        "--first_conv_filters", "8",
        "--first_conv_kernel_size", "3",
        "--stride", "1",
    ])
    run = tmp_path / "sweep_run"
    assert (run / "member_00" / "best_weights.msgpack").exists()
    assert (run / "member_01" / "best_weights.msgpack").exists()
    assert (run / "leaderboard.json").exists()
