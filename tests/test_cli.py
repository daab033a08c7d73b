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
    out = capsys.readouterr().out
    assert "streaming ROC AUC" in out
    assert "nonstreaming accuracy" in out

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
