"""Augmentation-pool diversity study (VERDICT r4 item 7).

The reference draws a FRESH augmentation for every training sample
(/root/reference/microwakeword/data.py:324-402); our on-device sampler
trains from an HBM pool of pre-augmented clips (data/store.py
ClipsFeatureSet, pack_pool_size) optionally regenerated in the background
(data/refresh.py).  This study measures what pool reuse costs in model
quality on the synthetic chirp wake-word task (same task family as
scripts/roc_parity.py), with matched seeds across three arms:

- static      -- one pool for the whole run (pool_refresh_steps=0, the
                 no-config default): ~96x expected draws per pool item at
                 3000 steps x batch 64 / pool 2000.
- refresh     -- background refresh every 500 steps (non-blocking, the
                 recommended production setting): ~16x draws per item per
                 pool generation.
- near_fresh  -- BLOCKING refresh every 100 steps: ~3.2x draws per item,
                 the closest practical point to the reference's
                 fresh-per-sample (training waits for the host augmenter;
                 by monotonicity in diversity, true fresh-per-sample lies
                 between this arm and the ideal).

Each run trains raw-audio mode (in-step frontend) on clips-type providers
with an aggressive augmentation policy (colored noise at 0-12 dB SNR,
gain, gain transitions, band-stop) over a deliberately small base-clip set
(80/class) so augmentation diversity is the dominant source of variety,
selects best weights by the two-step policy, and scores best+last
checkpoints with the streamed ambient ROC.  Because the final ROC can
saturate at 0 on a solvable task, the report also records the train-pool
accuracy vs held-out validation recall at the final eval -- a diversity
deficit appears as a train/val generalization gap before it appears in
the ROC.

Run: python scripts/pool_diversity.py [--seeds 4] [--quick]
Writes tests/golden/pool_diversity_report.json; the conclusions table
lives in documentation/parity.md §4.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import roc_parity as RP  # noqa: E402  (task generators + helpers)

SR = 16000

ARMS = {
    "static": {"pool_refresh_steps": 0},
    "refresh": {"pool_refresh_steps": 500},
    "near_fresh": {"pool_refresh_steps": 100, "pool_refresh_blocking": True},
}


def build_dataset(workdir, rng, sizes):
    """WAV training clips + precomputed validation/testing stores."""
    from microwakeword_tpu.audio.io import save_clip
    from microwakeword_tpu.data.ragged_store import RaggedSpectrogramStore

    marker = os.path.join(workdir, ".dataset_done")
    if os.path.exists(marker):
        return
    os.makedirs(workdir, exist_ok=True)
    # training WAVs (augmented on the fly by the arms)
    for name, gen in (("pos", RP.positive_clip), ("neg", RP.negative_clip)):
        d = os.path.join(workdir, "wavs", name)
        os.makedirs(d, exist_ok=True)
        for i in range(sizes["train_clips"]):
            save_clip(gen(rng).astype(np.float32), os.path.join(d, f"c{i:04d}.wav"))

    # validation/testing spectrograms (fresh clips, no augmentation)
    def feats(clips):
        return RP.features_ours([RP.to_int16(c) for c in clips])

    stores = {
        ("pos", "validation"): feats(
            [RP.positive_clip(rng) for _ in range(sizes["val_clips"])]
        ),
        ("neg", "validation"): feats(
            [RP.negative_clip(rng) for _ in range(sizes["val_clips"])]
        ),
        ("pos", "testing"): feats(
            [RP.positive_clip(rng) for _ in range(sizes["test_clips"])]
        ),
        ("neg", "testing"): feats(
            [RP.negative_clip(rng) for _ in range(sizes["test_clips"])]
        ),
        ("neg", "validation_ambient"): feats(
            [RP.ambient_track(rng, s) for s in sizes["validation_ambient_s"]]
        ),
        ("neg", "testing_ambient"): feats(
            [RP.ambient_track(rng, s) for s in sizes["testing_ambient_s"]]
        ),
    }
    for (name, mode), specs in stores.items():
        d = os.path.join(workdir, "features", name, mode)
        os.makedirs(d, exist_ok=True)
        RaggedSpectrogramStore.create(os.path.join(d, "w_mmap"), specs)
    with open(marker, "w") as f:
        f.write("ok\n")


def arm_config(workdir, train_dir, steps, batch, seed, arm):
    aug = {
        "augmentation_duration_s": 1.5,
        "augmentation_probabilities": {
            "AddColorNoise": 0.9,
            "Gain": 1.0,
            "GainTransition": 0.3,
            "BandStopFilter": 0.3,
        },
        "color_min_snr_db": 0,
        "color_max_snr_db": 12,
        "min_gain_db": -20,
        "max_gain_db": 0,
    }

    def clips_feature(name, truth):
        return {
            "type": "clips",
            "truth": truth,
            "sampling_weight": 1.0,
            "penalty_weight": 1.0,
            "truncation_strategy": "random",
            "pack_pool_size": 2000,
            "clips_settings": {
                "input_directory": os.path.join(workdir, "wavs", name),
                "file_pattern": "*.wav",
            },
            "augmentation_settings": aug,
            "spectrogram_generation_settings": {"step_ms": 10},
        }

    def mmap_feature(name, truth):
        return {
            "features_dir": os.path.join(workdir, "features", name),
            "truth": truth,
            "sampling_weight": 0.0,  # eval-only
            "penalty_weight": 1.0,
            "truncation_strategy": "truncate_start",
            "type": "mmap",
        }

    phase1 = (3 * steps) // 4
    return {
        "train_dir": train_dir,
        "clip_duration_ms": 1500,
        "window_step_ms": 10,
        "batch_size": batch,
        "seed": seed,
        "raw_audio_training": True,
        "steps_per_call": 25,
        "training_steps": [phase1, steps - phase1],
        "learning_rates": [0.001, 0.0002],
        "time_mask_max_size": [5],
        "time_mask_count": [2],
        "freq_mask_max_size": [5],
        "freq_mask_count": [2],
        "eval_step_interval": max(50, steps // 10),
        "minimization_metric": "ambient_false_positives_per_hour",
        "maximization_metric": "average_viable_recall",
        "target_minimization": 20.0,
        "features": [
            clips_feature("pos", True),
            clips_feature("neg", False),
            mmap_feature("pos", True),
            mmap_feature("neg", False),
        ],
        **ARMS[arm],
    }


def run_arm(workdir, arm, seed, steps, batch):
    from microwakeword_tpu.config import derive_config
    from microwakeword_tpu.data.store import FeatureHandler
    from microwakeword_tpu.evaluate import streaming_model_roc
    from microwakeword_tpu.model_train_eval import model_config_from_flags
    from microwakeword_tpu.models import build_model
    from microwakeword_tpu.train import loop as training
    import types

    train_dir = os.path.join(workdir, "runs", f"{arm}_{seed}")
    flags = types.SimpleNamespace(
        model_name="mixednet", **RP.MODELS["mixednet"]["flags"]
    )
    config = derive_config(
        arm_config(workdir, train_dir, steps, batch, seed, arm),
        model_config_from_flags(flags),
    )
    bundle = build_model("mixednet", config["model_config"])
    fh = FeatureHandler(config)
    t0 = time.perf_counter()
    _, history = training.train(bundle, config, fh)
    train_s = time.perf_counter() - t0
    final = history[-1]
    out = {
        "train_seconds": train_s,
        "steps_per_sec": steps / train_s,
        # pool-overfitting sensitivity when the final ROC saturates at 0:
        # training accuracy on the (reused) pool vs held-out validation
        # recall -- a diversity deficit shows as a train/val gap first
        "final_train_accuracy": float(final["train"].get("accuracy", 0.0)),
        "final_val_recall_at_no_faph": float(
            (final.get("validation") or {}).get("recall_at_no_faph", 0.0)
        ),
        "final_val_avr": float(
            (final.get("validation") or {}).get("average_viable_recall", 0.0)
        ),
    }
    for which in ("best", "last"):
        variables = training.load_weights(
            bundle, os.path.join(train_dir, f"{which}_weights.msgpack")
        )
        result = streaming_model_roc(
            bundle, variables, fh, config,
            folder=os.path.join(train_dir, "streaming"),
            accuracy_name=f"streaming_roc_{which}.txt",
        )
        out[which] = {
            "auc": float(result["auc"]),
            "frr_at_2faph": RP.frr_at(
                [float(v) for v in result["x_faph"]],
                [float(v) for v in result["y_frr"]],
                2.0,
            ),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--workdir", type=str, default="/tmp/pool_diversity")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--jax-cpu", action="store_true",
                    help="run on CPU (e.g. while another process holds the "
                         "single TPU chip)")
    args = ap.parse_args()

    if args.jax_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    steps = 300 if args.quick else args.steps
    sizes = {
        "train_clips": 30 if args.quick else 80,
        "val_clips": 40 if args.quick else 150,
        "test_clips": 40 if args.quick else 200,
        "validation_ambient_s": [120.0] if args.quick else [600.0, 600.0],
        "testing_ambient_s": [120.0] if args.quick else [600.0] * 4,
    }
    rng = np.random.default_rng(20260821)
    build_dataset(args.workdir, rng, sizes)

    res_dir = os.path.join(args.workdir, "results")
    os.makedirs(res_dir, exist_ok=True)
    results = {}
    for arm in ARMS:
        results[arm] = []
        for seed in range(1, args.seeds + 1):
            cache = os.path.join(res_dir, f"{arm}_{seed}.json")
            if os.path.exists(cache):
                with open(cache) as f:
                    r = json.load(f)
            else:
                t0 = time.perf_counter()
                r = run_arm(args.workdir, arm, seed, steps, args.batch)
                print(
                    f"[{arm} seed {seed}] best FRR@2faph="
                    f"{r['best']['frr_at_2faph']:.3f} auc={r['best']['auc']:.3f}"
                    f" last FRR={r['last']['frr_at_2faph']:.3f}"
                    f" ({time.perf_counter() - t0:.0f}s)",
                    flush=True,
                )
                with open(cache, "w") as f:
                    json.dump(r, f)
            results[arm].append(r)

    def stats(arm, which, key):
        vals = [r[which][key] for r in results[arm]]
        return {
            "mean": float(np.mean(vals)),
            "min": float(np.min(vals)),
            "max": float(np.max(vals)),
            "values": [round(float(v), 4) for v in vals],
        }

    report = {
        "design": {
            "task": "synthetic chirp wake word (roc_parity task family), "
                    "raw-audio training with aggressive augmentation "
                    "(colored noise 3-15 dB SNR, gain, band-stop)",
            "steps": steps,
            "batch": args.batch,
            "seeds_per_arm": args.seeds,
            "pool_size": 2000,
            "arms": {
                "static": "one pool per run (~96x draws/item)",
                "refresh": "background refresh every 500 steps (~16x)",
                "near_fresh": "blocking refresh every 100 steps (~3.2x)",
            },
        },
        "summary": {
            arm: {
                "best_frr_at_2faph": stats(arm, "best", "frr_at_2faph"),
                "best_auc": stats(arm, "best", "auc"),
                "last_frr_at_2faph": stats(arm, "last", "frr_at_2faph"),
                "final_val_recall_at_no_faph": {
                    "mean": float(np.mean(
                        [r.get("final_val_recall_at_no_faph", 0.0)
                         for r in results[arm]]
                    )),
                },
                "final_train_accuracy": {
                    "mean": float(np.mean(
                        [r.get("final_train_accuracy", 0.0)
                         for r in results[arm]]
                    )),
                },
                "steps_per_sec": {
                    "mean": float(np.mean([r["steps_per_sec"] for r in results[arm]]))
                },
            }
            for arm in ARMS
        },
        "per_seed": results,
    }
    out = args.out or os.path.join(
        os.path.dirname(__file__), "..", "tests", "golden",
        "pool_diversity_report.json",
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["summary"], indent=1))
    print(f"wrote {os.path.normpath(out)}")


if __name__ == "__main__":
    main()
