"""Cross-framework ROC parity harness (BASELINE target #1).

Builds one synthetic, TTS-free wake-word dataset (a two-chirp "wake
pattern" vs. distractor bursts in noise, plus long ambient tracks), then:

1. computes spectrograms for the SAME audio twice -- with the true C
   micro-frontend op (tensorflow.lite.experimental.microfrontend, what the
   reference trains on) and with this repo's frontend;
2. trains the reference (Keras/TF, microwakeword.train.train, CPU) on its
   features and this framework (train/loop.py) on ours, with identical
   hyperparameters;
3. evaluates both with their own streamed ambient ROC
   (reference test.py:293-403 via its TFLite export; ours via
   evaluate.streaming_model_roc);
4. writes tests/golden/roc_parity_report.json comparing FRR at FAPH
   anchors and AUC.

Because both stacks start from different inits/RNGs, this checks
*quality parity* (the frontend->training->ROC transfer), not bit equality.

Run: python scripts/roc_parity.py [--quick] [--out report.json]
"""
import argparse
import json
import os
import sys
import tempfile
import time
import types

import numpy as np

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _SCRIPTS)
sys.path.insert(0, os.path.dirname(_SCRIPTS))  # repo root (microwakeword_tpu)
from reference_compat import RaggedMmapShim, install_shims  # noqa: E402

SR = 16000


# --------------------------- audio synthesis -------------------------------
def _chirp(rng, f0, f1, dur_s, amp):
    n = int(dur_s * SR)
    freq = np.linspace(f0, f1, n)
    phase = 2.0 * np.pi * np.cumsum(freq) / SR
    return (amp * np.hanning(n) * np.sin(phase)).astype(np.float32)


def wake_pattern(rng):
    """Up-chirp, gap, down-chirp -- the 'wake word' (~0.45 s)."""
    j = lambda: 1.0 + rng.uniform(-0.08, 0.08)
    a = _chirp(rng, 800 * j(), 1600 * j(), 0.18 * j(), rng.uniform(0.1, 0.4))
    gap = np.zeros(int(rng.uniform(0.04, 0.08) * SR), np.float32)
    b = _chirp(rng, 2600 * j(), 1800 * j(), 0.18 * j(), rng.uniform(0.1, 0.4))
    return np.concatenate([a, gap, b])


def distractor(rng, hard: bool = True):
    """Negatives.  hard=True: half patterns and reversed order (training/
    test negatives -- teaches the decision boundary).  hard=False: off-band
    chirps and tone/noise bursts (ambient background -- acoustically
    distinct events, like real radio/podcast ambient audio)."""
    kind = rng.integers(0, 4)
    j = lambda: 1.0 + rng.uniform(-0.1, 0.1)
    # ambient chirps sit in shifted frequency bands
    shift = 1.0 if hard else rng.choice([0.45, 0.6, 1.7, 2.2])
    if kind == 0:  # single up-chirp
        return _chirp(rng, 800 * j() * shift, 1600 * j() * shift,
                      0.18 * j(), rng.uniform(0.2, 0.5))
    if kind == 1:  # single down-chirp
        return _chirp(rng, 2600 * j() * shift, 1800 * j() * shift,
                      0.18 * j(), rng.uniform(0.2, 0.5))
    if kind == 2:  # reversed pattern
        b = _chirp(rng, 2600 * j() * shift, 1800 * j() * shift,
                   0.18 * j(), rng.uniform(0.2, 0.5))
        gap = np.zeros(int(rng.uniform(0.04, 0.08) * SR), np.float32)
        a = _chirp(rng, 800 * j() * shift, 1600 * j() * shift,
                   0.18 * j(), rng.uniform(0.2, 0.5))
        return np.concatenate([b, gap, a])
    # pulsed tone burst
    n = int(rng.uniform(0.1, 0.3) * SR)
    t = np.arange(n) / SR
    gate = (np.sin(2 * np.pi * rng.uniform(5, 12) * t) > 0).astype(np.float32)
    return (rng.uniform(0.15, 0.4) * gate * np.hanning(n)
            * np.sin(2 * np.pi * rng.uniform(300, 3000) * t)).astype(np.float32)


def _noise(rng, n):
    return (rng.uniform(0.008, 0.04) * rng.standard_normal(n)).astype(np.float32)


def _embed(base, piece, start):
    end = min(start + len(piece), len(base))
    base[start:end] += piece[: end - start]


def positive_clip(rng, dur_s=1.5):
    base = _noise(rng, int(dur_s * SR))
    pat = wake_pattern(rng)
    # wake word ends near the clip end (truncate_start training convention),
    # with a little trailing room so the streamed probability ramp completes
    end_slack = int(rng.uniform(0.05, 0.3) * SR)
    start = max(0, len(base) - len(pat) - end_slack)
    _embed(base, pat, start)
    return np.clip(base, -1, 1)


def negative_clip(rng, dur_s=1.5):
    base = _noise(rng, int(dur_s * SR))
    for _ in range(rng.integers(0, 3)):
        # mix adversarial (in-band) and background-style (off-band)
        # distractors so ambient events are in-distribution negatives
        d = distractor(rng, hard=bool(rng.integers(0, 2)))
        start = rng.integers(0, max(1, len(base) - len(d)))
        _embed(base, d, start)
    return np.clip(base, -1, 1)


def ambient_track(rng, dur_s):
    base = _noise(rng, int(dur_s * SR))
    n_events = int(dur_s / 60.0 * rng.uniform(1.5, 3.0))
    for _ in range(n_events):
        d = distractor(rng, hard=False)
        start = rng.integers(0, max(1, len(base) - len(d)))
        _embed(base, d, start)
    return np.clip(base, -1, 1)


def to_int16(x):
    return np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)


# --------------------------- feature frontends -----------------------------
def features_c_op(clips_int16, step_ms=10):
    """True C micro-frontend (what the reference trains on)."""
    import tensorflow as tf
    from tensorflow.lite.experimental.microfrontend.python.ops import (
        audio_microfrontend_op as frontend_op,
    )

    out = []
    for clip in clips_int16:
        feats = frontend_op.audio_microfrontend(
            tf.convert_to_tensor(clip),
            sample_rate=SR,
            window_size=30,
            window_step=step_ms,
            num_channels=40,
            upper_band_limit=7500,
            lower_band_limit=125,
            enable_pcan=True,
            min_signal_remaining=0.05,
            out_scale=1,
            out_type=tf.uint16,
        )
        out.append(np.asarray(feats).astype(np.uint16))
    return out


def features_ours(clips_int16, step_ms=10, batch=64):
    """This repo's frontend (batched on-device)."""
    import jax.numpy as jnp

    from microwakeword_tpu.frontend import xla as F

    out = []
    for i in range(0, len(clips_int16), batch):
        part = clips_int16[i : i + batch]
        max_len = max(len(c) for c in part)
        x = np.zeros((len(part), max_len), np.int16)
        for row, c in enumerate(part):
            x[row, : len(c)] = c
        feats = np.asarray(F.frontend_batch(jnp.asarray(x), step_ms=step_ms))
        hop = 160 * (step_ms // 10)
        for row, c in enumerate(part):
            t = 1 + (len(c) - 480) // hop if len(c) >= 480 else 0
            out.append(np.round(feats[row, :t] / 0.0390625).astype(np.uint16))
    return out


# --------------------------- dataset assembly ------------------------------
def build_dataset(rng, sizes):
    """Generates all audio once; returns {mode: {'pos': [...], 'neg': [...]}}
    plus ambient tracks, as int16."""
    data = {}
    for mode, (n_pos, n_neg) in sizes["clips"].items():
        data[mode] = {
            "pos": [to_int16(positive_clip(rng)) for _ in range(n_pos)],
            "neg": [to_int16(negative_clip(rng)) for _ in range(n_neg)],
        }
    data["validation_ambient"] = [
        to_int16(ambient_track(rng, s)) for s in sizes["validation_ambient_s"]
    ]
    data["testing_ambient"] = [
        to_int16(ambient_track(rng, s)) for s in sizes["testing_ambient_s"]
    ]
    return data


def write_stores(root, featurize, data, store_cls):
    """Writes {root}/{positive,negative}/{mode}/x_mmap stores."""
    for mode in ("training", "validation", "testing"):
        for name in ("pos", "neg"):
            d = os.path.join(root, "positive" if name == "pos" else "negative", mode)
            os.makedirs(d, exist_ok=True)
            store_cls.create(os.path.join(d, "x_mmap"), featurize(data[mode][name]))
    for mode in ("validation_ambient", "testing_ambient"):
        d = os.path.join(root, "negative", mode)
        os.makedirs(d, exist_ok=True)
        store_cls.create(os.path.join(d, "x_mmap"), featurize(data[mode]))


def features_config(root):
    return [
        {
            "features_dir": os.path.join(root, "positive"),
            "truth": True,
            "sampling_weight": 1.0,
            "penalty_weight": 1.0,
            "truncation_strategy": "truncate_start",
            "type": "mmap",
        },
        {
            "features_dir": os.path.join(root, "negative"),
            "truth": False,
            "sampling_weight": 1.0,
            "penalty_weight": 1.0,
            "truncation_strategy": "random",
            "type": "mmap",
        },
    ]


# --------------------------- model hyperparams -----------------------------
MODEL_FLAGS = dict(
    pointwise_filters="24,24,24",
    repeat_in_block="1,1,1",
    mixconv_kernel_sizes="[5],[7,11],[9]",
    residual_connection="0,0,0",
    max_pool=0,
    first_conv_filters=24,
    first_conv_kernel_size=5,
    spatial_attention=0,
    pooled=0,
    stride=3,
)


def train_config(root, train_dir, steps, batch):
    return {
        "train_dir": train_dir,
        "summaries_dir": os.path.join(train_dir, "logs"),
        "clip_duration_ms": 1500,
        "window_step_ms": 10,
        "batch_size": batch,
        "training_steps": [steps],
        "learning_rates": [0.001],
        "time_mask_max_size": [5],
        "time_mask_count": [2],
        "freq_mask_max_size": [5],
        "freq_mask_count": [2],
        "negative_class_weight": [1.0],
        "positive_class_weight": [1.0],
        "eval_step_interval": max(50, steps // 5),
        # target is deliberately reachable on the synthetic task: once faph
        # drops below it, both frameworks select by average_viable_recall
        # (an unreachable target degenerates selection into "fires least").
        "minimization_metric": "ambient_false_positives_per_hour",
        "maximization_metric": "average_viable_recall",
        "target_minimization": 20.0,
        "features": features_config(root),
    }


# --------------------------- framework runs --------------------------------
def run_ours(root, train_dir, steps, batch):
    from microwakeword_tpu.config import derive_config
    from microwakeword_tpu.data.store import FeatureHandler
    from microwakeword_tpu.evaluate import streaming_model_roc
    from microwakeword_tpu.model_train_eval import model_config_from_flags
    from microwakeword_tpu.models import build_model
    from microwakeword_tpu.train import loop as training

    flags = types.SimpleNamespace(model_name="mixednet", **MODEL_FLAGS)
    model_cfg = model_config_from_flags(flags)
    config = derive_config(train_config(root, train_dir, steps, batch), model_cfg)
    bundle = build_model("mixednet", config["model_config"])
    fh = FeatureHandler(config)
    t0 = time.perf_counter()
    training.train(bundle, config, fh)
    train_s = time.perf_counter() - t0
    out = {
        "train_seconds": train_s,
        "spectrogram_length": config["spectrogram_length"],
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
            "faph": [float(v) for v in result["x_faph"]],
            "frr": [float(v) for v in result["y_frr"]],
        }
    return out


def run_reference(root, train_dir, steps, batch):
    install_shims()
    from microwakeword import data as rdata
    from microwakeword import mixednet as rmixednet
    from microwakeword import test as rtest
    from microwakeword import train as rtrain
    from microwakeword import utils as rutils
    from microwakeword.layers import modes as rmodes

    flags = types.SimpleNamespace(**MODEL_FLAGS)
    dropped = rmixednet.spectrogram_slices_dropped(flags)
    stride = MODEL_FLAGS["stride"]
    final = 1 + (16 * 1500 - 480) // (stride * 16 * 10)
    length = final + dropped

    config = train_config(root, train_dir, steps, batch)
    config["spectrogram_length_final_layer"] = final
    config["spectrogram_length"] = length
    config["stride"] = stride
    config["training_input_shape"] = (length, 40)
    os.makedirs(train_dir, exist_ok=True)

    data_processor = rdata.FeatureHandler(config)
    model = rmixednet.model(flags, (length, 40), batch)

    # TF 2.21 Keras model.evaluate(return_dict=True) yields plain floats /
    # numpy arrays; the reference (written for tf 2.16) calls .numpy() on
    # the threshold-metric entries (train.py:73,104-106).  Wrap evaluate so
    # array entries regain a .numpy() method.
    class _TensorLike(np.ndarray):
        def numpy(self):
            return np.asarray(self)

    orig_evaluate = model.evaluate

    def evaluate_compat(*a, **kw):
        result = orig_evaluate(*a, **kw)
        if isinstance(result, dict):
            result = {
                k: (np.asarray(v).view(_TensorLike)
                    if isinstance(v, np.ndarray) else v)
                for k, v in result.items()
            }
        return result

    model.evaluate = evaluate_compat
    t0 = time.perf_counter()
    rtrain.train(model, config, data_processor)
    train_s = time.perf_counter() - t0

    # Reference eval flow (model_train_eval.py:414-439): fresh batch-1 model
    # + best/last weights -> streaming SavedModel -> TFLite -> streamed ROC.
    out = {"train_seconds": train_s, "spectrogram_length": length}
    for which in ("best", "last"):
        eval_model = rmixednet.model(flags, (length, 40), 1)
        eval_model.load_weights(
            os.path.join(train_dir, f"{which}_weights.weights.h5")
        )
        folder = f"tflite_stream_state_internal_{which}"
        rutils.convert_model_saved(
            eval_model, config, "stream_state_internal",
            rmodes.Modes.STREAM_INTERNAL_STATE_INFERENCE,
        )
        rutils.convert_saved_model_to_tflite(
            config,
            audio_processor=data_processor,
            path_to_model=os.path.join(train_dir, "stream_state_internal"),
            folder=os.path.join(train_dir, folder),
            fname="stream_state_internal.tflite",
            quantize=False,
        )
        auc = rtest.tflite_streaming_model_roc(
            config, folder, data_processor,
        )
        faph, frr = parse_reference_roc(
            os.path.join(train_dir, folder, "tflite_streaming_roc.txt")
        )
        out[which] = {"auc": float(auc), "faph": faph, "frr": frr}
    return out


def run_cross_checks(workdir, ref_root, steps, batch):
    """Disentangles frontend / trainer / evaluator:

    - converts the C-op feature stores to our format and trains OUR trainer
      on them (isolates the trainer: same features as the reference saw);
    - scores the reference's trained TFLite through OUR evaluator (the two
      evaluators must agree on the same model).
    """
    from pathlib import Path

    from microwakeword_tpu.config import derive_config
    from microwakeword_tpu.data.ragged_store import RaggedSpectrogramStore
    from microwakeword_tpu.data.store import FeatureHandler
    from microwakeword_tpu.evaluate import streaming_model_roc
    from microwakeword_tpu.export.tflite import TFLiteStreamingModel
    from microwakeword_tpu.model_train_eval import model_config_from_flags
    from microwakeword_tpu.models import build_model
    from microwakeword_tpu.train import loop as training

    dst_root = os.path.join(workdir, "ref_features_ours_fmt")
    for p in Path(ref_root).glob("**/x_mmap"):
        legacy = RaggedMmapShim(str(p))
        RaggedSpectrogramStore.create(
            str(Path(dst_root) / p.relative_to(ref_root)),
            (np.asarray(legacy[i], np.uint16) for i in range(len(legacy))),
        )

    flags = types.SimpleNamespace(model_name="mixednet", **MODEL_FLAGS)
    cfg = model_config_from_flags(flags)
    out = {}

    # reference model through OUR evaluator
    config = derive_config(
        train_config(dst_root, os.path.join(workdir, "xcheck"), steps, batch), cfg
    )
    bundle = build_model("mixednet", config["model_config"])
    fh = FeatureHandler(config)
    import jax

    dummy = bundle.init(jax.random.PRNGKey(0))
    for which in ("best", "last"):
        path = os.path.join(
            workdir, "run_ref", f"tflite_stream_state_internal_{which}",
            "stream_state_internal.tflite",
        )
        if not os.path.exists(path):
            continue
        runner = TFLiteStreamingModel(path, stride=MODEL_FLAGS["stride"])

        def stream_fn(_vars, x):
            runner.reset()
            return runner.predict_spectrogram(np.asarray(x)[0])

        r = streaming_model_roc(bundle, dummy, fh, config, stream_fn=stream_fn)
        out[f"reference_{which}_through_our_evaluator"] = {
            "auc": float(r["auc"]),
            "frr_at_2faph": frr_at(list(r["x_faph"]), list(r["y_frr"]), 2.0),
        }

    # OUR trainer on the C-op features
    config = derive_config(
        train_config(
            dst_root, os.path.join(workdir, "run_ours_on_ref_feats"), steps, batch
        ),
        cfg,
    )
    bundle = build_model("mixednet", config["model_config"])
    fh = FeatureHandler(config)
    training.train(bundle, config, fh)
    for which in ("best", "last"):
        variables = training.load_weights(
            bundle,
            os.path.join(workdir, "run_ours_on_ref_feats", f"{which}_weights.msgpack"),
        )
        r = streaming_model_roc(bundle, variables, fh, config)
        out[f"ours_on_c_features_{which}"] = {
            "auc": float(r["auc"]),
            "frr_at_2faph": frr_at(list(r["x_faph"]), list(r["y_frr"]), 2.0),
        }
    return out


def parse_reference_roc(path):
    faph, frr = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("Cutoff"):
                parts = line.strip().split(";")
                frr.append(float(parts[0].split("frr=")[1]))
                faph.append(float(parts[1].split("faph=")[1]))
    return faph, frr


def frr_at(faph, frr, anchor):
    """FRR at the largest faph <= anchor (curves are step functions in
    faph, sorted by cutoff -- resort by faph first)."""
    pairs = sorted(zip(faph, frr))
    best = 1.0
    for x, y in pairs:
        if x <= anchor:
            best = min(best, y)
    return best


# --------------------------- main -------------------------------------------
def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--workdir", type=str, default=None)
    ap.add_argument("--cross-check", action="store_true",
                    help="also train our trainer on the C-op features and "
                         "score the reference model through our evaluator")
    ap.add_argument("--jax-cpu", action="store_true",
                    help="run our side on CPU (e.g. when the TPU tunnel is "
                         "flaky); the reference side is always TF CPU")
    args = ap.parse_args()

    if args.jax_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.quick:
        sizes = {
            "clips": {"training": (120, 120), "validation": (40, 40),
                      "testing": (40, 40)},
            "validation_ambient_s": [60.0, 60.0],
            "testing_ambient_s": [120.0, 120.0],
        }
        steps = args.steps or 150
        batch = 32
    else:
        sizes = {
            "clips": {"training": (500, 500), "validation": (150, 150),
                      "testing": (120, 120)},
            "validation_ambient_s": [240.0, 240.0, 240.0],
            "testing_ambient_s": [240.0] * 8,
        }
        steps = args.steps or 500
        batch = 64

    workdir = args.workdir or tempfile.mkdtemp(prefix="roc_parity_")
    print(f"workdir: {workdir}", file=sys.stderr)
    rng = np.random.default_rng(20260819)

    t0 = time.perf_counter()
    data = build_dataset(rng, sizes)
    print(f"audio generated {time.perf_counter()-t0:.0f}s", file=sys.stderr)

    from microwakeword_tpu.data.ragged_store import RaggedSpectrogramStore

    ours_root = os.path.join(workdir, "ours_features")
    write_stores(ours_root, features_ours, data, RaggedSpectrogramStore)
    print(f"our features {time.perf_counter()-t0:.0f}s", file=sys.stderr)
    ref_root = os.path.join(workdir, "ref_features")
    install_shims()
    write_stores(ref_root, features_c_op, data, RaggedMmapShim)
    print(f"C-op features {time.perf_counter()-t0:.0f}s", file=sys.stderr)

    ours = run_ours(ours_root, os.path.join(workdir, "run_ours"), steps, batch)
    print(f"ours trained+evaluated {time.perf_counter()-t0:.0f}s "
          f"(auc best={ours['best']['auc']:.3f} last={ours['last']['auc']:.3f})", file=sys.stderr)
    ref = run_reference(ref_root, os.path.join(workdir, "run_ref"), steps, batch)
    print(f"reference trained+evaluated {time.perf_counter()-t0:.0f}s "
          f"(auc best={ref['best']['auc']:.3f} last={ref['last']['auc']:.3f})", file=sys.stderr)

    anchors = [0.5, 1.0, 2.0]
    report = {
        "task": "synthetic two-chirp wake word vs distractors (TTS-free)",
        "steps": steps,
        "batch": batch,
        "sizes": {k: v for k, v in sizes.items() if k != "clips"}
        | {"clips": {k: list(v) for k, v in sizes["clips"].items()}},
        "ours": ours,
        "reference": ref,
        "frr_at_faph": {
            which: {
                str(a): {
                    "ours": frr_at(ours[which]["faph"], ours[which]["frr"], a),
                    "reference": frr_at(ref[which]["faph"], ref[which]["frr"], a),
                }
                for a in anchors
            }
            for which in ("best", "last")
        },
        "auc_delta_best": ours["best"]["auc"] - ref["best"]["auc"],
        "auc_delta_last": ours["last"]["auc"] - ref["last"]["auc"],
    }
    if args.cross_check:
        report["cross_checks"] = run_cross_checks(workdir, ref_root, steps, batch)
        print(f"cross checks done {time.perf_counter()-t0:.0f}s", file=sys.stderr)
    out = args.out or os.path.join(
        os.path.dirname(__file__), "..", "tests", "golden", "roc_parity_report.json"
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({
        "ours_auc_best": ours["best"]["auc"],
        "ours_auc_last": ours["last"]["auc"],
        "reference_auc_best": ref["best"]["auc"],
        "reference_auc_last": ref["last"]["auc"],
        "frr_at_faph": report["frr_at_faph"],
        "report": os.path.normpath(out),
    }, indent=2))


if __name__ == "__main__":
    main()
