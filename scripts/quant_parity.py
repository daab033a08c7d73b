"""Quantized-artifact cross-framework parity study (VERDICT r3 item 4).

The r3 ROC parity study compared FLOAT trainers; the deployment artifacts
are int8.  This study measures, per framework, the float->int8 streamed-ROC
degradation of the *best* checkpoint on the same synthetic dataset:

- ``ref``:   reference best checkpoint -> its int8 TFLite
             (utils.py:289-348: int8 builtins, variable quantization,
             representative data pinned to [0, 26]) scored by its own
             streamed-ROC evaluator (test.py:293-403),
             vs its float TFLite from the same checkpoint.
- ``ours``:  our best checkpoint -> (a) our int8 TFLite and (b) our
             full-int8 native ``.mww`` v3, both scored by our evaluator,
             vs our float (jax) streamed ROC from the same checkpoint.

Training runs are produced by (and shared with) scripts/roc_parity.py's
resumable per-seed driver -- this script invokes it for any missing seeds,
then adds the quantized arms.  Pass criterion per metric (lower is
better, applied to DEGRADATION = int8 - float): ours passes iff its mean
degradation is not worse, or 95% CIs overlap, or |delta| < 0.5 pooled std
-- the same criterion as the float study.  The reference's README claim
(README.md:31 "typically no reduction in accuracy") is the bar both
frameworks are held to.

Run:  python scripts/quant_parity.py --seeds 5 --workdir /tmp/qp
      python scripts/quant_parity.py --quick --seeds 2   # smoke
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
import types

import numpy as np

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _SCRIPTS)
sys.path.insert(0, os.path.dirname(_SCRIPTS))

import roc_parity as RP  # noqa: E402


# --------------------------- quantized arms --------------------------------
def quant_ours(workdir, seed, steps, batch):
    """Our best checkpoint -> int8 TFLite + int8 native .mww, streamed ROC
    for each through our evaluator (+ the float jax ROC is reused from the
    float study's per-seed record)."""
    from microwakeword_tpu.config import derive_config
    from microwakeword_tpu.data.store import FeatureHandler
    from microwakeword_tpu.evaluate import streaming_model_roc
    from microwakeword_tpu.export.tflite import (
        TFLiteStreamingModel,
        build_tf_streaming,
        convert_to_tflite,
        representative_dataset,
    )
    from microwakeword_tpu.model_train_eval import model_config_from_flags
    from microwakeword_tpu.models import build_model
    from microwakeword_tpu.train import loop as training

    root = os.path.join(workdir, "ours_features")
    train_dir = os.path.join(workdir, "runs", f"ours_{seed}")
    flags = types.SimpleNamespace(model_name="mixednet", **RP.MODEL_FLAGS)
    model_cfg = model_config_from_flags(flags)
    config = derive_config(
        RP.train_config(root, train_dir, steps, batch, seed=seed), model_cfg
    )
    bundle = build_model("mixednet", config["model_config"])
    fh = FeatureHandler(config)
    variables = training.load_weights(
        bundle, os.path.join(train_dir, "best_weights.msgpack")
    )

    out = {}
    # (a) int8 TFLite (the reference's deployment artifact shape)
    module = build_tf_streaming(
        bundle.name, bundle.config, variables["params"],
        variables["batch_stats"], streaming=True,
    )
    rep = representative_dataset(fh, config, streaming=True)
    tfl_path = convert_to_tflite(
        module,
        os.path.join(train_dir, "tflite_quant_parity", "stream_quant.tflite"),
        quantize=True, representative_gen=rep,
    )
    runner = TFLiteStreamingModel(tfl_path, stride=config.get("stride", 1))

    def tfl_stream_fn(_vars, x):
        runner.reset()
        return runner.predict_spectrogram(np.asarray(x)[0])

    r = streaming_model_roc(bundle, variables, fh, config,
                            stream_fn=tfl_stream_fn)
    out["tflite_int8"] = _roc_record(r)

    # (b) full-int8 native .mww v3
    from microwakeword_tpu import native as N
    from microwakeword_tpu.export.native_runtime import export_model

    if N.available():
        calib, _, _ = fh.get_data(
            "training", batch_size=200,
            features_length=config["spectrogram_length"],
            truncation_strategy="default",
        )
        mww_path = os.path.join(train_dir, "native", "quant_parity.mww")
        os.makedirs(os.path.dirname(mww_path), exist_ok=True)
        export_model(bundle, variables, mww_path, quantize=True,
                     calibration=calib)
        rt = N.StreamingRuntime(mww_path)

        def mww_stream_fn(_vars, x):
            rt.reset()
            return rt.predict_spectrogram(
                np.asarray(x, np.float32)[0]
            )

        r = streaming_model_roc(bundle, variables, fh, config,
                                stream_fn=mww_stream_fn)
        out["native_int8"] = _roc_record(r)
    return out


def quant_ref(workdir, seed, steps, batch):
    """Reference best checkpoint -> its int8 TFLite -> its own streamed-ROC
    evaluator (the exact deployment pipeline, utils.py:289-348 +
    test.py:293-403)."""
    RP.install_shims()
    from microwakeword import mixednet as rmixednet
    from microwakeword import data as rdata
    from microwakeword import test as rtest
    from microwakeword import utils as rutils
    from microwakeword.layers import modes as rmodes

    root = os.path.join(workdir, "ref_features")
    train_dir = os.path.join(workdir, "runs", f"ref_{seed}")
    flags = types.SimpleNamespace(**RP.MODEL_FLAGS)
    dropped = rmixednet.spectrogram_slices_dropped(flags)
    stride = RP.MODEL_FLAGS["stride"]
    final = 1 + (16 * 1500 - 480) // (stride * 16 * 10)
    length = final + dropped
    config = RP.train_config(root, train_dir, steps, batch, seed=seed)
    config["spectrogram_length_final_layer"] = final
    config["spectrogram_length"] = length
    config["stride"] = stride
    config["training_input_shape"] = (length, 40)

    data_processor = rdata.FeatureHandler(config)
    eval_model = rmixednet.model(flags, (length, 40), 1)
    eval_model.load_weights(os.path.join(train_dir, "best_weights.weights.h5"))
    rutils.convert_model_saved(
        eval_model, config, "stream_state_internal",
        rmodes.Modes.STREAM_INTERNAL_STATE_INFERENCE,
    )
    folder = "tflite_stream_quant_parity"
    rutils.convert_saved_model_to_tflite(
        config,
        audio_processor=data_processor,
        path_to_model=os.path.join(train_dir, "stream_state_internal"),
        folder=os.path.join(train_dir, folder),
        fname="stream_state_internal.tflite",
        quantize=True,
    )
    auc = rtest.tflite_streaming_model_roc(config, folder, data_processor)
    faph, frr = RP.parse_reference_roc(
        os.path.join(train_dir, folder, "tflite_streaming_roc.txt")
    )
    return {"tflite_int8": {"auc": float(auc), "faph": faph, "frr": frr}}


def _roc_record(r):
    return {
        "auc": float(r["auc"]),
        "faph": [float(v) for v in r["x_faph"]],
        "frr": [float(v) for v in r["y_frr"]],
    }


def _metrics(rec):
    return {
        "auc": rec["auc"],
        "frr_at_2faph": RP.frr_at(rec["faph"], rec["frr"], 2.0),
    }


def run_quant_one(arm, seed, workdir, steps, batch):
    res_dir = os.path.join(workdir, "seed_results")
    out_path = os.path.join(res_dir, f"quant_{arm}_{seed}.json")
    if os.path.exists(out_path):
        return out_path
    result = (quant_ours if arm == "ours" else quant_ref)(
        workdir, seed, steps, batch
    )
    record = {"arm": arm, "seed": seed}
    for name, rec in result.items():
        record[name] = _metrics(rec)
    with open(out_path, "w") as f:
        json.dump(record, f, indent=2)
    return out_path


# --------------------------- aggregation -----------------------------------
def aggregate(workdir, seeds, out_path, design):
    res = os.path.join(workdir, "seed_results")

    def load(pattern):
        out = {}
        for seed in seeds:
            p = os.path.join(res, pattern.format(seed=seed))
            if os.path.exists(p):
                with open(p) as f:
                    out[seed] = json.load(f)
        return out

    flt = {"ours": load("ours_{seed}.json"), "ref": load("ref_{seed}.json")}
    qnt = {"ours": load("quant_ours_{seed}.json"),
           "ref": load("quant_ref_{seed}.json")}

    def degradation(arm, artifact, metric):
        """per-seed int8-minus-float for seeds present in both records."""
        vals = []
        for seed in seeds:
            f, q = flt[arm].get(seed), qnt[arm].get(seed)
            if not f or not q or artifact not in q:
                continue
            base = (f["best"]["frr_at_faph"]["2.0"]
                    if metric == "frr_at_2faph" else f["best"]["auc"])
            vals.append(q[artifact][metric] - base)
        return vals

    metrics = {}
    for metric in ("frr_at_2faph", "auc"):
        ref_deg = degradation("ref", "tflite_int8", metric)
        metrics[f"degradation_{metric}"] = {
            "ours_tflite_int8_vs_ref_tflite_int8": RP._compare(
                degradation("ours", "tflite_int8", metric), ref_deg
            ),
            "ours_native_int8_vs_ref_tflite_int8": RP._compare(
                degradation("ours", "native_int8", metric), ref_deg
            ),
        }
        # absolute int8 quality head-to-head (not just degradation)
        metrics[f"absolute_int8_{metric}"] = {
            "ours_tflite_int8_vs_ref_tflite_int8": RP._compare(
                [q["tflite_int8"][metric] for q in qnt["ours"].values()
                 if "tflite_int8" in q],
                [q["tflite_int8"][metric] for q in qnt["ref"].values()
                 if "tflite_int8" in q],
            ),
            "ours_native_int8_vs_ref_tflite_int8": RP._compare(
                [q["native_int8"][metric] for q in qnt["ours"].values()
                 if "native_int8" in q],
                [q["tflite_int8"][metric] for q in qnt["ref"].values()
                 if "tflite_int8" in q],
            ),
        }

    def _all(comp):
        return all(m[comp]["pass"] for m in metrics.values() if comp in m)

    report = {
        "what": "float->int8 streamed-ROC degradation of the best "
                "checkpoint, per framework, same synthetic dataset/seeds "
                "as the float ROC parity study",
        "design": design,
        "pass_criterion": (
            "per metric on DEGRADATION (int8 - float, lower better) and on "
            "absolute int8 quality: pass iff ours' mean not worse OR 95% "
            "CIs overlap OR |delta| < 0.5 * pooled std"
        ),
        "parity": {
            "tflite_int8": _all("ours_tflite_int8_vs_ref_tflite_int8"),
            "native_int8": _all("ours_native_int8_vs_ref_tflite_int8"),
        },
        "metrics": metrics,
        "per_seed": {
            "ours": list(qnt["ours"].values()),
            "ref": list(qnt["ref"].values()),
        },
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    return report


# --------------------------- driver ----------------------------------------
def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--workdir", type=str, default=None)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--run-quant-one", type=str, default=None,
                    choices=("ours", "ref"))
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--jax-cpu", action="store_true")
    ap.add_argument("--seed-timeout", type=float, default=1800.0)
    args = ap.parse_args()

    steps = args.steps or (300 if args.quick else 3000)
    batch = 32 if args.quick else 64

    if args.jax_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.run_quant_one:
        assert args.workdir
        print(run_quant_one(args.run_quant_one, args.seed, args.workdir,
                            steps, batch))
        return

    workdir = args.workdir or tempfile.mkdtemp(prefix="quant_parity_")
    print(f"workdir: {workdir}", file=sys.stderr)
    seeds = list(range(1, args.seeds + 1))

    # phase 1: float training runs (resumable, shared with roc_parity)
    rp = os.path.join(_SCRIPTS, "roc_parity.py")
    if not os.path.exists(os.path.join(workdir, ".features_done")):
        r = subprocess.run(
            [sys.executable, rp, "--build-features", "--workdir", workdir]
            + (["--quick"] if args.quick else []),
            capture_output=True, text=True,
        )
        if r.returncode != 0:
            print(r.stderr[-3000:], file=sys.stderr)
            raise RuntimeError("feature build failed")
    t0 = time.perf_counter()
    for seed in seeds:
        for arm in ("ref", "ours"):
            done = os.path.join(workdir, "seed_results", f"{arm}_{seed}.json")
            if os.path.exists(done):
                continue
            cmd = [sys.executable, rp, "--run-one", arm, "--seed", str(seed),
                   "--workdir", workdir, "--steps", str(steps)]
            if args.quick:
                cmd.append("--quick")
            if args.jax_cpu:
                cmd.append("--jax-cpu")
            try:
                r = subprocess.run(cmd, capture_output=True, text=True,
                                   timeout=args.seed_timeout)
            except subprocess.TimeoutExpired:
                r = subprocess.CompletedProcess(cmd, -9, "", "timeout")
            if r.returncode != 0 and arm == "ours" and not args.jax_cpu:
                r = subprocess.run(cmd + ["--jax-cpu"], capture_output=True,
                                   text=True, timeout=args.seed_timeout)
            status = "done" if r.returncode == 0 else f"FAILED: {r.stderr[-400:]}"
            print(f"[float {arm} seed {seed}] {status} "
                  f"({time.perf_counter()-t0:.0f}s)", file=sys.stderr)

    # phase 2: quantized arms (subprocess per seed; resumable)
    me = os.path.abspath(__file__)
    for seed in seeds:
        for arm in ("ref", "ours"):
            done = os.path.join(workdir, "seed_results",
                                f"quant_{arm}_{seed}.json")
            if os.path.exists(done):
                continue
            if not os.path.exists(os.path.join(
                    workdir, "seed_results", f"{arm}_{seed}.json")):
                continue  # float run failed; skip
            cmd = [sys.executable, me, "--run-quant-one", arm,
                   "--seed", str(seed), "--workdir", workdir,
                   "--steps", str(steps)]
            if args.quick:
                cmd.append("--quick")
            if args.jax_cpu:
                cmd.append("--jax-cpu")
            try:
                r = subprocess.run(cmd, capture_output=True, text=True,
                                   timeout=args.seed_timeout)
            except subprocess.TimeoutExpired:
                r = subprocess.CompletedProcess(cmd, -9, "", "timeout")
            if r.returncode != 0 and arm == "ours" and not args.jax_cpu:
                r = subprocess.run(cmd + ["--jax-cpu"], capture_output=True,
                                   text=True, timeout=args.seed_timeout)
            status = "done" if r.returncode == 0 else f"FAILED: {r.stderr[-400:]}"
            print(f"[quant {arm} seed {seed}] {status} "
                  f"({time.perf_counter()-t0:.0f}s)", file=sys.stderr)

    out = args.out or os.path.join(
        os.path.dirname(__file__), "..", "tests", "golden",
        "quant_parity_report.json",
    )
    design = {
        "steps": steps, "batch": batch, "seeds_per_arm": len(seeds),
        "checkpoint": "best",
        "arms": {
            "ref": "reference int8 TFLite (utils.py:289-348) scored by its "
                   "streamed-ROC evaluator",
            "ours": "our int8 TFLite + full-int8 native .mww v3, scored by "
                    "our evaluator",
        },
    }
    report = aggregate(workdir, seeds, os.path.normpath(out), design)
    print(json.dumps({
        "parity": report["parity"],
        "degradation_frr_at_2faph": {
            k: {"ours_mean": v["ours"]["mean"], "ref_mean": v["reference"]["mean"],
                "pass": v["pass"]}
            for k, v in report["metrics"]["degradation_frr_at_2faph"].items()
            if "error" not in v
        },
        "report": os.path.normpath(out),
    }, indent=2))


if __name__ == "__main__":
    main()
