"""CLI entry point: train, convert and evaluate wake-word models.

Mirrors the reference CLI (model_train_eval.py:277-439), including the
per-model subparsers with string-list flags:

    python -m microwakeword_tpu.model_train_eval \
        --training_config=training_parameters.yaml --train 1 \
        mixednet --pointwise_filters "64,64,64,64" --stride 3 ...
"""

from __future__ import annotations

import argparse
import ast
import os

import numpy as np
import yaml


def parse(text):
    """Parses reference-style string flags: '128,128' or '[5], [7,11]'
    (reference mixednet.py:25-40)."""
    if not text:
        return []
    res = ast.literal_eval(str(text))
    if isinstance(res, tuple):
        return list(res)
    return [res]


def add_mixednet_flags(p):
    p.add_argument("--pointwise_filters", type=str, default="48, 48, 48, 48")
    p.add_argument("--residual_connection", type=str, default="0,0,0,0")
    p.add_argument("--repeat_in_block", type=str, default="1,1,1,1")
    p.add_argument(
        "--mixconv_kernel_sizes", type=str, default="[5], [9], [13], [21]"
    )
    p.add_argument("--max_pool", type=int, default=0)
    p.add_argument("--first_conv_filters", type=int, default=32)
    p.add_argument("--first_conv_kernel_size", type=int, default=3)
    p.add_argument("--spatial_attention", type=int, default=0)
    p.add_argument("--pooled", type=int, default=0)
    p.add_argument("--stride", type=int, default=1)


def add_inception_flags(p):
    p.add_argument("--cnn1_filters", type=str, default="24")
    p.add_argument("--cnn1_kernel_sizes", type=str, default="5")
    p.add_argument("--cnn1_subspectral_groups", type=str, default="4")
    p.add_argument("--cnn2_filters1", type=str, default="10,10,16")
    p.add_argument("--cnn2_filters2", type=str, default="10,10,16")
    p.add_argument("--cnn2_kernel_sizes", type=str, default="5,5,5")
    p.add_argument("--cnn2_subspectral_groups", type=str, default="1,1,1")
    p.add_argument("--cnn2_dilation", type=str, default="1,1,1")
    p.add_argument("--dropout", type=float, default=0.2)


def model_config_from_flags(flags):
    from microwakeword_tpu.models import inception as I
    from microwakeword_tpu.models import mixednet as MX

    if flags.model_name == "mixednet":
        ks = parse(flags.mixconv_kernel_sizes)
        ks = tuple(tuple(k) if isinstance(k, (list, tuple)) else (k,) for k in ks)
        return MX.MixedNetConfig(
            pointwise_filters=tuple(parse(flags.pointwise_filters)),
            repeat_in_block=tuple(parse(flags.repeat_in_block)),
            mixconv_kernel_sizes=ks,
            residual_connection=tuple(bool(r) for r in parse(flags.residual_connection)),
            first_conv_filters=flags.first_conv_filters,
            first_conv_kernel_size=flags.first_conv_kernel_size,
            stride=flags.stride,
            max_pool=bool(flags.max_pool),
            pooled=bool(flags.pooled),
            spatial_attention=bool(flags.spatial_attention),
            spectrogram_length=10_000,  # placeholder; derive_config replaces
        )
    if flags.model_name == "inception":
        return I.InceptionConfig(
            cnn1_filters=tuple(parse(flags.cnn1_filters)),
            cnn1_kernel_sizes=tuple(parse(flags.cnn1_kernel_sizes)),
            cnn1_subspectral_groups=tuple(parse(flags.cnn1_subspectral_groups)),
            cnn2_filters1=tuple(parse(flags.cnn2_filters1)),
            cnn2_filters2=tuple(parse(flags.cnn2_filters2)),
            cnn2_kernel_sizes=tuple(parse(flags.cnn2_kernel_sizes)),
            cnn2_subspectral_groups=tuple(parse(flags.cnn2_subspectral_groups)),
            cnn2_dilation=tuple(parse(flags.cnn2_dilation)),
            dropout=flags.dropout,
            spectrogram_length=10_000,
        )
    raise ValueError(f"unknown model {flags.model_name!r}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--training_config", type=str, required=True)
    parser.add_argument("--train", type=int, default=1)
    parser.add_argument("--restore_checkpoint", type=int, default=0)
    parser.add_argument("--use_weights", type=str, default="best_weights")
    parser.add_argument("--test_streaming", type=int, default=1,
                        help="Streamed ambient ROC with the native streaming model")
    parser.add_argument("--test_tf_nonstreaming", type=int, default=0)
    parser.add_argument("--test_tflite_nonstreaming", type=int, default=0)
    parser.add_argument("--test_tflite_nonstreaming_quantized", type=int, default=0)
    parser.add_argument("--test_tflite_streaming", type=int, default=0)
    parser.add_argument("--test_tflite_streaming_quantized", type=int, default=0)
    parser.add_argument("--export_native", type=int, default=1,
                        help="Export train_dir/native/model.mww for the C++ "
                             "streaming runtime (native/src/mww_runtime.cc)")
    parser.add_argument("--test_native_quantized", type=int, default=0,
                        help="Streamed ambient ROC of the exported full-int8 "
                             "native model (native/model_quant.mww) through "
                             "the C++ runtime -- the deployment artifact's "
                             "own quality numbers (requires --export_native)")
    parser.add_argument("--export_stablehlo", type=int, default=1,
                        help="Export train_dir/stablehlo/model.mwwx, a "
                             "portable serialized jax.export artifact "
                             "(export/stablehlo.py)")
    parser.add_argument("--mesh", type=str, default="auto",
                        help="'auto' (DP over all visible devices when >1 "
                             "and batch_size divides), 'off', or an explicit "
                             "device count")
    sub = parser.add_subparsers(dest="model_name", required=True)
    add_mixednet_flags(sub.add_parser("mixednet"))
    add_inception_flags(sub.add_parser("inception"))
    flags = parser.parse_args(argv)

    from microwakeword_tpu.config import load_config
    from microwakeword_tpu.data.store import FeatureHandler
    from microwakeword_tpu.models import build_model
    from microwakeword_tpu.train import loop as training

    model_cfg = model_config_from_flags(flags)
    config = load_config(flags.training_config, model_cfg)
    config["flags"] = vars(flags)
    bundle = build_model(flags.model_name, config["model_config"])

    feature_handler = FeatureHandler(config)

    # Production mesh: DP over every visible chip (jax.distributed is
    # initialized by the pod launcher on multi-host; single host this is
    # the local devices).  The reference is single-process (train.py:295).
    from microwakeword_tpu.parallel import auto_mesh, create_mesh
    from microwakeword_tpu.parallel.mesh import initialize_distributed

    initialize_distributed()
    if flags.mesh == "off":
        mesh = None
    elif flags.mesh == "auto":
        mesh = auto_mesh(int(config.get("batch_size", 128)))
    else:
        mesh = create_mesh(int(flags.mesh))
    if mesh is not None:
        print(f"mesh: {mesh.shape}")

    train_dir = config["train_dir"]
    if flags.train:
        os.makedirs(train_dir, exist_ok=True)
        with open(os.path.join(train_dir, "training_config.yaml"), "w") as f:
            dump = {k: v for k, v in config.items() if k != "model_config"}
            yaml.safe_dump(dump, f, default_flow_style=False)
        variables, _ = training.train(
            bundle, config, feature_handler,
            restore_checkpoint=bool(flags.restore_checkpoint),
            mesh=mesh,
        )
    elif not os.path.isdir(train_dir):
        raise ValueError('model is not trained; set "--train 1" and retrain')

    weights_path = os.path.join(train_dir, flags.use_weights + ".msgpack")
    variables = training.load_weights(bundle, weights_path)

    if flags.test_streaming and feature_handler.get_mode_size("testing_ambient"):
        from microwakeword_tpu.evaluate import streaming_model_roc

        result = streaming_model_roc(
            bundle, variables, feature_handler, config,
            folder=os.path.join(train_dir, "streaming"),
            accuracy_name="streaming_roc.txt",
            mesh=mesh,
        )
        print(f"streaming ROC AUC: {result['auc']:.5f}")

    if flags.test_tf_nonstreaming and feature_handler.get_mode_size("testing"):
        from microwakeword_tpu.evaluate import model_accuracy

        metrics = model_accuracy(
            bundle, variables, feature_handler, config,
            data_set="testing",
            folder=os.path.join(train_dir, "non_stream"),
            accuracy_name="testing_set_metrics.txt",
        )
        print(f"nonstreaming accuracy: {metrics['accuracy']:.4%}")

    if flags.export_native:
        from microwakeword_tpu.export.native_runtime import export_model

        native_dir = os.path.join(train_dir, "native")
        os.makedirs(native_dir, exist_ok=True)
        native_path = os.path.join(native_dir, "model.mww")
        export_model(bundle, variables, native_path)
        print(f"native streaming model: {native_path}")
        try:
            # full-int8 variant, calibrated like the TFLite representative
            # dataset (training spectrograms, reference utils.py:303-325)
            calib, _, _ = feature_handler.get_data(
                "training", batch_size=200,
                features_length=config["spectrogram_length"],
                truncation_strategy="default",
            )
            quant_path = os.path.join(native_dir, "model_quant.mww")
            export_model(bundle, variables, quant_path, quantize=True,
                         calibration=calib)
            print(f"native int8 streaming model: {quant_path}")
        except ValueError as e:
            # e.g. spatial_attention has no int8 form, or the exporter's
            # folded-simulator self-check tripped (raises ValueError): skip
            # the quant artifact rather than aborting a run whose training
            # already succeeded
            print(f"native int8 export skipped: {e}")

    if (flags.test_native_quantized and flags.export_native
            and os.path.exists(os.path.join(train_dir, "native",
                                            "model_quant.mww"))
            and feature_handler.get_mode_size("testing_ambient")):
        from microwakeword_tpu.evaluate import streaming_model_roc
        from microwakeword_tpu.native import StreamingRuntime

        runner = StreamingRuntime(
            os.path.join(train_dir, "native", "model_quant.mww"))

        def native_stream_fn(_vars, x):
            runner.reset()
            return runner.predict_spectrogram(np.asarray(x)[0])

        result = streaming_model_roc(
            bundle, variables, feature_handler, config,
            folder=os.path.join(train_dir, "native"),
            accuracy_name="quantized_streaming_roc.txt",
            stream_fn=native_stream_fn,
        )
        print(f"native int8 streaming ROC AUC: {result['auc']:.5f}")

    if flags.export_stablehlo:
        from microwakeword_tpu.export.stablehlo import export_streaming

        hlo_dir = os.path.join(train_dir, "stablehlo")
        os.makedirs(hlo_dir, exist_ok=True)
        hlo_path = os.path.join(hlo_dir, "model.mwwx")
        try:
            export_streaming(bundle, variables, hlo_path)
            print(f"stablehlo model: {hlo_path}")
        except ValueError as e:
            # e.g. spatial_attention without pooling has no streaming form
            print(f"stablehlo export skipped: {e}")

    tflite_runs = []  # (quantize, streaming) per requested artifact
    if flags.test_tflite_streaming:
        tflite_runs.append((False, True))
    if flags.test_tflite_streaming_quantized:
        tflite_runs.append((True, True))
    if flags.test_tflite_nonstreaming:
        tflite_runs.append((False, False))
    if flags.test_tflite_nonstreaming_quantized:
        tflite_runs.append((True, False))
    if tflite_runs:
        from microwakeword_tpu.export.tflite import export_and_evaluate_tflite

        for quantize, streaming in tflite_runs:
            export_and_evaluate_tflite(
                bundle,
                variables,
                feature_handler,
                config,
                train_dir,
                quantize=quantize,
                streaming=streaming,
            )


if __name__ == "__main__":
    main()
