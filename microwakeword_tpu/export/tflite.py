"""Streaming TFLite export (the reference's deployment artifact).

Replaces the reference's Keras graph-surgery -> SavedModel -> TFLite chain
(utils.py:148-348) with a direct builder: the trained JAX params are laid
into a hand-built TF streaming graph whose ring buffers are tf.Variables,
using only TFLM-supported ops (CONV_2D, DEPTHWISE_CONV_2D, FULLY_CONNECTED,
CONCAT, STRIDED_SLICE, MUL/ADD, LOGISTIC, VAR_HANDLE/READ/ASSIGN) -- the
same op set the reference's exports use for ESPHome/ESP32 deployment.

BatchNorm layers are folded into the preceding 1x1 convs at export time
(exact algebra; verified by the parity tests in tests/test_export.py).

Quantization follows the reference exactly (utils.py:289-348): full-int8
(int8 inputs / uint8 outputs), quantized ring-buffer variables, and a
representative dataset of training spectrograms chopped into (stride, 40)
steps with pixels pinned to the frontend range 0.0 / 26.0.
"""

from __future__ import annotations

import os

import numpy as np

from microwakeword_tpu.models.mixednet import MixedNetConfig, tail_length


def _bn_fold(bn_params, bn_stats, eps=1e-3):
    """Returns (scale, offset) so that BN(x) = x * scale + offset."""
    # our BatchNorm module wraps flax nn.BatchNorm -> one nesting level
    bn_params = bn_params["BatchNorm_0"]
    bn_stats = bn_stats["BatchNorm_0"]
    gamma = np.asarray(bn_params["scale"], np.float32)
    beta = np.asarray(bn_params["bias"], np.float32)
    mean = np.asarray(bn_stats["mean"], np.float32)
    var = np.asarray(bn_stats["var"], np.float32)
    s = gamma / np.sqrt(var + eps)
    return s, beta - s * mean


def _mixconv_mask(kernel_sizes, channels):
    from microwakeword_tpu.models.layers import MixConv

    kmax = max(kernel_sizes)
    splits = MixConv.split_channels(channels, len(kernel_sizes))
    mask = np.zeros((kmax, channels), np.float32)
    start = 0
    for width, k in zip(splits, kernel_sizes):
        mask[kmax - k :, start : start + width] = 1.0
        start += width
    return mask


def build_tf_streaming_mixednet(cfg: MixedNetConfig, params, batch_stats,
                                streaming: bool = True):
    """Builds a tf.Module running the MixedNet in streaming mode (input
    [1, stride, 40], ring buffers as internal tf.Variables) or non-streaming
    mode (input [1, spectrogram_length, 40])."""
    import tensorflow as tf

    p = params
    bs = batch_stats
    dtype = tf.float32

    mod = tf.Module()
    mod.ring_vars = []
    conv_idx, mix_idx, pw_idx, bn_idx = 0, 0, 0, 0

    # ---- gather per-layer constants in model order -------------------
    layers = []
    in_ch = 40
    if cfg.first_conv_filters > 0:
        kernel = np.asarray(p[f"StreamConv_{conv_idx}"]["kernel"], np.float32)
        conv_idx += 1
        layers.append(("first_conv", kernel))
        in_ch = cfg.first_conv_filters

    for filters, repeat, ksizes, res in zip(
        cfg.pointwise_filters,
        cfg.repeat_in_block,
        cfg.mixconv_kernel_sizes,
        cfg.residual_connection,
    ):
        block = {"repeats": [], "residual": None}
        if res:
            w = np.asarray(p[f"PointwiseConv_{pw_idx}"]["kernel"], np.float32)
            pw_idx += 1
            s, b = _bn_fold(p[f"BatchNorm_{bn_idx}"], bs[f"BatchNorm_{bn_idx}"])
            bn_idx += 1
            block["residual"] = (w * s[None, :], b)
        for _ in range(repeat):
            entry = {}
            if max(ksizes) > 1:
                dw = np.asarray(p[f"MixConv_{mix_idx}"]["kernel"], np.float32)
                mix_idx += 1
                dw = dw * _mixconv_mask(ksizes, in_ch)[:, None, :]
                entry["mixconv"] = dw  # [kmax, 1, C]
            w = np.asarray(p[f"PointwiseConv_{pw_idx}"]["kernel"], np.float32)
            pw_idx += 1
            s, b = _bn_fold(p[f"BatchNorm_{bn_idx}"], bs[f"BatchNorm_{bn_idx}"])
            bn_idx += 1
            entry["pointwise"] = (w * s[None, :], b)
            block["repeats"].append(entry)
            in_ch = filters
        layers.append(("block", block))

    dense_kernel = np.asarray(p["Dense_0"]["kernel"], np.float32)
    dense_bias = np.asarray(p["Dense_0"]["bias"], np.float32)
    t_tail = tail_length(cfg)

    att_kernel = None
    if cfg.spatial_attention and t_tail > 1:
        if streaming and not cfg.pooled:
            # same constraint (and message) as export/native_runtime.py:
            # streaming attention gates only the newest frame, so a
            # non-pooled flatten would mismatch the trained Dense shape
            raise ValueError("spatial_attention requires pooled=True for streaming")
        att_kernel = np.asarray(
            p["SpatialAttention_0"]["StreamConv_0"]["kernel"], np.float32
        )  # [k, 2, 1]

    # ---- pre-create ring-buffer variables (static sizes) --------------
    from microwakeword_tpu.models.layers import conv_ring_size

    ring_specs = []  # (frames, channels) in consumption order
    if streaming:
        ch = 40
        for kind, payload in layers:
            if kind == "first_conv":
                k = payload.shape[0]
                ring = conv_ring_size(k, cfg.stride)
                if ring > 0:
                    ring_specs.append((ring, payload.shape[1]))
                ch = payload.shape[-1]
            else:
                for entry in payload["repeats"]:
                    if "mixconv" in entry:
                        kmax = entry["mixconv"].shape[0]
                        if kmax > 1:
                            ring_specs.append((kmax - 1, entry["mixconv"].shape[2]))
                    ch = entry["pointwise"][0].shape[-1]
        if att_kernel is not None and att_kernel.shape[0] > 1:
            # attention replaces the tail window: ring of (mean, max)
            # pooled frames; only the newest (gated) frame feeds Dense
            # (models/mixednet.py SpatialAttention streaming semantics)
            ring_specs.append((att_kernel.shape[0] - 1, 2))
        elif t_tail > 1:
            tail_in = 1  # streaming blocks emit one frame per step
            ring_specs.append((t_tail - tail_in, ch))
        for i, (frames, channels) in enumerate(ring_specs):
            mod.ring_vars.append(
                tf.Variable(
                    tf.zeros([1, frames, 1, channels], dtype),
                    trainable=False,
                    name=f"ring_{i}",
                )
            )

    def forward(x):
        # x: [1, T, 1, 40]
        net = x
        ring_iter = iter(mod.ring_vars)
        for kind, payload in layers:
            if kind == "first_conv":
                kernel = payload  # [k, in, out]
                k = kernel.shape[0]
                ring = conv_ring_size(k, cfg.stride)
                if streaming and ring > 0:
                    v = next(ring_iter)
                    mem = tf.concat([v, net], axis=1)
                    assign = v.assign(mem[:, -ring:])
                    with tf.control_dependencies([assign]):
                        net = tf.identity(mem)
                net = tf.nn.conv2d(
                    net,
                    kernel[:, None, :, :],
                    strides=[1, cfg.stride, 1, 1],
                    padding="VALID",
                )
                net = tf.nn.relu(net)
            else:
                block = payload
                if block["residual"] is not None:
                    w, b = block["residual"]
                    residual = tf.nn.conv2d(
                        net, w[None, None, :, :], strides=1, padding="VALID"
                    ) + b
                for entry in block["repeats"]:
                    if "mixconv" in entry:
                        dw = entry["mixconv"]  # [kmax, 1, C]
                        kmax = dw.shape[0]
                        ch = dw.shape[2]
                        if streaming and kmax > 1:
                            v = next(ring_iter)
                            mem = tf.concat([v, net], axis=1)
                            assign = v.assign(mem[:, -(kmax - 1):])
                            with tf.control_dependencies([assign]):
                                net = tf.identity(mem)
                        net = tf.nn.depthwise_conv2d(
                            net,
                            dw[:, :, :, None],  # [kmax, 1, C, 1]
                            strides=[1, 1, 1, 1],
                            padding="VALID",
                        )
                    w, b = entry["pointwise"]
                    net = tf.nn.conv2d(
                        net, w[None, None, :, :], strides=1, padding="VALID"
                    ) + b
                    if block["residual"] is not None:
                        drop = residual.shape[1] - net.shape[1]
                        residual = residual[:, drop:] if drop > 0 else residual
                        net = net + residual
                    net = tf.nn.relu(net)

        if t_tail > 1 and att_kernel is not None:
            # CBAM spatial attention (models/mixednet.py SpatialAttention):
            # att = sigmoid(conv_k over per-frame (mean, max) channel
            # pools); gates the trailing frames (streaming: the newest one)
            pooled = tf.stack(
                [tf.reduce_mean(net, axis=-1), tf.reduce_max(net, axis=-1)],
                axis=-1,
            )  # [1, T, 1, 2]
            if streaming and att_kernel.shape[0] > 1:
                # k == 1 needs no ring (and its spec is skipped above --
                # mem[:, -(k-1):] would degenerate to the full tensor)
                v = next(ring_iter)
                mem = tf.concat([v, pooled], axis=1)  # [1, k, 1, 2]
                assign = v.assign(mem[:, -(att_kernel.shape[0] - 1):])
                with tf.control_dependencies([assign]):
                    pooled = tf.identity(mem)
            att = tf.sigmoid(
                tf.nn.conv2d(
                    pooled, att_kernel[:, None, :, :], strides=1,
                    padding="VALID",
                )
            )  # [1, T-k+1, 1, 1] (streaming: [1, 1, 1, 1])
            t_att = att.shape[1]
            net = net[:, -t_att:] * att
            if cfg.pooled:
                # pool over the gated window (t_att frames; streaming: 1,
                # where pooling is the identity)
                if cfg.max_pool:
                    net = tf.reduce_max(net, axis=1, keepdims=True)
                else:
                    net = tf.reduce_mean(net, axis=1, keepdims=True)
        elif t_tail > 1:
            if streaming:
                ring = t_tail - net.shape[1]
                v = next(ring_iter)
                mem = tf.concat([v, net], axis=1)
                assign = v.assign(mem[:, -ring:])
                with tf.control_dependencies([assign]):
                    net = tf.identity(mem)
            if cfg.pooled:
                if cfg.max_pool:
                    net = tf.nn.max_pool2d(net, [t_tail, 1], [t_tail, 1], "VALID")
                else:
                    net = tf.nn.avg_pool2d(net, [t_tail, 1], [t_tail, 1], "VALID")
        net = tf.reshape(net, [1, -1])
        logits = tf.matmul(net, dense_kernel) + dense_bias
        return tf.sigmoid(logits)

    import tensorflow as tf

    t_in = cfg.stride if streaming else cfg.spectrogram_length
    mod.forward = tf.function(
        lambda x: forward(tf.reshape(x, [1, t_in, 1, 40])),
        input_signature=[tf.TensorSpec([1, t_in, 40], dtype, name="input")],
    )
    # trace once to create variables
    mod.forward.get_concrete_function()
    return mod


def _ssn_fold(ssn_params, ssn_stats, channels: int, eps=1e-3):
    """Folds SubSpectralNorm into per-channel (scale, offset).

    Our SubSpectralNorm normalizes the reshaped [B,T,C/g,g] over a g-sized
    feature axis (models/layers.py SubSpectralNorm): channel c uses BN
    parameter index c % g, so the per-channel fold tiles the g-vector.
    """
    bn_p = ssn_params["BatchNorm_0"]
    bn_s = ssn_stats["BatchNorm_0"]
    gamma = np.asarray(bn_p["scale"], np.float32)
    beta = np.asarray(bn_p["bias"], np.float32)
    mean = np.asarray(bn_s["mean"], np.float32)
    var = np.asarray(bn_s["var"], np.float32)
    s = gamma / np.sqrt(var + eps)
    b = beta - s * mean
    g = s.shape[0]
    reps = channels // g
    return np.tile(s, reps), np.tile(b, reps)


def build_tf_streaming_inception(cfg, params, batch_stats, streaming: bool = True):
    """Builds a tf.Module running the Inception model in streaming mode
    (input [1, 1, 40], per-conv ring buffers as tf.Variables) or
    non-streaming mode (input [1, spectrogram_length, 40]).

    Mirrors models/inception.py exactly: valid (dilated) time convs with
    SubSpectralNorm folded in, branch outputs aligned by dropping leading
    frames (reference StridedDrop semantics, strided_drop.py:40-44), a
    tail window ring buffer, then Dense + sigmoid.
    """
    import tensorflow as tf

    from microwakeword_tpu.models.inception import tail_length

    dtype = tf.float32
    mod = tf.Module()
    mod.ring_vars = []

    # ---- gather folded constants in flax module order -----------------
    # ConvBnRelu_i submodules: PointwiseConv_0 or StreamConv_0 + SubSpectralNorm_0
    def conv_bn(idx: int):
        p = params[f"ConvBnRelu_{idx}"]
        s = batch_stats[f"ConvBnRelu_{idx}"]
        if "PointwiseConv_0" in p:
            kernel = np.asarray(p["PointwiseConv_0"]["kernel"], np.float32)
            kernel = kernel[None, :, :]  # [1, in, out]
            dilation = 1
        else:
            kernel = np.asarray(p["StreamConv_0"]["kernel"], np.float32)
            dilation = None  # caller supplies
        scale, offset = _ssn_fold(
            p["SubSpectralNorm_0"], s["SubSpectralNorm_0"], kernel.shape[-1]
        )
        return kernel * scale[None, None, :], offset, kernel.shape[0]

    # Layer program: list of ops applied in order, with branch structure.
    idx = 0
    cnn1 = []
    for _f, _k, _g in zip(
        cfg.cnn1_filters, cfg.cnn1_kernel_sizes, cfg.cnn1_subspectral_groups
    ):
        kernel, offset, k = conv_bn(idx)
        idx += 1
        cnn1.append((kernel, offset, 1))
    blocks = []
    for _f1, _f2, _k, _g, dil in zip(
        cfg.cnn2_filters1,
        cfg.cnn2_filters2,
        cfg.cnn2_kernel_sizes,
        cfg.cnn2_subspectral_groups,
        cfg.cnn2_dilation,
    ):
        # creation order in models/inception.py: b1(1x1), b2(1x1), b2(k),
        # b3(1x1), b3(k), b3(k), then post-concat 1x1
        entries = []
        for _ in range(7):
            kernel, offset, k = conv_bn(idx)
            idx += 1
            entries.append((kernel, offset, dil))
        blocks.append(entries)

    dense_kernel = np.asarray(params["Dense_0"]["kernel"], np.float32)
    dense_bias = np.asarray(params["Dense_0"]["bias"], np.float32)
    t_tail = tail_length(cfg)

    # ---- pre-create ring-buffer variables (creation = consumption order)
    if streaming:
        specs = []

        def conv_ring(kernel, dil):
            k = kernel.shape[0]
            ring = dil * (k - 1)
            if ring > 0:
                specs.append((ring, kernel.shape[1]))

        for kernel, _o, dil in cnn1:
            conv_ring(kernel, dil)
        for entries in blocks:
            for kernel, _o, dil in entries[:6]:
                conv_ring(kernel, dil)
        if t_tail > 1:
            ch = blocks[-1][6][0].shape[-1] if blocks else cnn1[-1][0].shape[-1]
            specs.append((t_tail - 1, ch))
        for i, (frames, channels) in enumerate(specs):
            mod.ring_vars.append(
                tf.Variable(
                    tf.zeros([1, frames, 1, channels], dtype),
                    trainable=False,
                    name=f"ring_{i}",
                )
            )

    def apply_conv(net, kernel, offset, dil, ring_iter):
        k = kernel.shape[0]
        ring = dil * (k - 1)
        if streaming and ring > 0:
            v = next(ring_iter)
            mem = tf.concat([v, net], axis=1)
            assign = v.assign(mem[:, -ring:])
            with tf.control_dependencies([assign]):
                net = tf.identity(mem)
        net = (
            tf.nn.conv2d(
                net,
                kernel[:, None, :, :],
                strides=[1, 1, 1, 1],
                dilations=[1, dil, 1, 1],
                padding="VALID",
            )
            + offset
        )
        return tf.nn.relu(net)

    def forward(x):
        net = x  # [1, T, 1, 40]
        ring_iter = iter(mod.ring_vars)
        for kernel, offset, dil in cnn1:
            net = apply_conv(net, kernel, offset, dil, ring_iter)
        for entries in blocks:
            b1 = apply_conv(net, *entries[0], ring_iter)
            b2 = apply_conv(net, *entries[1], ring_iter)
            b2 = apply_conv(b2, *entries[2], ring_iter)
            b3 = apply_conv(net, *entries[3], ring_iter)
            b3 = apply_conv(b3, *entries[4], ring_iter)
            b3 = apply_conv(b3, *entries[5], ring_iter)
            # align leading frames (StridedDrop; identity in streaming)
            d1 = b1.shape[1] - b3.shape[1]
            d2 = b2.shape[1] - b3.shape[1]
            b1 = b1[:, d1:] if d1 > 0 else b1
            b2 = b2[:, d2:] if d2 > 0 else b2
            net = tf.concat([b1, b2, b3], axis=-1)
            net = apply_conv(net, *entries[6], ring_iter)
        if streaming and t_tail > 1:
            v = next(ring_iter)
            mem = tf.concat([v, net], axis=1)
            assign = v.assign(mem[:, -(t_tail - 1):])
            with tf.control_dependencies([assign]):
                net = tf.identity(mem)
        net = tf.reshape(net, [1, -1])
        logits = tf.matmul(net, dense_kernel) + dense_bias
        return tf.sigmoid(logits)

    t_in = cfg.stride if streaming else cfg.spectrogram_length
    mod.forward = tf.function(
        lambda x: forward(tf.reshape(x, [1, t_in, 1, 40])),
        input_signature=[tf.TensorSpec([1, t_in, 40], dtype, name="input")],
    )
    mod.forward.get_concrete_function()
    return mod


def build_tf_streaming(name: str, cfg, params, batch_stats, streaming: bool = True):
    """Dispatch: builds the streaming TF graph for any model family."""
    if name == "mixednet":
        return build_tf_streaming_mixednet(cfg, params, batch_stats, streaming)
    if name == "inception":
        return build_tf_streaming_inception(cfg, params, batch_stats, streaming)
    raise ValueError(f"no TFLite exporter for model {name!r}")


def representative_dataset(
    feature_handler, config, n_specs: int = 500, streaming: bool = True
):
    """Reference utils.py:303-325: training spectrograms chopped into
    (stride, 40) steps, with the frontend range pinned to 0.0 / 26.0.

    streaming=False yields full-length windows instead (the reference's
    generator always yields (stride, 40) chunks, which cannot calibrate a
    non-streaming graph -- its quantized non-streaming path is unusable;
    we fix rather than preserve that)."""
    stride = config.get("stride", 1)
    length = config["spectrogram_length"]
    x, _, _ = feature_handler.get_data(
        "training", batch_size=n_specs, features_length=length,
        truncation_strategy="default",
    )
    def gen():
        for spec in x:
            if streaming:
                for i in range(0, (spec.shape[0] // stride) * stride, stride):
                    chunk = np.array(spec[i : i + stride], np.float32)
                    chunk[0, 0] = 0.0
                    chunk[-1, -1] = 26.0
                    yield [chunk[None, ...]]
            else:
                chunk = np.array(spec, np.float32)
                chunk[0, 0] = 0.0
                chunk[-1, -1] = 26.0
                yield [chunk[None, ...]]
    return gen


def convert_to_tflite(
    module,
    output_path: str,
    quantize: bool = False,
    representative_gen=None,
):
    """Converts the tf.Module (with ring-buffer variables) to TFLite."""
    import tensorflow as tf

    cf = module.forward.get_concrete_function()
    converter = tf.lite.TFLiteConverter.from_concrete_functions([cf], module)
    converter._experimental_variable_quantization = quantize
    if quantize:
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        converter.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS_INT8]
        converter.inference_input_type = tf.int8
        converter.inference_output_type = tf.uint8
        if representative_gen is not None:
            converter.representative_dataset = representative_gen
    blob = converter.convert()
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    with open(output_path, "wb") as f:
        f.write(blob)
    return output_path


class TFLiteStreamingModel:
    """Runs an exported TFLite model (reference inference.py:34-125
    equivalent).  Streaming models consume (stride, 40) slices; non-streaming
    models consume full (spectrogram_length, 40) windows slid by stride --
    the window length is read from the model's input shape, exactly like the
    reference's ``input_feature_slices``."""

    def __init__(self, path: str, stride: int = 1):
        import tensorflow as tf

        self.interp = tf.lite.Interpreter(model_path=path)
        self.interp.allocate_tensors()
        self.input_details = self.interp.get_input_details()
        self.output_details = self.interp.get_output_details()
        self.stride = stride
        self.window = int(self.input_details[0]["shape"][1])
        for d in self.input_details:
            self.interp.set_tensor(d["index"], np.zeros(d["shape"], d["dtype"]))

    def reset(self):
        self.interp.reset_all_variables()

    def _quantize_input(self, x):
        d = self.input_details[0]
        if d["dtype"] in (np.int8, np.uint8):
            scale, zp = d["quantization"]
            return np.clip(np.round(x / scale + zp), -128, 127).astype(d["dtype"])
        return x.astype(np.float32)

    def _dequantize_output(self, y):
        d = self.output_details[0]
        if d["dtype"] in (np.int8, np.uint8):
            _, zp = d["quantization"]
            # reference hardcodes output scale 1/255 (inference.py:162-170)
            return (y.astype(np.float32) - zp) / 255.0
        return y

    def predict_spectrogram(self, spectrogram: np.ndarray) -> np.ndarray:
        """[T, 40] float features -> per-window probabilities.

        Windows of ``self.window`` slices ending at stride multiples
        (reference inference.py:98-106); for streaming models window ==
        stride, i.e. one probability per new slice."""
        if np.issubdtype(spectrogram.dtype, np.uint16):
            spectrogram = spectrogram.astype(np.float32) * 0.0390625
        probs = []
        d_in = self.input_details[0]
        for last in range(self.window, spectrogram.shape[0] + 1, self.stride):
            chunk = np.asarray(
                spectrogram[last - self.window : last], np.float32
            )[None, ...]
            self.interp.set_tensor(d_in["index"], self._quantize_input(chunk))
            self.interp.invoke()
            out = self.interp.get_tensor(self.output_details[0]["index"])
            probs.append(float(self._dequantize_output(out).reshape(-1)[0]))
        return np.asarray(probs, np.float32)


def tflite_model_accuracy(
    tflite_path: str,
    feature_handler,
    config: dict,
    data_set: str = "testing",
    folder: str | None = None,
    accuracy_name: str = "tflite_model_accuracy.txt",
):
    """Accuracy of an exported TFLite model on a test set (exact semantics
    of reference tflite_model_accuracy, test.py:406-517).

    Non-ambient sets (truncate_start): the prediction is the LAST window's
    probability > 0.5.  Ambient sets ('none'): counts 0.5-crossing false
    accepts with a refractory window of spectrogram_length_final_layer
    slices; reports false accepts per hour.
    """
    runner = TFLiteStreamingModel(tflite_path, stride=config.get("stride", 1))
    truncation = "none" if data_set.endswith("ambient") else "truncate_start"
    x, y, _ = feature_handler.get_data(
        data_set,
        batch_size=config.get("batch_size", 128),
        features_length=config["spectrogram_length"],
        truncation_strategy=truncation,
    )
    tp = tn = fp = fn = 0
    for spec, label in zip(x, np.atleast_1d(y)):
        runner.reset()
        probs = runner.predict_spectrogram(np.asarray(spec))
        if truncation != "none":
            pred = bool(len(probs)) and probs[-1] > 0.5
            if label > 0.5:
                tp, fn = tp + pred, fn + (not pred)
            else:
                fp, tn = fp + pred, tn + (not pred)
        else:
            refractory = int(config.get("spectrogram_length_final_layer", 0))
            previous, last_accept = 0.0, 0
            for i, p in enumerate(probs):
                if previous <= 0.5 < p and (i - last_accept > refractory):
                    fp += 1
                    last_accept = i
                previous = float(p)
    count = tp + tn + fp + fn
    metrics = {
        "accuracy": (tp + tn) / count if count else float("nan"),
        "recall": tp / (tp + fn) if (tp + fn) else float("nan"),
        "precision": tp / (tp + fp) if (tp + fp) else float("nan"),
        "false_positive_rate": fp / (fp + tn) if (fp + tn) else float("nan"),
        "false_negative_rate": fn / (tp + fn) if (tp + fn) else float("nan"),
        "count": count,
        "false_positives": fp,
    }
    if data_set.endswith("ambient"):
        hours = feature_handler.get_mode_duration(data_set) / 3600.0
        metrics["false_accepts_per_hour"] = fp / hours if hours else float("nan")
    if folder:
        os.makedirs(folder, exist_ok=True)
        with open(os.path.join(folder, accuracy_name), "w") as f:
            if data_set.endswith("ambient"):
                f.write(
                    f"false accepts = {fp}; false accepts per hour = "
                    f"{metrics['false_accepts_per_hour']:.4}"
                )
            else:
                f.write(repr(metrics))
    return metrics


def export_and_evaluate_tflite(
    bundle,
    variables,
    feature_handler,
    config,
    train_dir: str,
    quantize: bool,
    streaming: bool = True,
):
    """CLI hook: export TFLite (streaming or non-streaming, optionally int8),
    run the streamed ROC through the interpreter, and the accuracy /
    ambient false-accept evaluation -- the reference evaluate_model artifact
    family (model_train_eval.py:131-274 + test.py:406-517)."""
    from microwakeword_tpu.evaluate import streaming_model_roc

    base = "stream_state_internal" if streaming else "non_stream"
    name = base + ("_quant" if quantize else "")
    folder = os.path.join(train_dir, f"tflite_{name}")
    module = build_tf_streaming(
        bundle.name, bundle.config, variables["params"], variables["batch_stats"],
        streaming=streaming,
    )
    rep = (
        representative_dataset(feature_handler, config, streaming=streaming)
        if quantize
        else None
    )
    path = convert_to_tflite(
        module, os.path.join(folder, f"{name}.tflite"), quantize, rep
    )

    runner = TFLiteStreamingModel(path, stride=config.get("stride", 1))

    def stream_fn(_vars, x):
        runner.reset()
        return runner.predict_spectrogram(np.asarray(x)[0])

    if feature_handler.get_mode_size("testing_ambient"):
        result = streaming_model_roc(
            bundle, variables, feature_handler, config,
            folder=folder, accuracy_name="tflite_streaming_roc.txt",
            stream_fn=stream_fn,
        )
        print(f"TFLite ({name}) streaming ROC AUC: {result['auc']:.5f}")
        if streaming and quantize:
            # deployment artifact: ESPHome manifest with the operating
            # cutoff read off the measured ROC (reference leaves this to
            # the user, notebook cell 11).
            from microwakeword_tpu.export.manifest import (
                recommended_cutoff,
                write_manifest,
            )

            wake_word = config.get(
                "wake_word", os.path.basename(os.path.normpath(train_dir))
            )
            manifest_path = write_manifest(
                path,
                wake_word=str(wake_word),
                probability_cutoff=recommended_cutoff(
                    result, target_faph=float(config.get("target_faph", 0.5))
                ),
                sliding_window_size=5,
                feature_step_size=int(config.get("window_step_ms", 10)),
            )
            print(f"ESPHome manifest: {manifest_path}")
    if feature_handler.get_mode_size("testing"):
        m = tflite_model_accuracy(
            path, feature_handler, config, data_set="testing", folder=folder
        )
        print(f"TFLite ({name}) testing accuracy: {m['accuracy']:.4%}")
    if feature_handler.get_mode_size("testing_ambient"):
        tflite_model_accuracy(
            path, feature_handler, config, data_set="testing_ambient",
            folder=folder, accuracy_name="tflite_ambient_false_accepts.txt",
        )
    return path
