"""Exporter to the native C++ streaming runtime format (.mww).

Compiles a trained MixedNet into a flat op list + float32 weight blob that
native/src/mww_runtime.cc executes one streaming step at a time with
explicit ring buffers -- the deployment-runtime role the reference fills
with the TFLite converter+interpreter (reference utils.py:289-348,
inference.py:34-64), here as an own binary format with no flatbuffer
dependency.

Binary layout (little-endian):
    u32 magic 'MWW1' (0x3157574D)   u32 version=1
    i32 stride        i32 n_input_features
    i32 n_ops         i32 n_tensors
    n_ops x op record: 10 x i32  [type, p0..p8]
    n_tensors x (u64 float_offset, u64 n_floats)
    blob: float32[]

Op types (native/src/mww_runtime.cc must match):
    0 CONV      p: k, stride, in_ch, out_ch, w, bias(-1), dilation(0=1)
                                               ring dilation*(k-1)-(stride-1)
    1 RELU      p: ch
    2 MIXCONV   p: kmax, ch, w                              ring kmax-1
    3 POINTWISE p: in_ch, out_ch, w, bias(-1)
    4 BNORM     p: ch, scale, offset                        (folded)
    5 RES_SAVE  p: ch, slot                      (also generic branch save)
    6 RES_APPLY p: in_ch, out_ch, w, scale, offset, slot
    7 TAIL      p: window, ch, pooled, max_pool             ring window-1
    8 DENSE_SIG p: in_dim, out_dim, w, bias
    9 RESTORE   p: ch, slot
   10 CONCAT    p: ch1, slot1, ch2, slot2, ch3   cur = [s1, s2, cur]
   11 SPATTN    p: ch, k, w([k,2])               ring (k-1) x (mean,max)
"""

from __future__ import annotations

import struct

import numpy as np

from microwakeword_tpu.models import layers as L
from microwakeword_tpu.models.mixednet import MixedNetConfig, tail_length

MAGIC = 0x3157574D
OP_CONV, OP_RELU, OP_MIXCONV, OP_POINTWISE, OP_BNORM = 0, 1, 2, 3, 4
OP_RES_SAVE, OP_RES_APPLY, OP_TAIL, OP_DENSE_SIG = 5, 6, 7, 8
OP_RESTORE, OP_CONCAT, OP_SPATTN = 9, 10, 11


class _Builder:
    def __init__(self):
        self.ops: list[list[int]] = []
        self.tensors: list[np.ndarray] = []

    def tensor(self, arr: np.ndarray) -> int:
        self.tensors.append(np.ascontiguousarray(arr, dtype=np.float32))
        return len(self.tensors) - 1

    def op(self, op_type: int, *params: int) -> None:
        rec = [op_type, *params]
        rec += [0] * (10 - len(rec))
        self.ops.append(rec)

    def serialize(self, stride: int, n_features: int) -> bytes:
        out = [
            struct.pack(
                "<IIiiii", MAGIC, 2, stride, n_features,
                len(self.ops), len(self.tensors),
            )
        ]
        for rec in self.ops:
            out.append(struct.pack("<10i", *rec))
        offset = 0
        for t in self.tensors:
            out.append(struct.pack("<QQ", offset, t.size))
            offset += t.size
        for t in self.tensors:
            out.append(t.tobytes())
        return b"".join(out)


def _fold_bn(params: dict, stats: dict) -> tuple[np.ndarray, np.ndarray]:
    """gamma, beta, mean, var -> (scale, offset) with y = x*scale + offset."""
    gamma = np.asarray(params["scale"], np.float64)
    beta = np.asarray(params["bias"], np.float64)
    mean = np.asarray(stats["mean"], np.float64)
    var = np.asarray(stats["var"], np.float64)
    scale = gamma / np.sqrt(var + L.BN_EPSILON)
    return scale.astype(np.float32), (beta - mean * scale).astype(np.float32)


def _mixconv_masked_kernel(kernel: np.ndarray, kernel_sizes) -> np.ndarray:
    """[kmax, 1, ch] param -> [kmax, ch] with the group mask baked in
    (models/layers.py MixConv)."""
    from microwakeword_tpu.models.layers import MixConv

    kmax = max(kernel_sizes)
    ch = kernel.shape[-1]
    splits = MixConv.split_channels(ch, len(kernel_sizes))
    mask = np.zeros((kmax, ch), np.float32)
    start = 0
    for width, k in zip(splits, kernel_sizes):
        mask[kmax - k :, start : start + width] = 1.0
        start += width
    return kernel[:, 0, :] * mask


def export_mixednet(bundle, variables: dict, path: str) -> None:
    """Serializes a MixedNet bundle + trained variables to `path` (.mww)."""
    cfg: MixedNetConfig = bundle.config
    if cfg.spatial_attention and not cfg.pooled:
        # Without pooling the streaming Dense input (C) cannot match the
        # non-streaming trained Dense ((tail-3)*C) -- the model itself has
        # no streaming form in that configuration.
        raise ValueError("spatial_attention requires pooled=True for streaming")
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    b = _Builder()

    pw_i = bn_i = mix_i = 0

    ch = bundle.input_features
    if cfg.first_conv_filters > 0:
        kernel = np.asarray(params["StreamConv_0"]["kernel"])  # [k, in, out]
        w = b.tensor(kernel)
        b.op(OP_CONV, cfg.first_conv_kernel_size, cfg.stride, ch,
             cfg.first_conv_filters, w, -1)
        ch = cfg.first_conv_filters
        b.op(OP_RELU, ch)

    slot = 0
    for filters, repeat, ksizes, res in zip(
        cfg.pointwise_filters,
        cfg.repeat_in_block,
        cfg.mixconv_kernel_sizes,
        cfg.residual_connection,
    ):
        res_parts = None
        if res:
            rw = b.tensor(np.asarray(params[f"PointwiseConv_{pw_i}"]["kernel"]))
            pw_i += 1
            scale, offset = _fold_bn(
                params[f"BatchNorm_{bn_i}"]["BatchNorm_0"],
                stats[f"BatchNorm_{bn_i}"]["BatchNorm_0"],
            )
            bn_i += 1
            res_parts = (ch, filters, rw, b.tensor(scale), b.tensor(offset), slot)
            b.op(OP_RES_SAVE, ch, slot)
            slot += 1
        for _ in range(repeat):
            if max(ksizes) > 1:
                kernel = np.asarray(params[f"MixConv_{mix_i}"]["kernel"])
                mix_i += 1
                w = b.tensor(_mixconv_masked_kernel(kernel, ksizes))
                b.op(OP_MIXCONV, max(ksizes), ch, w)
            w = b.tensor(np.asarray(params[f"PointwiseConv_{pw_i}"]["kernel"]))
            pw_i += 1
            scale, offset = _fold_bn(
                params[f"BatchNorm_{bn_i}"]["BatchNorm_0"],
                stats[f"BatchNorm_{bn_i}"]["BatchNorm_0"],
            )
            bn_i += 1
            b.op(OP_POINTWISE, ch, filters, w, -1)
            ch = filters
            b.op(OP_BNORM, ch, b.tensor(scale), b.tensor(offset))
            if res_parts is not None:
                b.op(OP_RES_APPLY, *res_parts)
            b.op(OP_RELU, ch)

    t_tail = tail_length(cfg)
    dense_in = ch
    if t_tail > 1:
        if cfg.spatial_attention:
            # Streaming SpatialAttention gates only the newest frame
            # (models/mixednet.py SpatialAttention); with pooled=True the
            # subsequent pooling over one frame is the identity, so the
            # dense input is just [ch].
            att_kernel = np.asarray(
                params["SpatialAttention_0"]["StreamConv_0"]["kernel"]
            )  # [k, 2, 1]
            w = b.tensor(att_kernel[:, :, 0])
            b.op(OP_SPATTN, ch, att_kernel.shape[0], w)
            dense_in = ch
        else:
            b.op(OP_TAIL, t_tail, ch, int(cfg.pooled), int(cfg.max_pool))
            dense_in = ch if cfg.pooled else t_tail * ch
    w = b.tensor(np.asarray(params["Dense_0"]["kernel"]))  # [in, 1]
    bias = b.tensor(np.asarray(params["Dense_0"]["bias"]))
    b.op(OP_DENSE_SIG, dense_in, 1, w, bias)

    with open(path, "wb") as f:
        f.write(b.serialize(cfg.stride, bundle.input_features))


def _ssn_fold_native(ssn_params, ssn_stats, channels: int):
    """SubSpectralNorm -> per-channel (scale, offset); channel c uses BN
    index c % g (models/layers.py SubSpectralNorm reshape semantics)."""
    scale, offset = _fold_bn(ssn_params["BatchNorm_0"], ssn_stats["BatchNorm_0"])
    reps = channels // scale.shape[0]
    return np.tile(scale, reps), np.tile(offset, reps)


def export_inception(bundle, variables: dict, path: str) -> None:
    """Serializes an Inception bundle + trained variables to `path` (.mww).

    Mirrors models/inception.py streaming mode: valid (dilated) time convs
    with SubSpectralNorm folded to per-channel affine, three branches per
    block computed from a saved input (RES_SAVE/RESTORE) and concatenated,
    then a tail window and Dense+sigmoid.
    """
    from microwakeword_tpu.models.inception import (
        InceptionConfig,
        tail_length as inception_tail,
    )

    cfg: InceptionConfig = bundle.config
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    b = _Builder()

    idx = 0

    def emit_conv_bn(in_ch: int, dilation: int = 1) -> int:
        """Emits ConvBnRelu_{idx}: conv + folded SubSpectralNorm + relu;
        returns out channels."""
        nonlocal idx
        p = params[f"ConvBnRelu_{idx}"]
        s = stats[f"ConvBnRelu_{idx}"]
        if "PointwiseConv_0" in p:
            kernel = np.asarray(p["PointwiseConv_0"]["kernel"])  # [in, out]
            out_ch = kernel.shape[-1]
            b.op(OP_POINTWISE, in_ch, out_ch, b.tensor(kernel), -1)
        else:
            kernel = np.asarray(p["StreamConv_0"]["kernel"])  # [k, in, out]
            out_ch = kernel.shape[-1]
            b.op(
                OP_CONV, kernel.shape[0], 1, in_ch, out_ch,
                b.tensor(kernel), -1, dilation,
            )
        scale, offset = _ssn_fold_native(
            p["SubSpectralNorm_0"], s["SubSpectralNorm_0"], out_ch
        )
        b.op(OP_BNORM, out_ch, b.tensor(scale), b.tensor(offset))
        b.op(OP_RELU, out_ch)
        idx += 1
        return out_ch

    ch = bundle.input_features
    for _ in cfg.cnn1_filters:
        ch = emit_conv_bn(ch)

    SLOT_IN, SLOT_B1, SLOT_B2 = 0, 1, 2
    for dil in cfg.cnn2_dilation:
        b.op(OP_RES_SAVE, ch, SLOT_IN)
        f1 = emit_conv_bn(ch)  # b1: 1x1
        b.op(OP_RES_SAVE, f1, SLOT_B1)
        b.op(OP_RESTORE, ch, SLOT_IN)
        c = emit_conv_bn(ch)  # b2: 1x1
        c = emit_conv_bn(c, dil)  # b2: k-conv
        b.op(OP_RES_SAVE, c, SLOT_B2)
        b.op(OP_RESTORE, ch, SLOT_IN)
        c3 = emit_conv_bn(ch)  # b3: 1x1
        c3 = emit_conv_bn(c3, dil)  # b3: k-conv
        c3 = emit_conv_bn(c3, dil)  # b3: k-conv
        b.op(OP_CONCAT, f1, SLOT_B1, c, SLOT_B2, c3)
        ch = emit_conv_bn(f1 + c + c3)  # post-concat 1x1
    t_tail = inception_tail(cfg)
    dense_in = ch
    if t_tail > 1:
        b.op(OP_TAIL, t_tail, ch, 0, 0)
        dense_in = t_tail * ch
    w = b.tensor(np.asarray(params["Dense_0"]["kernel"]))
    bias = b.tensor(np.asarray(params["Dense_0"]["bias"]))
    b.op(OP_DENSE_SIG, dense_in, 1, w, bias)

    with open(path, "wb") as f:
        f.write(b.serialize(cfg.stride, bundle.input_features))


def export_model(bundle, variables: dict, path: str, quantize: bool = False,
                 calibration=None) -> None:
    """Exports any supported model family to the native .mww format.

    ``quantize=True`` emits the full-int8 v3 format (MixedNet + Inception;
    export/native_quant.py) -- int8 weights/activations/ring buffers with
    int32 accumulation, the role the reference fills with int8 TFLite
    (reference utils.py:327-348).  ``calibration``: representative
    [N, T, 40] spectrograms for activation-range calibration."""
    if quantize:
        from microwakeword_tpu.export.native_quant import export_mixednet_int8

        export_mixednet_int8(bundle, variables, path, calibration=calibration)
        return
    if bundle.name == "mixednet":
        export_mixednet(bundle, variables, path)
    elif bundle.name == "inception":
        export_inception(bundle, variables, path)
    else:
        raise ValueError(f"no native exporter for model {bundle.name!r}")
