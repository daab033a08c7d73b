"""Full-int8 export for the native C++ streaming runtime (.mww v3).

The reference deploys full-int8 TFLite executed by TFLM (reference
utils.py:327-348: int8 builtins, quantized ring-buffer variables).  This
module fills the same role for the framework's own runtime: it folds
BatchNorm into the 1x1 convs, calibrates per-tensor activation ranges by
streaming representative spectrograms through a NumPy float simulator of
the op graph (validated against the live model inside the exporter), and
emits a v3 ``.mww`` with int8 weights (per-output-channel symmetric
scales), int8 activations and ring buffers (asymmetric per-tensor
scale/zero-point), int32 bias/accumulators, and float requantization
multipliers -- the standard int8 inference scheme.  The input convention
matches the reference's representative-dataset pinning: features span
[0.0, 26.0] (reference utils.py:303-325).

Supported: MixedNet and Inception (concat branches are quantized to one
shared scale at export so the streaming concat is a pure int8 copy);
spatial_attention models fall back to the float (v2) exporter.

v3 binary layout (little-endian; native/src/mww_runtime.cc must match):
    u32 magic 'MWW1'   u32 version=3
    i32 stride         i32 n_input_features
    i32 n_ops          i32 n_tensors
    n_ops x op record: 10 x i32  [type, p0..p8]
    n_tensors x (u64 byte_offset, u64 n_elems, u32 dtype, u32 pad)
        dtype: 0 = float32, 1 = int8, 2 = int32
    blob: raw bytes (each tensor 4-byte aligned)

Quantized op types:
    20 QIN    p: n, qt              quantize incoming float frames
    21 QCONV  p: k, stride, in_ch, out_ch, w, bias(-1), dil, relu, qt
              qt = f32 [zp_in, zp_out, M_0..M_{out-1}]   ring: int8
    22 QMIX   p: kmax, ch, w, qt    qt = f32 [zp_in, zp_out, M_0..M_{ch-1}]
    23 QPW    p: in_ch, out_ch, w, bias, relu, qt       (BN folded)
    24 QSAVE  p: ch, slot           int8 copy of the block input
    25 QRES   p: in_ch, out_ch, w, bias, slot, qt
              qt = f32 [zp_sv, zp_mid, zp_out, A, B_0..B_{out-1}]
              out = clamp(round((cur-zp_mid)*A + acc*B_o) + zp_out), relu
    26 QTAIL  p: window, ch, pooled, max_pool, qt([zp]) ring: int8
    27 QDENSE p: in_dim, w, qt      qt = f32 [zp_in, s_in*s_w, bias]
              -> float sigmoid probability
    28 QRESTORE p: ch, slot         cur8 = slot
    29 QCONCAT  p: c1, slot1, c2, slot2, c3   (shared scale by export)
"""

from __future__ import annotations

import struct

import numpy as np

from microwakeword_tpu.export.native_runtime import (
    MAGIC,
    _fold_bn,
    _mixconv_masked_kernel,
)
from microwakeword_tpu.models.mixednet import MixedNetConfig, tail_length

OP_QIN, OP_QCONV, OP_QMIX, OP_QPW = 20, 21, 22, 23
OP_QSAVE, OP_QRES, OP_QTAIL, OP_QDENSE = 24, 25, 26, 27
OP_QRESTORE, OP_QCONCAT = 28, 29

DT_F32, DT_I8, DT_I32 = 0, 1, 2


# --------------------------------------------------------------------------
# Float stage graph (BN folded) + NumPy non-streaming simulator.
# Streaming/non-streaming parity means the streamed runtime sees exactly
# the activation values the batch simulator records.
# --------------------------------------------------------------------------
def _build_stages(bundle, variables):
    cfg: MixedNetConfig = bundle.config
    if cfg.spatial_attention:
        raise ValueError("int8 native export does not support spatial_attention")
    if cfg.mixconv_bias:
        raise ValueError("int8 native export does not support mixconv_bias")
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    stages = []  # list of dicts

    pw_i = bn_i = mix_i = 0
    ch = bundle.input_features
    if cfg.first_conv_filters > 0:
        w = np.asarray(params["StreamConv_0"]["kernel"], np.float64)  # [k,in,out]
        stages.append(
            dict(kind="conv", k=cfg.first_conv_kernel_size, stride=cfg.stride,
                 in_ch=ch, out_ch=cfg.first_conv_filters, w=w, relu=True)
        )
        ch = cfg.first_conv_filters

    slot = 0
    for filters, repeat, ksizes, res in zip(
        cfg.pointwise_filters,
        cfg.repeat_in_block,
        cfg.mixconv_kernel_sizes,
        cfg.residual_connection,
    ):
        res_parts = None
        if res:
            rw = np.asarray(params[f"PointwiseConv_{pw_i}"]["kernel"], np.float64)
            pw_i += 1
            scale, offset = _fold_bn(
                params[f"BatchNorm_{bn_i}"]["BatchNorm_0"],
                stats[f"BatchNorm_{bn_i}"]["BatchNorm_0"],
            )
            bn_i += 1
            # fold the branch BN into the branch 1x1
            res_parts = dict(
                w=rw * np.asarray(scale, np.float64)[None, :],
                b=np.asarray(offset, np.float64),
                slot=slot,
            )
            stages.append(dict(kind="save", ch=ch, slot=slot))
            slot += 1
        for _ in range(repeat):
            if max(ksizes) > 1:
                kern = np.asarray(params[f"MixConv_{mix_i}"]["kernel"])
                mix_i += 1
                wm = _mixconv_masked_kernel(kern, ksizes).astype(np.float64)
                stages.append(dict(kind="mix", kmax=max(ksizes), ch=ch, w=wm))
            w = np.asarray(params[f"PointwiseConv_{pw_i}"]["kernel"], np.float64)
            pw_i += 1
            scale, offset = _fold_bn(
                params[f"BatchNorm_{bn_i}"]["BatchNorm_0"],
                stats[f"BatchNorm_{bn_i}"]["BatchNorm_0"],
            )
            bn_i += 1
            stages.append(
                dict(kind="pw", in_ch=ch, out_ch=filters,
                     w=w * np.asarray(scale, np.float64)[None, :],
                     b=np.asarray(offset, np.float64),
                     relu=res_parts is None)
            )
            ch = filters
            if res_parts is not None:
                stages.append(
                    dict(kind="res", in_ch=res_parts["w"].shape[0], out_ch=ch,
                         w=res_parts["w"], b=res_parts["b"],
                         slot=res_parts["slot"])
                )

    t_tail = tail_length(cfg)
    dense_in = ch
    if t_tail > 1:
        stages.append(
            dict(kind="tail", window=t_tail, ch=ch,
                 pooled=bool(cfg.pooled), max_pool=bool(cfg.max_pool))
        )
        dense_in = ch if cfg.pooled else t_tail * ch
    stages.append(
        dict(kind="dense", in_dim=dense_in,
             w=np.asarray(params["Dense_0"]["kernel"], np.float64),
             b=np.asarray(params["Dense_0"]["bias"], np.float64))
    )
    return stages


def _build_stages_inception(bundle, variables):
    """Inception as a quantized stage list (SubSpectralNorm folded into the
    convs; the three branch-final stages of each block share a scale group
    so the concat is a pure int8 copy)."""
    from microwakeword_tpu.export.native_runtime import _ssn_fold_native
    from microwakeword_tpu.models.inception import (
        InceptionConfig,
        tail_length as inception_tail,
    )

    cfg: InceptionConfig = bundle.config
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    stages = []
    idx = 0

    def conv_bn(in_ch, dilation=1, relu=True, group=None):
        """ConvBnRelu_{idx} with the SSN folded: returns out channels."""
        nonlocal idx
        p = params[f"ConvBnRelu_{idx}"]
        s = stats[f"ConvBnRelu_{idx}"]
        if "PointwiseConv_0" in p:
            w = np.asarray(p["PointwiseConv_0"]["kernel"], np.float64)
            out_ch = w.shape[-1]
            scale, offset = _ssn_fold_native(
                p["SubSpectralNorm_0"], s["SubSpectralNorm_0"], out_ch
            )
            stages.append(
                dict(kind="pw", in_ch=in_ch, out_ch=out_ch,
                     w=w * np.asarray(scale, np.float64)[None, :],
                     b=np.asarray(offset, np.float64), relu=relu, group=group)
            )
        else:
            w = np.asarray(p["StreamConv_0"]["kernel"], np.float64)  # [k,in,out]
            out_ch = w.shape[-1]
            scale, offset = _ssn_fold_native(
                p["SubSpectralNorm_0"], s["SubSpectralNorm_0"], out_ch
            )
            stages.append(
                dict(kind="conv", k=w.shape[0], stride=1, in_ch=in_ch,
                     out_ch=out_ch, dilation=dilation,
                     w=w * np.asarray(scale, np.float64)[None, None, :],
                     b=np.asarray(offset, np.float64), relu=relu, group=group)
            )
        idx += 1
        return out_ch

    ch = bundle.input_features
    for _ in cfg.cnn1_filters:
        ch = conv_bn(ch)

    SLOT_IN, SLOT_B1, SLOT_B2 = 0, 1, 2
    for gi, dil in enumerate(cfg.cnn2_dilation):
        group = f"concat_{gi}"
        stages.append(dict(kind="save", ch=ch, slot=SLOT_IN))
        f1 = conv_bn(ch, group=group)  # b1: 1x1
        stages.append(dict(kind="save", ch=f1, slot=SLOT_B1))
        stages.append(dict(kind="restore", ch=ch, slot=SLOT_IN))
        c = conv_bn(ch)  # b2: 1x1
        c = conv_bn(c, dil, group=group)  # b2: k-conv
        stages.append(dict(kind="save", ch=c, slot=SLOT_B2))
        stages.append(dict(kind="restore", ch=ch, slot=SLOT_IN))
        c3 = conv_bn(ch)  # b3: 1x1
        c3 = conv_bn(c3, dil)
        c3 = conv_bn(c3, dil, group=group)
        stages.append(
            dict(kind="concat", ch1=f1, slot1=SLOT_B1, ch2=c, slot2=SLOT_B2,
                 ch3=c3, group=group)
        )
        ch = conv_bn(f1 + c + c3)  # post-concat 1x1
    t_tail = inception_tail(cfg)
    dense_in = ch
    if t_tail > 1:
        stages.append(
            dict(kind="tail", window=t_tail, ch=ch, pooled=False,
                 max_pool=False)
        )
        dense_in = t_tail * ch
    stages.append(
        dict(kind="dense", in_dim=dense_in,
             w=np.asarray(params["Dense_0"]["kernel"], np.float64),
             b=np.asarray(params["Dense_0"]["bias"], np.float64))
    )
    return stages


def _simulate(stages, x):
    """Runs the folded float graph over [B, T, F]; returns (probs, ranges)
    where ranges[i] = (min, max) of stage i's output activations."""
    ranges = []
    saved = {}
    for st in stages:
        kind = st["kind"]
        if kind == "conv":
            k, s = st["k"], st["stride"]
            d = st.get("dilation", 1)
            t_out = (x.shape[1] - d * (k - 1) - 1) // s + 1
            out = np.zeros((x.shape[0], t_out, st["out_ch"]))
            for j in range(k):
                out += np.einsum(
                    "bti,io->bto",
                    x[:, j * d : j * d + (t_out - 1) * s + 1 : s],
                    st["w"][j],
                )
            if "b" in st:
                out += st["b"][None, None, :]
            x = np.maximum(out, 0.0) if st["relu"] else out
        elif kind == "save":
            saved[st["slot"]] = x
        elif kind == "restore":
            x = saved[st["slot"]]
        elif kind == "concat":
            t = x.shape[1]
            x = np.concatenate(
                [saved[st["slot1"]][:, -t:], saved[st["slot2"]][:, -t:], x],
                axis=-1,
            )
        elif kind == "mix":
            kmax = st["kmax"]
            t_out = x.shape[1] - kmax + 1
            out = np.zeros((x.shape[0], t_out, st["ch"]))
            for j in range(kmax):
                out += x[:, j : j + t_out] * st["w"][j][None, None, :]
            x = out
        elif kind == "pw":
            x = np.einsum("bti,io->bto", x, st["w"]) + st["b"][None, None, :]
            if st["relu"]:
                x = np.maximum(x, 0.0)
        elif kind == "res":
            branch = (
                np.einsum("bti,io->bto", saved[st["slot"]], st["w"])
                + st["b"][None, None, :]
            )
            x = np.maximum(x + branch[:, -x.shape[1] :], 0.0)
        elif kind == "tail":
            x = x[:, -st["window"] :]
            if st["pooled"]:
                x = x.max(axis=1, keepdims=True) if st["max_pool"] else x.mean(
                    axis=1, keepdims=True
                )
            x = x.reshape(x.shape[0], 1, -1)
        elif kind == "dense":
            logits = np.einsum("bti,io->bto", x, st["w"]) + st["b"]
            x = 1.0 / (1.0 + np.exp(-logits))
        ranges.append((float(x.min()), float(x.max())))
    return x[:, -1, 0], ranges


# --------------------------------------------------------------------------
# Quantization helpers
# --------------------------------------------------------------------------
def _act_q(lo, hi):
    """Asymmetric int8 (scale, zero_point) covering [lo, hi]."""
    lo, hi = min(lo, 0.0), max(hi, 1e-6)
    scale = (hi - lo) / 255.0
    zp = int(np.clip(round(-128 - lo / scale), -128, 127))
    return float(scale), zp


def _w_q(w, axis):
    """Per-output-channel symmetric int8 weights along ``axis``."""
    mx = np.maximum(np.abs(w).max(axis=axis, keepdims=True), 1e-12)
    s = mx / 127.0
    q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    return q, np.squeeze(s, axis=axis)


class _QBuilder:
    def __init__(self):
        self.ops = []
        self.tensors = []  # (bytes, n_elems, dtype)

    def tensor(self, arr, dtype):
        arr = np.ascontiguousarray(
            arr, dtype={DT_F32: np.float32, DT_I8: np.int8, DT_I32: np.int32}[dtype]
        )
        self.tensors.append((arr.tobytes(), arr.size, dtype))
        return len(self.tensors) - 1

    def op(self, op_type, *params):
        rec = [op_type, *params]
        rec += [0] * (10 - len(rec))
        self.ops.append(rec)

    def serialize(self, stride, n_features):
        out = [
            struct.pack("<IIiiii", MAGIC, 3, stride, n_features,
                        len(self.ops), len(self.tensors))
        ]
        for rec in self.ops:
            out.append(struct.pack("<10i", *rec))
        blob = bytearray()
        table = []
        for data, n, dt in self.tensors:
            while len(blob) % 4:
                blob += b"\0"
            table.append((len(blob), n, dt))
            blob += data
        for off, n, dt in table:
            out.append(struct.pack("<QQII", off, n, dt, 0))
        out.append(bytes(blob))
        return b"".join(out)


def export_mixednet_int8(bundle, variables, path, calibration=None,
                         _return_debug=False):
    """Exports a trained MixedNet or Inception as a full-int8 .mww (v3).

    ``calibration``: [N, spectrogram_length, 40] float spectrograms in the
    [0, 26] feature convention.  Defaults to uniform noise spanning the
    range (fine for range calibration; real training windows are better --
    the CLI passes them).
    """
    cfg = bundle.config
    if bundle.name == "mixednet":
        stages = _build_stages(bundle, variables)
    elif bundle.name == "inception":
        stages = _build_stages_inception(bundle, variables)
    else:
        raise ValueError(f"no int8 native exporter for model {bundle.name!r}")

    if calibration is None:
        rng = np.random.default_rng(0)
        calibration = rng.uniform(
            0.0, 26.0, (64, cfg.spectrogram_length, bundle.input_features)
        )
    calib = np.asarray(calibration, np.float64)

    # exporter self-check: the folded simulator must match the live model.
    # The live forward is pinned to CPU: the NumPy simulator is host float64,
    # and TPU f32 matmul rounding alone can exceed the 5e-3 gate (observed
    # 5.2e-3 on a v5e for a model the CPU check passes at <1e-4), which would
    # spuriously abort exports right after training on the accelerator.
    probs, ranges = _simulate(stages, calib[:8])
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        live = np.asarray(
            jax.jit(bundle.forward)(
                jax.tree.map(np.asarray, variables),
                calib[:8].astype(np.float32),
            )
        ).reshape(-1)
    err = float(np.abs(probs - live).max())
    if err > 5e-3:
        # ValueError so callers' "int8 export unsupported/failed" guards
        # (model_train_eval.py) catch it instead of aborting the run
        raise ValueError(
            f"folded float simulator deviates from the live model ({err:.2e})"
        )
    _, ranges = _simulate(stages, calib)

    # unify ranges within scale groups (concat branches share one scale so
    # the concat is a pure int8 copy)
    groups = {}
    for i, st in enumerate(stages):
        g = st.get("group")
        if g is not None:
            groups.setdefault(g, []).append(i)
    ranges = list(ranges)
    for idxs in groups.values():
        lo = min(ranges[i][0] for i in idxs)
        hi = max(ranges[i][1] for i in idxs)
        for i in idxs:
            ranges[i] = (lo, hi)

    b = _QBuilder()
    # input activation: pinned to the frontend's [0, 26] convention
    s_in, zp_in = _act_q(0.0, 26.0)
    b.op(OP_QIN, cfg.stride * bundle.input_features,
         b.tensor([s_in, zp_in], DT_F32))

    s_cur, zp_cur = s_in, zp_in
    save_scales = {}
    for st, (lo, hi) in zip(stages, ranges):
        kind = st["kind"]
        if kind == "conv":
            s_out, zp_out = _act_q(lo, hi)
            wq, sw = _w_q(st["w"], axis=(0, 1))  # [k,in,out] -> per out
            bias_ref = -1
            if "b" in st:
                bias_q = np.round(st["b"] / (s_cur * sw)).astype(np.int64)
                bias_q = np.clip(bias_q, -(2**31) + 1, 2**31 - 1)
                bias_ref = b.tensor(bias_q.astype(np.int32), DT_I32)
            m = s_cur * sw / s_out
            qt = b.tensor(np.concatenate([[zp_cur, zp_out], m]), DT_F32)
            b.op(OP_QCONV, st["k"], st["stride"], st["in_ch"], st["out_ch"],
                 b.tensor(wq, DT_I8), bias_ref, st.get("dilation", 1),
                 int(st["relu"]), qt)
            s_cur, zp_cur = s_out, zp_out
        elif kind == "save":
            save_scales[st["slot"]] = (s_cur, zp_cur)
            b.op(OP_QSAVE, st["ch"], st["slot"])
        elif kind == "restore":
            b.op(OP_QRESTORE, st["ch"], st["slot"])
            s_cur, zp_cur = save_scales[st["slot"]]
        elif kind == "concat":
            # branches share the group scale: plain int8 concatenation
            b.op(OP_QCONCAT, st["ch1"], st["slot1"], st["ch2"], st["slot2"],
                 st["ch3"])
        elif kind == "mix":
            s_out, zp_out = _act_q(lo, hi)
            wq, sw = _w_q(st["w"], axis=(0,))  # [kmax, ch] -> per ch
            m = s_cur * sw / s_out
            qt = b.tensor(np.concatenate([[zp_cur, zp_out], m]), DT_F32)
            b.op(OP_QMIX, st["kmax"], st["ch"], b.tensor(wq, DT_I8), qt)
            s_cur, zp_cur = s_out, zp_out
        elif kind == "pw":
            s_out, zp_out = _act_q(lo, hi)
            wq, sw = _w_q(st["w"], axis=(0,))  # [in, out] -> per out
            bias_q = np.round(st["b"] / (s_cur * sw)).astype(np.int64)
            bias_q = np.clip(bias_q, -(2**31) + 1, 2**31 - 1).astype(np.int32)
            m = s_cur * sw / s_out
            qt = b.tensor(np.concatenate([[zp_cur, zp_out], m]), DT_F32)
            b.op(OP_QPW, st["in_ch"], st["out_ch"], b.tensor(wq, DT_I8),
                 b.tensor(bias_q, DT_I32), int(st["relu"]), qt)
            s_cur, zp_cur = s_out, zp_out
        elif kind == "res":
            s_out, zp_out = _act_q(lo, hi)
            s_sv, zp_sv = save_scales[st["slot"]]
            wq, sw = _w_q(st["w"], axis=(0,))
            bias_q = np.round(st["b"] / (s_sv * sw)).astype(np.int64)
            bias_q = np.clip(bias_q, -(2**31) + 1, 2**31 - 1).astype(np.int32)
            a_mul = s_cur / s_out
            b_mul = s_sv * sw / s_out
            qt = b.tensor(
                np.concatenate([[zp_sv, zp_cur, zp_out, a_mul], b_mul]), DT_F32
            )
            b.op(OP_QRES, st["in_ch"], st["out_ch"], b.tensor(wq, DT_I8),
                 b.tensor(bias_q, DT_I32), st["slot"], qt)
            s_cur, zp_cur = s_out, zp_out
        elif kind == "tail":
            qt = b.tensor([zp_cur], DT_F32)
            b.op(OP_QTAIL, st["window"], st["ch"], int(st["pooled"]),
                 int(st["max_pool"]), qt)
            # same scale in/out (mean/max/flatten are scale-preserving)
        elif kind == "dense":
            wq, sw = _w_q(st["w"], axis=(0, 1))  # per-tensor (out_dim 1)
            qt = b.tensor(
                [zp_cur, s_cur * float(sw.reshape(-1)[0]),
                 float(st["b"].reshape(-1)[0])],
                DT_F32,
            )
            b.op(OP_QDENSE, st["in_dim"], b.tensor(wq, DT_I8), qt)

    data = b.serialize(cfg.stride, bundle.input_features)
    with open(path, "wb") as f:
        f.write(data)
    if _return_debug:
        return stages, ranges
    return None
