"""Trainer step-equivalence A/B (cross-framework, same weights, same data).

Transplants a freshly initialized reference Keras model's weights
(MixedNet or Inception, --model) into this framework's parameter pytree,
then drives BOTH trainers over the IDENTICAL batch sequence and compares:

1. forward parity: probabilities agree on the same input before training;
2. loss-trajectory parity: per-step training losses agree step for step
   (same Adam/BCE/BatchNorm semantics);
3. post-training parity: probabilities agree after N optimizer steps.

This isolates the *trainer* (model math, initialization placement, loss,
optimizer, BN updates) from everything statistical (sampling, frontends,
checkpoint selection) -- the reference's update rule and ours must be the
same function.  Reference components exercised: mixednet.model
(mixednet.py:278-386), Keras train_on_batch (train.py:295-299 semantics),
Adam + BinaryCrossentropy (train.py:206-207).

Run: python scripts/trainer_ab.py [--model mixednet|inception] [--steps 30]
Writes tests/golden/trainer_ab_report.json (mixednet) /
tests/golden/trainer_ab_inception_report.json by default.

Inception notes (VERDICT r3 item 6): the reference's branch convs pass
padding="None" -- a string, so its Delay layers and 'same' padding are
dead code and branches use valid padding with StridedDrop alignment
(SURVEY §8.3); our model implements that directly, so weights transplant
positionally.  Dropout is set to 0 in both frameworks (per-framework RNG
streams cannot be aligned).
"""
import argparse
import json
import os
import sys

import numpy as np

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _SCRIPTS)
sys.path.insert(0, os.path.dirname(_SCRIPTS))
from reference_compat import install_shims  # noqa: E402

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
SPEC_LEN = 120  # 1.5 s clip at 10 ms step, stride 3 (plus dropped slices)

INCEPTION_FLAGS = dict(
    cnn1_filters="10",
    cnn1_kernel_sizes="3",
    cnn1_subspectral_groups="2",
    cnn2_filters1="8,10",
    cnn2_filters2="10,12",
    cnn2_kernel_sizes="3,5",
    cnn2_subspectral_groups="1,2",
    cnn2_dilation="1,2",
    dropout=0.0,  # per-framework dropout RNGs cannot be aligned
)
INCEPTION_SPEC_LEN = 60  # > slices dropped (22) + streaming tail


def build_reference(batch_size):
    import types

    from microwakeword import mixednet as rmixednet

    flags = types.SimpleNamespace(**MODEL_FLAGS)
    return rmixednet.model(flags, (SPEC_LEN, 40), batch_size)


def build_ours():
    import types

    from microwakeword_tpu.model_train_eval import model_config_from_flags
    from microwakeword_tpu.models import build_model
    import dataclasses

    flags = types.SimpleNamespace(model_name="mixednet", **MODEL_FLAGS)
    cfg = model_config_from_flags(flags)
    cfg = dataclasses.replace(
        cfg, spectrogram_length=SPEC_LEN, mixconv_bias=True
    )
    return build_model("mixednet", cfg)


def transfer_weights(keras_model, variables):
    """Copies the Keras model's weights into our params/batch_stats pytree.

    Layer correspondence (reference mixednet.py:278-386 vs
    models/mixednet.py): first Conv2D -> StreamConv_0; per block the
    grouped DepthwiseConv2Ds -> one fused masked MixConv kernel; 1x1
    Conv2D -> PointwiseConv; BatchNormalization -> BatchNorm (+ moving
    stats); Dense -> Dense_0.
    """
    import flax

    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables["batch_stats"])

    convs, dws, bns, dense = [], [], [], None
    for layer in keras_model.layers:
        name = layer.__class__.__name__
        if name == "Conv2D":
            convs.append(layer)
        elif name == "DepthwiseConv2D":
            dws.append(layer)
        elif name == "BatchNormalization":
            bns.append(layer)
        elif name == "Dense":
            dense = layer
        elif name == "Stream":  # wrapped first conv
            cell = layer.cell
            if cell.__class__.__name__ == "Conv2D":
                convs.insert(0, cell)

    # first conv: (k, 1, 40, C) -> (k, 40, C)
    k0 = convs.pop(0)
    params["StreamConv_0"]["kernel"] = np.asarray(k0.kernel)[:, 0]

    kernel_lists = [
        [int(v) for v in grp]
        for grp in json.loads(
            "[" + MODEL_FLAGS["mixconv_kernel_sizes"].replace("[", "[").replace("]", "]") + "]"
        )
    ]
    dw_idx = 0
    for bi, ksizes in enumerate(kernel_lists):
        kmax = max(ksizes)
        channels = params[f"MixConv_{bi}"]["kernel"].shape[-1]
        splits = [channels // len(ksizes)] * len(ksizes)
        splits[0] += channels - sum(splits)
        fused = np.zeros((kmax, 1, channels), np.float32)
        bias = np.zeros((channels,), np.float32)
        start = 0
        for width, k in zip(splits, ksizes):
            dw = dws[dw_idx]
            dw_idx += 1
            dk = np.asarray(dw.depthwise_kernel if hasattr(dw, "depthwise_kernel") else dw.kernel)
            fused[kmax - k:, 0, start:start + width] = dk[:, 0, :, 0]
            bias[start:start + width] = np.asarray(dw.bias)
            start += width
        params[f"MixConv_{bi}"]["kernel"] = fused
        params[f"MixConv_{bi}"]["bias"] = bias
        # pointwise conv: (1, 1, C, F) -> (C, F)
        pw = convs.pop(0)
        params[f"PointwiseConv_{bi}"]["kernel"] = np.asarray(pw.kernel)[0, 0]
        bn = bns[bi]
        inner = params[f"BatchNorm_{bi}"]["BatchNorm_0"]
        inner["scale"] = np.asarray(bn.gamma)
        inner["bias"] = np.asarray(bn.beta)
        s_inner = stats[f"BatchNorm_{bi}"]["BatchNorm_0"]
        s_inner["mean"] = np.asarray(bn.moving_mean)
        s_inner["var"] = np.asarray(bn.moving_variance)

    params["Dense_0"]["kernel"] = np.asarray(dense.kernel)
    params["Dense_0"]["bias"] = np.asarray(dense.bias)
    assert dw_idx == len(dws) and not convs, (dw_idx, len(dws), len(convs))
    return {"params": params, "batch_stats": stats}


def build_reference_inception(batch_size):
    import types

    from microwakeword import inception as rinception

    flags = types.SimpleNamespace(**INCEPTION_FLAGS)
    return rinception.model(flags, (INCEPTION_SPEC_LEN, 40), batch_size)


def build_ours_inception():
    from microwakeword_tpu.models import build_model
    from microwakeword_tpu.models.inception import InceptionConfig

    def parse(s):
        return [int(v) for v in str(s).split(",")]

    cfg = InceptionConfig(
        cnn1_filters=tuple(parse(INCEPTION_FLAGS["cnn1_filters"])),
        cnn1_kernel_sizes=tuple(parse(INCEPTION_FLAGS["cnn1_kernel_sizes"])),
        cnn1_subspectral_groups=tuple(
            parse(INCEPTION_FLAGS["cnn1_subspectral_groups"])
        ),
        cnn2_filters1=tuple(parse(INCEPTION_FLAGS["cnn2_filters1"])),
        cnn2_filters2=tuple(parse(INCEPTION_FLAGS["cnn2_filters2"])),
        cnn2_kernel_sizes=tuple(parse(INCEPTION_FLAGS["cnn2_kernel_sizes"])),
        cnn2_subspectral_groups=tuple(
            parse(INCEPTION_FLAGS["cnn2_subspectral_groups"])
        ),
        cnn2_dilation=tuple(parse(INCEPTION_FLAGS["cnn2_dilation"])),
        dropout=float(INCEPTION_FLAGS["dropout"]),
        spectrogram_length=INCEPTION_SPEC_LEN,
    )
    return build_model("inception", cfg)


def transfer_weights_inception(keras_model, variables):
    """Copies the Keras Inception's weights into our pytree.

    Keras's model.layers is a topological order that interleaves the
    branches (and orders same-shape branch convs ambiguously), so the
    mapping is GRAPH-DRIVEN: each inception block is located via its
    Concatenate layer, whose inputs are [branch1, branch2, branch3] in
    construction order (reference inception.py:328); each branch's convs
    are collected by walking producers upward (branch conv counts are
    fixed: 1, 2, 3), the f2 conv is the Conv2D consuming the concat, and
    the cnn1 chain is everything above the first block.  Each conv's
    SubSpectralNormalization is the SSN consuming that conv's output.
    Any mis-pairing would fail the forward-parity check below.
    """
    import flax

    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables["batch_stats"])

    def op_of(t):
        return t._keras_history.operation

    def up(op):
        return op_of(op.input)

    def collect_up(op, n):
        """Walks producers upward from ``op``, returning the first n conv
        wrappers found (deepest last -> reversed to call order)."""
        found = []
        while len(found) < n:
            nm = op.__class__.__name__
            if nm == "Conv2D" or (
                nm == "Stream" and op.cell.__class__.__name__ == "Conv2D"
            ):
                found.append(op)
            op = up(op)
        return list(reversed(found))

    ssn_by_producer = {}
    dense = None
    concats = []
    all_convs = []
    for layer in keras_model.layers:
        name = layer.__class__.__name__
        if name == "SubSpectralNormalization":
            ssn_by_producer[id(op_of(layer.input))] = layer
        elif name == "Dense":
            dense = layer
        elif name == "Concatenate":
            concats.append(layer)
        elif name == "Conv2D":
            all_convs.append(layer)

    ordered = []  # wrapper layers in OUR ConvBnRelu call order
    for bi, concat in enumerate(concats):
        ins = concat.input  # [branch1, branch2, branch3] tensors
        b1 = collect_up(op_of(ins[0]), 1)
        b2 = collect_up(op_of(ins[1]), 2)
        b3 = collect_up(op_of(ins[2]), 3)
        if bi == 0:  # cnn1 chain sits above branch1's stem
            n_cnn1 = len(json.loads(
                "[" + str(INCEPTION_FLAGS["cnn1_filters"]) + "]"))
            ordered.extend(collect_up(up(b1[0]), n_cnn1))
        ordered.extend(b1 + b2 + b3)
        f2 = [c for c in all_convs if op_of(c.input) is concat]
        assert len(f2) == 1, f"block {bi}: expected one f2 conv, {len(f2)}"
        ordered.extend(f2)

    n = len([k for k in params if k.startswith("ConvBnRelu_")])
    assert len(ordered) == len(ssn_by_producer) == n, (
        len(ordered), len(ssn_by_producer), n
    )
    for i in range(n):
        wrapper = ordered[i]
        cell = (wrapper.cell
                if wrapper.__class__.__name__ == "Stream" else wrapper)
        blk = params[f"ConvBnRelu_{i}"]
        kernel = np.asarray(cell.kernel)  # [k, 1, in, out]
        if "PointwiseConv_0" in blk:
            blk["PointwiseConv_0"]["kernel"] = kernel[0, 0]
        else:
            blk["StreamConv_0"]["kernel"] = kernel[:, 0]
        bn = ssn_by_producer[id(wrapper)].batch_norm
        inner = blk["SubSpectralNorm_0"]["BatchNorm_0"]
        inner["scale"] = np.asarray(bn.gamma)
        inner["bias"] = np.asarray(bn.beta)
        s_inner = stats[f"ConvBnRelu_{i}"]["SubSpectralNorm_0"]["BatchNorm_0"]
        s_inner["mean"] = np.asarray(bn.moving_mean)
        s_inner["var"] = np.asarray(bn.moving_variance)

    params["Dense_0"]["kernel"] = np.asarray(dense.kernel)
    params["Dense_0"]["bias"] = np.asarray(dense.bias)
    return {"params": params, "batch_stats": stats}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", type=str, default="mixednet",
                    choices=("mixednet", "inception"))
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    install_shims()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    import tensorflow as tf

    from microwakeword_tpu.train.loop import weighted_bce

    rng = np.random.default_rng(20260820)
    if args.model == "inception":
        spec_len = INCEPTION_SPEC_LEN
        ref_model = build_reference_inception(args.batch)
        bundle = build_ours_inception()
        variables = transfer_weights_inception(
            ref_model, bundle.init(jax.random.PRNGKey(0))
        )
    else:
        spec_len = SPEC_LEN
        ref_model = build_reference(args.batch)
        bundle = build_ours()
        variables = transfer_weights(
            ref_model, bundle.init(jax.random.PRNGKey(0))
        )

    # synthetic spectrogram batches: tone-ish bands for pos, noise for neg
    def make_batch():
        x = rng.uniform(0, 10, (args.batch, spec_len, 40)).astype(np.float32)
        y = (rng.random(args.batch) > 0.5).astype(np.float32)
        x[y > 0.5, :, 18:26] += rng.uniform(5, 15)
        return x, y

    batches = [make_batch() for _ in range(args.steps)]
    probe_x, _ = make_batch()

    # ---- forward parity (inference mode) ------------------------------
    ref_probs = ref_model.predict(probe_x, verbose=0).reshape(-1)
    our_probs = np.asarray(bundle.forward(variables, probe_x)).reshape(-1)
    fwd_max_diff = float(np.abs(ref_probs - our_probs).max())

    # ---- identical-batch training -------------------------------------
    ref_model.compile(
        optimizer=tf.keras.optimizers.Adam(0.001),
        loss=tf.keras.losses.BinaryCrossentropy(),
    )
    # train_on_batch returns the RUNNING MEAN of the loss metric (Keras 3);
    # reset per step so per-step losses are comparable.
    ref_losses = []
    for x, y in batches:
        ref_model.reset_metrics()
        ref_losses.append(float(ref_model.train_on_batch(x, y)))

    optimizer = optax.adam(0.001, eps=1e-7)  # keras Adam epsilon
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, x, y):
        def loss_fn(p, bs):
            probs, upd = bundle.module.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"],
            )
            return weighted_bce(probs, y, jnp.ones_like(y)), upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats
        )
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state2, loss

    our_losses = []
    for x, y in batches:
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, jnp.asarray(x), jnp.asarray(y)
        )
        our_losses.append(float(loss))

    loss_max_diff = float(np.abs(np.asarray(ref_losses) - np.asarray(our_losses)).max())

    ref_after = ref_model.predict(probe_x, verbose=0).reshape(-1)
    our_after = np.asarray(
        bundle.forward({"params": params, "batch_stats": batch_stats}, probe_x)
    ).reshape(-1)
    post_max_diff = float(np.abs(ref_after - our_after).max())

    report = {
        "what": "same initial weights + identical batch sequence through "
                "both trainers (reference Keras vs this framework)",
        "model": args.model,
        "steps": args.steps,
        "batch": args.batch,
        "forward_prob_max_diff": fwd_max_diff,
        "loss_trajectory_max_diff": loss_max_diff,
        "post_training_prob_max_diff": post_max_diff,
        "reference_losses": ref_losses,
        "our_losses": our_losses,
    }
    out = args.out or os.path.join(
        os.path.dirname(__file__), "..", "tests", "golden",
        "trainer_ab_report.json" if args.model == "mixednet"
        else "trainer_ab_inception_report.json",
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in (
        "forward_prob_max_diff", "loss_trajectory_max_diff",
        "post_training_prob_max_diff")}, indent=2))
    print("report:", os.path.normpath(out))


if __name__ == "__main__":
    main()
