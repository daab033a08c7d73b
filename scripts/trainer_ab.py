"""Trainer step-equivalence A/B (cross-framework, same weights, same data).

Transplants a freshly initialized reference Keras MixedNet's weights into
this framework's parameter pytree, then drives BOTH trainers over the
IDENTICAL batch sequence and compares:

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

Run: python scripts/trainer_ab.py [--steps 30] [--out report.json]
Writes tests/golden/trainer_ab_report.json by default.
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


def main():
    ap = argparse.ArgumentParser()
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
    ref_model = build_reference(args.batch)
    bundle = build_ours()
    variables = transfer_weights(ref_model, bundle.init(jax.random.PRNGKey(0)))

    # synthetic spectrogram batches: tone-ish bands for pos, noise for neg
    def make_batch():
        x = rng.uniform(0, 10, (args.batch, SPEC_LEN, 40)).astype(np.float32)
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
        "trainer_ab_report.json",
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in (
        "forward_prob_max_diff", "loss_trajectory_max_diff",
        "post_training_prob_max_diff")}, indent=2))
    print("report:", os.path.normpath(out))


if __name__ == "__main__":
    main()
