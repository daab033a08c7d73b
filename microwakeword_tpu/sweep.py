"""Sweep CLI: train a population of model variants concurrently on one mesh
and select each member's best checkpoint.

    python -m microwakeword_tpu.sweep --training_config config.yaml \
        --n_models 8 --learning_rates "0.001,0.0005" --seeds "0,1,2,..." \
        mixednet --pointwise_filters "64,64,64,64" ...

TPU-native sweep story (no reference equivalent -- it trains one model per
process, train.py:295-299): members' parameters are stacked on a leading
axis, the fused train step is vmapped over it and the population axis is
sharded over the ('data',) mesh, so N tiny models fill the MXU together.
Per-member validation + the reference's two-step best-checkpoint predicate
(train.py:411-451) run every eval interval; the output is one directory per
member plus a leaderboard.

Sweep axes: seeds, learning rates, positive/negative class weights
(cycled to n_models if shorter).  Model architecture is fixed per run --
architectures change parameter shapes, which cannot stack under vmap.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import yaml


def _cycle(values, n):
    values = list(values)
    return [values[i % len(values)] for i in range(n)]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--training_config", type=str, required=True)
    parser.add_argument("--n_models", type=int, default=8)
    parser.add_argument("--seeds", type=str, default="")
    parser.add_argument("--learning_rates", type=str, default="")
    parser.add_argument("--positive_class_weights", type=str, default="")
    parser.add_argument("--negative_class_weights", type=str, default="")
    parser.add_argument("--steps", type=int, default=0,
                        help="override total steps (default: sum of the "
                             "config's training_steps)")
    parser.add_argument("--mesh", type=str, default="auto")
    parser.add_argument("--share_batch", type=int, default=1,
                        help="1 (default): all members train on member 0's "
                             "batch stream (one corpus gather per step "
                             "serves the whole population -- the measured-"
                             "fastest sweep mode, ~1.1-1.9x aggregate "
                             "member-steps/s vs serial on a v5e, rising "
                             "with n_models; members are NOT independent "
                             "draws -- see documentation/training.md §6); "
                             "0: every member samples its own batches "
                             "(each member bit-identical to training it "
                             "alone; ~0.9x serial after the wide-row "
                             "gather work -- use for publication-grade "
                             "seed-sweep independence)")
    sub = parser.add_subparsers(dest="model_name", required=True)
    from microwakeword_tpu.model_train_eval import (
        add_inception_flags,
        add_mixednet_flags,
        model_config_from_flags,
        parse,
    )

    add_mixednet_flags(sub.add_parser("mixednet"))
    add_inception_flags(sub.add_parser("inception"))
    flags = parser.parse_args(argv)

    import flax.serialization
    import jax

    from microwakeword_tpu.config import load_config
    from microwakeword_tpu.data.store import FeatureHandler
    from microwakeword_tpu.models import build_model
    from microwakeword_tpu.parallel import auto_mesh, create_mesh
    from microwakeword_tpu.parallel.population import (
        member_variables,
        train_population,
    )

    n = flags.n_models
    model_cfg = model_config_from_flags(flags)
    config = load_config(flags.training_config, model_cfg)
    bundle = build_model(flags.model_name, config["model_config"])
    fh = FeatureHandler(config)

    if flags.mesh == "off":
        mesh = None
    elif flags.mesh == "auto":
        mesh = auto_mesh(n)  # population axis sharded over devices
    else:
        mesh = create_mesh(int(flags.mesh))

    seeds = _cycle(parse(flags.seeds) or list(range(n)), n)
    lrs = _cycle(
        parse(flags.learning_rates) or (config.get("learning_rates") or [0.001]), n
    )
    pos_w = _cycle(
        parse(flags.positive_class_weights)
        or (config.get("positive_class_weight") or [1.0]),
        n,
    )
    neg_w = _cycle(
        parse(flags.negative_class_weights)
        or (config.get("negative_class_weight") or [1.0]),
        n,
    )
    steps = flags.steps or sum(config.get("training_steps") or [20000])
    batch_size = int(config.get("batch_size", 128))
    features_length = int(config["spectrogram_length"])

    packed = fh.pack_training()
    if mesh is not None:
        from microwakeword_tpu.parallel import replicate

        packed = replicate(packed, mesh)

    validation = None
    ambient = None
    ambient_hours = 0.0
    if fh.get_mode_size("validation") > 0:
        val_x, val_y, _ = fh.get_data(
            "validation", batch_size, features_length, "truncate_start"
        )
        validation = (val_x, val_y)
        if fh.get_mode_size("validation_ambient") > 0:
            ambient, _, _ = fh.get_data(
                "validation_ambient", batch_size, features_length, "split"
            )
            ambient_hours = fh.get_mode_duration("validation_ambient") / 3600.0

    sa = {
        "time_mask_max_size": int((config.get("time_mask_max_size") or [5])[0]),
        "time_mask_count": int((config.get("time_mask_count") or [2])[0]),
        "freq_mask_max_size": int((config.get("freq_mask_max_size") or [5])[0]),
        "freq_mask_count": int((config.get("freq_mask_count") or [2])[0]),
    }
    result = train_population(
        bundle,
        packed,
        n_models=n,
        steps=steps,
        batch_size=batch_size,
        features_length=features_length,
        seeds=seeds,
        learning_rates=lrs,
        positive_class_weights=pos_w,
        negative_class_weights=neg_w,
        mesh=mesh,
        spec_augment=sa,
        eval_interval=int(config.get("eval_step_interval", 500)),
        validation=validation,
        ambient=ambient,
        ambient_hours=ambient_hours,
        minimization_metric=config.get("minimization_metric"),
        maximization_metric=config.get(
            "maximization_metric", "average_viable_recall"
        ),
        target_minimization=float(config.get("target_minimization", 0.9)),
        steps_per_call=int(config.get("steps_per_call", 1)),
        share_batch=bool(flags.share_batch),
    )
    if validation is None:
        variables, history = result
        selection = None
    else:
        variables, history, selection = result

    train_dir = config["train_dir"]
    os.makedirs(train_dir, exist_ok=True)
    source = (
        selection["best_variables"] if selection is not None else
        jax.tree.map(np.asarray, variables)
    )
    for i in range(n):
        member_dir = os.path.join(train_dir, f"member_{i:02d}")
        os.makedirs(member_dir, exist_ok=True)
        member = {
            "params": jax.tree.map(lambda x: x[i], source["params"]),
            "batch_stats": jax.tree.map(lambda x: x[i], source["batch_stats"]),
        }
        with open(os.path.join(member_dir, "best_weights.msgpack"), "wb") as f:
            f.write(flax.serialization.to_bytes(member))
    if selection is not None:
        leaderboard = [
            {k: v for k, v in row.items() if k != "metrics"}
            | {"metrics": {k: float(v) for k, v in (row["metrics"] or {}).items()}}
            for row in selection["leaderboard"]
        ]
        with open(os.path.join(train_dir, "leaderboard.json"), "w") as f:
            json.dump(leaderboard, f, indent=2)
        print(f"leaderboard -> {os.path.join(train_dir, 'leaderboard.json')}")
        for row in leaderboard[:5]:
            print(
                f"  member {row['member']:2d} seed={row['seed']} "
                f"lr={row['learning_rate']:.4g} best_step={row['best_step']} "
                f"min={row['minimization']:.3f} max={row['maximization']:.3f}"
            )
    with open(os.path.join(train_dir, "sweep_config.yaml"), "w") as f:
        yaml.safe_dump(
            {
                "n_models": n,
                "seeds": [int(s) for s in seeds],
                "learning_rates": [float(v) for v in lrs],
                "positive_class_weights": [float(v) for v in pos_w],
                "negative_class_weights": [float(v) for v in neg_w],
                "steps": steps,
            },
            f,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
