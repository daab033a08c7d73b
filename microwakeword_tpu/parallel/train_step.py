"""Data-parallel training step over a named mesh.

The fused step from train/loop.py (on-device sampling + fwd/bwd + Adam)
with shardings: parameters/optimizer state replicated, the sampled batch
sharded over the 'data' axis.  XLA's SPMD partitioner splits the sampler
gather and the model math per device and inserts the gradient all-reduce
over ICI -- no hand-written collectives (SURVEY.md §2.3 build equivalent).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from microwakeword_tpu.data import sampler as S
from microwakeword_tpu.train import metrics as M
from microwakeword_tpu.train.loop import weighted_bce


def replicate(pytree, mesh: Mesh):
    """Places a pytree fully replicated over the mesh."""
    return jax.device_put(pytree, NamedSharding(mesh, P()))


def make_sharded_train_step(
    bundle, packed, batch_size: int, features_length: int, mesh: Mesh
):
    """Returns (optimizer, jitted_step) with batch sharded over 'data'.

    batch_size must be divisible by the mesh's 'data' axis size.
    """
    if batch_size % mesh.shape["data"]:
        raise ValueError(
            f"batch_size {batch_size} not divisible by data axis "
            f"{mesh.shape['data']}"
        )
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=0.001, eps=1e-7)
    batch_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    def step(
        params,
        batch_stats,
        opt_state,
        rng,
        learning_rate,
        *,
        time_mask_max_size,
        time_mask_count,
        freq_mask_max_size,
        freq_mask_count,
        positive_class_weight,
        negative_class_weight,
    ):
        r_batch, r_drop = jax.random.split(rng)
        feats, labels, penalties = S.sample_batch(
            packed,
            r_batch,
            batch_size,
            features_length,
            time_mask_max_size=time_mask_max_size,
            time_mask_count=time_mask_count,
            freq_mask_max_size=freq_mask_max_size,
            freq_mask_count=freq_mask_count,
        )
        # Shard the batch across the data axis; everything downstream
        # (forward, backward) partitions along it, and the grad reduction
        # becomes an all-reduce XLA places on ICI.
        feats = jax.lax.with_sharding_constraint(feats, batch_sharding)
        labels = jax.lax.with_sharding_constraint(labels, batch_sharding)
        penalties = jax.lax.with_sharding_constraint(penalties, batch_sharding)
        class_w = jnp.where(
            labels > 0.5, positive_class_weight, negative_class_weight
        )
        weights = penalties * class_w

        def loss_fn(p, bs):
            probs, updates = bundle.module.apply(
                {"params": p, "batch_stats": bs},
                feats,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": r_drop},
            )
            return weighted_bce(probs, labels, weights), (
                probs,
                updates["batch_stats"],
            )

        (loss, (probs, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats)
        opt_state.hyperparams["learning_rate"] = learning_rate
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        step_metrics = M.binary_metrics(probs, labels)
        step_metrics["loss"] = loss
        return params, new_stats, opt_state, step_metrics

    jitted = jax.jit(
        step,
        static_argnames=(
            "time_mask_max_size",
            "time_mask_count",
            "freq_mask_max_size",
            "freq_mask_count",
            "positive_class_weight",
            "negative_class_weight",
        ),
        out_shardings=(replicated, replicated, replicated, replicated),
    )
    return optimizer, jitted
