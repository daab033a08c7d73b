"""Data-parallel training step over a named mesh.

The fused step from train/loop.py (on-device sampling + fwd/bwd + Adam)
with shardings: parameters/optimizer state replicated, the sampled batch
sharded over the 'data' axis.  XLA's SPMD partitioner splits the sampler
gather and the model math per device and inserts the gradient all-reduce
over ICI -- no hand-written collectives (SURVEY.md §2.3 build equivalent).

The sharded step IS the production step: train/loop.py's make_train_step
applies the same sharding constraints when given a mesh, and this module's
make_sharded_train_step delegates to it (one implementation, two call
conventions).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicate(pytree, mesh: Mesh):
    """Places a pytree fully replicated over the mesh."""
    return jax.device_put(pytree, NamedSharding(mesh, P()))


def make_sharded_train_step(
    bundle,
    packed,
    batch_size: int,
    features_length: int,
    mesh: Mesh,
    steps_per_call: int = 1,
):
    """Returns (optimizer, step) with the batch sharded over 'data'.

    step(params, batch_stats, opt_state, rng, learning_rate, *,
         time/freq mask statics, positive/negative_class_weight)

    batch_size must be divisible by the mesh's 'data' axis size.
    """
    from microwakeword_tpu.train.loop import make_train_step

    optimizer, jitted = make_train_step(
        bundle,
        packed,
        batch_size,
        features_length,
        steps_per_call=steps_per_call,
        mesh=mesh,
    )

    def step(params, batch_stats, opt_state, rng, learning_rate, **kw):
        return jitted(
            params, batch_stats, opt_state, rng, learning_rate=learning_rate, **kw
        )

    return optimizer, step
