"""Mesh construction helpers.

The reference is single-process with no distributed runtime (SURVEY.md
§2.3); scale here comes from JAX SPMD: a named device mesh + sharding
annotations, with XLA inserting the collectives (gradient allreduce over
ICI for DP; independent model replicas for sweep parallelism).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def create_mesh(
    n_devices: int | None = None, axis_names: tuple[str, ...] = ("data",),
    shape: tuple[int, ...] | None = None,
) -> Mesh:
    """Creates a mesh over the first ``n_devices`` devices.

    Default: 1-D ('data',) mesh for batch data-parallelism.  For model
    sweeps use axis_names=('model', 'data') with an explicit shape.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def auto_mesh(batch_size: int, min_devices: int = 2) -> Mesh | None:
    """Builds the production DP mesh when it makes sense, else None.

    Uses the largest device count <= len(jax.devices()) that divides
    batch_size (the sharded step requires divisibility); returns None when
    that count is below ``min_devices`` (single-chip: plain jit is the same
    program without partitioner overhead).
    """
    n = len(jax.devices())
    while n >= max(min_devices, 1) and batch_size % n:
        n -= 1
    if n < max(min_devices, 1):
        return None
    return create_mesh(n)


def initialize_distributed() -> None:
    """Multi-host initialization (jax.distributed); no-op on single host.

    On a pod slice each host calls this before building the global mesh;
    ICI carries intra-slice collectives, DCN the cross-host ones.
    """
    if jax.process_count() > 1:  # already initialized by the launcher
        return
    try:  # pragma: no cover - requires pod environment
        jax.distributed.initialize()
    except Exception:
        pass  # single-process environments (tests, single chip)
