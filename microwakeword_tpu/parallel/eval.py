"""Pod-scale streamed evaluation: ambient tracks sharded across the mesh.

The reference's stand-in for long-sequence parallelism is streamed ambient
scanning (SURVEY.md §5 "Long-context"); the TPU equivalent is batching
tracks, sharding the batch dim over the ('data',) mesh axis, and running
the ring-buffer scan (ModelBundle.stream_scan) as one SPMD program per
length bucket -- tracks are independent, so no collectives are needed
beyond result gathering.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def make_sharded_stream_scan(bundle, mesh):
    """jits stream_scan with the batch dim sharded over mesh('data').

    Returned fn: (variables, x[N, T, F]) -> probs[N, T//stride, 1] with N a
    multiple of the mesh size.  Params are replicated; the per-layer ring
    buffers inherit the batch sharding.
    """
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    return jax.jit(
        lambda variables, x: bundle.stream_scan(variables, x),
        in_shardings=(repl, shard),
        out_shardings=shard,
    )


def batched_track_probs(
    bundle,
    variables,
    tracks,
    mesh,
    bucket_granularity: int = 512,
) -> list[np.ndarray]:
    """Streaming per-step probabilities for a list of [T_i, F] tracks.

    Tracks are grouped into step-count buckets (bounding recompiles),
    zero-padded to the bucket length, stacked, padded to a multiple of the
    mesh size, and scanned as one sharded program per bucket.  Returns
    per-track prob arrays in input order (padding trimmed).
    """
    n_dev = mesh.devices.size
    scan = make_sharded_stream_scan(bundle, mesh)
    stride = bundle.stride

    steps = [t.shape[0] // stride for t in tracks]
    buckets: dict[int, list[int]] = {}
    for i, s in enumerate(steps):
        if s <= 0:
            continue
        b = max(
            bucket_granularity,
            ((s + bucket_granularity - 1) // bucket_granularity)
            * bucket_granularity,
        )
        buckets.setdefault(b, []).append(i)

    out: list[np.ndarray] = [np.zeros((0,)) for _ in tracks]
    for bucket_steps, idxs in buckets.items():
        t_pad = bucket_steps * stride
        n = len(idxs)
        n_pad = -(-n // n_dev) * n_dev
        x = np.zeros((n_pad, t_pad, bundle.input_features), np.float32)
        for row, i in enumerate(idxs):
            t_i = steps[i] * stride
            x[row, :t_i] = tracks[i][:t_i]
        probs = np.asarray(scan(variables, x))  # [n_pad, bucket_steps, 1]
        for row, i in enumerate(idxs):
            out[i] = probs[row, : steps[i]].reshape(-1)
    return out
