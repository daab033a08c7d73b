"""Mesh-sharded training corpus: each device holds 1/D of the clips.

Under data parallelism the default corpus placement replicates the packed
spectrogram corpus on every device (parallel/train_step.replicate) -- cheap
for small corpora, but it caps dataset size at per-chip HBM, a capacity the
reference's disk-mmap streaming never loses
(/root/reference/microwakeword/data.py:190,540-569).  This module shards
the corpus over the mesh's 'data' axis instead: clips are dealt round-robin
per provider store to the D devices (the same deterministic split
pack_training_arrays uses for multi-host input sharding), each device's
shard is padded to a common shape, and the stacked [D, ...] arrays are
device_put with a NamedSharding over 'data'.  Corpus capacity then scales
linearly with the mesh.

Sampling runs per-device under shard_map: each device draws B/D samples
from its local shard with the global provider weights (per-device rng =
fold_in(step rng, axis_index)).  Because the round-robin split is a
uniform-random-equivalent partition of every provider's clips, each
sample's marginal provider/clip distribution matches the replicated path;
only the coupling between same-batch samples differs (samples on one
device share a shard).  Providers with fewer clips than D are absent from
some shards (their local sampling weight is masked to zero there), so
extremely small providers are slightly under-mixed per batch -- negligible
for real corpora with thousands of clips per provider.
"""

from __future__ import annotations

import flax.struct
import jax
import numpy as np

from microwakeword_tpu.data import sampler as S
from microwakeword_tpu.data.host_stream import corpus_nbytes, hbm_corpus_budget

NEG_INF_LOGIT = -1e30


@flax.struct.dataclass
class ShardedTrainingData:
    """PackedTrainingData stacked over a leading device axis [D, ...] and
    sharded over the mesh 'data' axis (one shard per device)."""

    stacked: S.PackedTrainingData


_PAD_VALUES = {
    "frames": 0,
    "clip_offset": 0,
    "clip_length": 1,
    "provider_logits": NEG_INF_LOGIT,  # never sampled
    "provider_clip_start": 0,
    "provider_clip_count": 1,
    "provider_label": 0.0,
    "provider_penalty": 0.0,
    "provider_strategy": 0,
    "provider_cutoffs": 0,
    "provider_n_cutoffs": 1,
}


def shard_training_data(providers, mesh) -> ShardedTrainingData:
    """Packs one corpus shard per device and places them sharded over the
    mesh's 'data' axis.  Each device uploads only its 1/D of the frames."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    d = int(mesh.shape["data"])
    shards = [
        S.pack_training_arrays(providers, shard_index=i, shard_count=d)
        for i in range(d)
    ]
    stacked = {}
    for key, pad in _PAD_VALUES.items():
        parts = [s[key] for s in shards]
        max_len = max(p.shape[0] for p in parts)
        if key == "frames":
            # keep each shard's frame total a WIDE_K multiple so the
            # per-device wide-row gather reshape stays exact
            max_len = -(-max_len // S.WIDE_K) * S.WIDE_K
        padded = []
        for p in parts:
            if p.shape[0] < max_len:
                fill = np.full((max_len - p.shape[0],) + p.shape[1:], pad, p.dtype)
                p = np.concatenate([p, fill], axis=0)
            padded.append(p)
        arr = np.stack(padded, axis=0)  # [D, ...]
        spec = P("data", *([None] * (arr.ndim - 1)))
        stacked[key] = jax.device_put(arr, NamedSharding(mesh, spec))
    return ShardedTrainingData(
        stacked=S.PackedTrainingData(
            edge_pad=int(shards[0].get("edge_pad", 0)), **stacked
        )
    )


def make_sharded_sample(mesh, batch_size: int):
    """Returns a sample fn (same signature as sampler.sample_batch, corpus =
    ShardedTrainingData) that draws B/D samples per device from its local
    shard under shard_map; outputs are globally [B] with batch sharded over
    'data' -- exactly the layout the fused train step constrains to."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    d = int(mesh.shape["data"])
    if batch_size % d:
        raise ValueError(f"batch_size {batch_size} not divisible by mesh data axis {d}")
    b_local = batch_size // d

    def sample(corpus, rng, batch_size_, features_length, **masks):
        def local(stacked_blk, r):
            local_corpus = jax.tree_util.tree_map(lambda x: x[0], stacked_blk)
            ri = jax.random.fold_in(r, jax.lax.axis_index("data"))
            return S.sample_batch(local_corpus, ri, b_local, features_length, **masks)

        specs = jax.tree_util.tree_map(lambda _: P("data"), corpus.stacked)
        return shard_map(
            local,
            mesh=mesh,
            in_specs=(specs, P()),
            out_specs=P("data"),
            check_rep=False,
        )(corpus.stacked, rng)

    return sample


def pack_for_mesh(providers, config: dict, mesh):
    """Packs the training corpus for a data-parallel mesh.

    config ``corpus_sharding``:
    - "replicate" -- full copy per device (bit-exact match with the solo
      step given the same rng); errors clearly when over the HBM budget;
    - "shard"     -- 1/D of the clips per device (capacity scales with the
      mesh; per-device rng streams, so numerics differ from solo);
    - "auto" (default) -- replicate when the corpus fits the per-device
      budget, shard with a printed notice when it doesn't.
    """
    from microwakeword_tpu.parallel.train_step import replicate

    mode = str(config.get("corpus_sharding", "auto"))
    if mode not in ("auto", "replicate", "shard"):
        raise ValueError(f"corpus_sharding must be auto|replicate|shard, got {mode!r}")
    if mode == "shard":
        return shard_training_data(providers, mesh)
    arrays = S.pack_training_arrays(providers)
    nbytes = corpus_nbytes(arrays)
    budget = hbm_corpus_budget()
    if nbytes <= budget:
        return replicate(S.upload_training_arrays(arrays), mesh)
    if mode == "auto":
        print(
            f"training corpus ({nbytes / 1e6:.1f} MB) exceeds the per-device "
            f"HBM budget ({budget / 1e6:.1f} MB); sharding it over the mesh "
            f"data axis ({mesh.shape['data']} devices, corpus_sharding: auto).",
            flush=True,
        )
        return shard_training_data(providers, mesh)
    raise ValueError(
        f"training corpus is {nbytes / 1e6:.1f} MB replicated per device but "
        f"the per-device HBM budget is {budget / 1e6:.1f} MB "
        "(corpus_sharding: replicate). Options: corpus_sharding: shard "
        "(1/D of the clips per device), corpus_sharding: auto, or "
        "MWW_CORPUS_HBM_BUDGET to raise the budget."
    )
