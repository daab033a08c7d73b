"""Host-RAM-resident training corpus: datasets larger than per-chip HBM.

The reference streams every batch from a disk mmap, so its dataset size is
unbounded (/root/reference/microwakeword/data.py:190 RaggedMmap open,
:235-271 per-sample reads, :540-569 per-step sampling) -- at the cost of a
serial Python loop per step.  The HBM-resident PackedTrainingData
(data/sampler.py) is ~70x faster per step but caps the corpus at device
memory.  This module restores the unbounded-capacity mode TPU-style:

- the corpus ``frames`` array stays in host RAM (numpy / mmap-backed);
- the per-step sampling DECISIONS (provider/clip/window draws) run as a
  tiny jitted program on the CPU backend over the metadata tables, using
  the same ``sample_batch_indices`` the device path uses.  JAX's threefry
  is backend-invariant, so for a given step rng the sampled windows are
  bit-identical to the HBM-resident path (tests/test_host_stream.py);
- the host gathers the windows with one vectorized fancy-index and ships
  only the batch (B*L*40 uint16, ~2 MB at batch 128) to the device;
- because jitted dispatch is asynchronous and the training loop's rng
  chain lives on the CPU backend in this mode, the host gather for call
  N+1 overlaps the device compute of call N with no extra threads.

Residency is decided at pack time against an explicit HBM budget
(``hbm_corpus_budget``); config ``corpus_residency: auto|hbm|host``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from microwakeword_tpu.data import sampler as S

# Fraction of the device's reported HBM bytes_limit budgeted for a
# replicated training corpus; the rest is headroom for parameters,
# optimizer state, batches, XLA scratch and the eval arrays.
_BUDGET_FRACTION = 0.6
# Conservative default when the platform reports no memory stats (CPU
# meshes, interpreters).
_DEFAULT_BUDGET = 6 * 10**9


def hbm_corpus_budget() -> int:
    """Per-device corpus byte budget.

    Priority: MWW_CORPUS_HBM_BUDGET env var (bytes), else 60% of the
    device's reported bytes_limit, else a 6 GB default.
    """
    env = os.environ.get("MWW_CORPUS_HBM_BUDGET")
    if env:
        return int(float(env))
    stats = None
    try:
        stats = jax.devices()[0].memory_stats()
    except Exception:  # platform without memory_stats
        pass
    limit = (stats or {}).get("bytes_limit")
    if limit:
        return int(limit * _BUDGET_FRACTION)
    return _DEFAULT_BUDGET


class HostStreamedData:
    """Training corpus with frames in host RAM and metadata for the
    CPU-backend index computation.

    ``meta`` is a PackedTrainingData of CPU-committed jax arrays whose
    ``frames`` is a 1-row dummy -- sample_batch_indices never touches
    frames, and CPU-committed leaves keep the jitted index fn on the CPU
    backend (never queued behind the in-flight TPU step).
    """

    def __init__(self, arrays: dict):
        self.frames = arrays["frames"]  # [total_rows, W] uint16, host
        cpu = jax.devices("cpu")[0]
        meta = {
            k: jax.device_put(v, cpu)
            for k, v in arrays.items()
            if k not in ("frames", "edge_pad")
        }
        meta["frames"] = jax.device_put(
            np.zeros((1, self.frames.shape[1]), self.frames.dtype), cpu
        )
        self.meta = S.PackedTrainingData(
            edge_pad=int(arrays.get("edge_pad", 0)), **meta
        )

    @property
    def nbytes(self) -> int:
        return int(self.frames.nbytes)


class HostBatchProducer:
    """Produces device-resident training batches from a HostStreamedData.

    For each step rng it reproduces exactly the keys the fused step would
    draw (r_batch = split(step_rng)[0]; chained calls split the call rng
    into steps_per_call step rngs first), computes window row indices on
    the CPU backend, gathers from host RAM, and device_puts the batch.
    """

    def __init__(self, data: HostStreamedData, batch_size: int,
                 features_length: int, steps: int = 1):
        self.data = data
        self.steps = int(steps)
        self._cpu = jax.devices("cpu")[0]
        meta = data.meta

        def one(step_rng):
            r_batch, _ = jax.random.split(step_rng)
            return S.sample_batch_indices(
                meta, r_batch, batch_size, features_length
            )

        if steps == 1:
            fn = one
        else:

            def fn(call_rng):
                rngs = jax.random.split(call_rng, steps)
                return jax.vmap(one)(rngs)

        # CPU-backend jit: CPU-committed meta leaves + default_device(cpu)
        # at call time keep this off the TPU queue entirely (nothing blocks
        # on the in-flight train step).
        self._idx_fn = jax.jit(fn)
        # Preallocated gather destination: repeated ~100 MB numpy
        # allocations page-fault-churn (measured 0.06-2.5 s variance on the
        # same gather); one reused buffer keeps the pages warm.
        self._win_buf = None

    def __call__(self, rng) -> tuple:
        """rng: the step rng (or call rng for chained steps) as a host
        value.  Returns (windows, valid, labels, weights) on device,
        leading dims [steps, B] (chained) or [B]."""
        with jax.default_device(self._cpu):
            rows, valid, labels, weights = self._idx_fn(jnp.asarray(rng))
            rows = np.asarray(rows)
            valid = np.asarray(valid)
            labels = np.asarray(labels)
            weights = np.asarray(weights)
        frames = self.data.frames
        if self._win_buf is None or self._win_buf.shape[:-1] != rows.shape:
            self._win_buf = np.empty(rows.shape + (frames.shape[1],),
                                     frames.dtype)
        np.take(frames, rows.reshape(-1), axis=0,
                out=self._win_buf.reshape(-1, frames.shape[1]))
        batch = (
            jax.device_put(self._win_buf),
            jax.device_put(valid),
            jax.device_put(labels),
            jax.device_put(weights),
        )
        # Wait for the H2D transfers before handing the batch to the step:
        # dispatching a program whose inputs are still in flight hits a
        # pathological slow path on tunnel-attached TPUs (measured 7 s vs
        # 45 ms per 64-step call), and a completed transfer also makes
        # reusing _win_buf next call safe.  In the training loop this wait
        # overlaps the PREVIOUS call's device compute.
        for leaf in batch:
            leaf.block_until_ready()
        return batch


def corpus_nbytes(arrays: dict) -> int:
    return int(
        sum(a.nbytes for a in arrays.values() if hasattr(a, "nbytes"))
    )


def pack_training_with_residency(
    providers, config: dict, shard_index=None, shard_count=None
):
    """Packs the training corpus honoring the HBM budget.

    config ``corpus_residency``:
    - "hbm"  -- always device-resident; raises a clear error when the
      corpus exceeds the per-device budget;
    - "host" -- always host-streamed;
    - "auto" (default) -- device-resident when it fits, host-streamed with
      a printed notice when it doesn't.
    """
    residency = str(config.get("corpus_residency", "auto"))
    if residency not in ("auto", "hbm", "host"):
        raise ValueError(f"corpus_residency must be auto|hbm|host, got {residency!r}")
    arrays = S.pack_training_arrays(providers, shard_index, shard_count)
    nbytes = corpus_nbytes(arrays)
    budget = hbm_corpus_budget()
    if residency == "host":
        return HostStreamedData(arrays)
    if nbytes <= budget:
        return S.upload_training_arrays(arrays)
    if residency == "auto":
        print(
            f"training corpus ({nbytes / 1e6:.1f} MB) exceeds the per-device "
            f"HBM corpus budget ({budget / 1e6:.1f} MB); streaming it from "
            "host RAM (corpus_residency: auto). Set MWW_CORPUS_HBM_BUDGET "
            "or corpus_residency: hbm to override.",
            flush=True,
        )
        return HostStreamedData(arrays)
    raise ValueError(
        f"training corpus is {nbytes / 1e6:.1f} MB but the per-device HBM "
        f"corpus budget is {budget / 1e6:.1f} MB (corpus_residency: hbm). "
        "Options: corpus_residency: host (stream batches from host RAM), "
        "corpus_residency: auto, a mesh with more devices (the corpus is "
        "sharded over the data axis), or MWW_CORPUS_HBM_BUDGET to raise "
        "the budget."
    )
