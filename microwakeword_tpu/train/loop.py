"""Training loop: single fused jit step (on-device sampling + fwd/bwd +
metrics), phase schedules, periodic validation with two-step best-checkpoint
selection, and msgpack checkpoints.

Mirrors the reference train.py behaviors (schedules padded with the last
entry, Adam + weighted BCE on probabilities, eval-interval validation,
best/last/restore artifacts) but with the entire hot path on device: the
reference assembles each batch in Python and runs an un-jitted Keras step
(train.py:225-299); here step N+1's sampling, augmentation, forward,
backward and optimizer update compile into one XLA program.
"""

from __future__ import annotations

import json
import os
import time

import flax.serialization
import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import optax

from microwakeword_tpu.data import sampler as S
from microwakeword_tpu.train import metrics as M

EPS = 1e-7  # keras BinaryCrossentropy epsilon


def _is_host_streamed(packed) -> bool:
    from microwakeword_tpu.data.host_stream import HostStreamedData

    return isinstance(packed, HostStreamedData)


def _is_sharded(packed) -> bool:
    from microwakeword_tpu.parallel.corpus import ShardedTrainingData

    return isinstance(packed, ShardedTrainingData)


def pad_schedule(values, n):
    """Pad a per-phase list with its last entry (reference train.py:190-204)."""
    values = list(values)
    while len(values) < n:
        values.append(values[-1])
    return values


def resolve_schedules(config: dict) -> list[dict]:
    """Returns one dict of hyperparameters per training phase."""
    steps = list(config.get("training_steps") or [20000])
    n = len(steps)
    keys = {
        "learning_rates": [0.001],
        "mix_up_augmentation_prob": [0.0],
        "freq_mix_augmentation_prob": [0.0],
        "time_mask_max_size": [5],
        "time_mask_count": [2],
        "freq_mask_max_size": [5],
        "freq_mask_count": [2],
        "positive_class_weight": [1.0],
        "negative_class_weight": [1.0],
    }
    resolved = {
        k: pad_schedule(config.get(k) or dflt, n) for k, dflt in keys.items()
    }
    phases = []
    for i in range(n):
        phases.append(
            {
                "steps": steps[i],
                "learning_rate": float(resolved["learning_rates"][i]),
                "time_mask_max_size": int(resolved["time_mask_max_size"][i]),
                "time_mask_count": int(resolved["time_mask_count"][i]),
                "freq_mask_max_size": int(resolved["freq_mask_max_size"][i]),
                "freq_mask_count": int(resolved["freq_mask_count"][i]),
                "positive_class_weight": float(resolved["positive_class_weight"][i]),
                "negative_class_weight": float(resolved["negative_class_weight"][i]),
            }
        )
    return phases


def weighted_bce(probs, labels, weights):
    """Keras-style weighted BCE on probabilities: mean over batch of
    weight * bce (reduction sum_over_batch_size)."""
    p = jnp.clip(probs.reshape(-1), EPS, 1.0 - EPS)
    y = labels.reshape(-1)
    bce = -(y * jnp.log(p) + (1.0 - y) * jnp.log1p(-p))
    return jnp.mean(weights.reshape(-1) * bce)


def make_train_step(
    bundle,
    packed,
    batch_size: int,
    features_length: int,
    steps_per_call: int = 1,
    donate: bool = False,
    mesh=None,
    frontend_backend: str = "xla",
    audio_wide_gather: bool = False,
):
    """Builds the fused jitted train step.

    Returned fn: (params, batch_stats, opt_state, rng, phase_static...)
    -> (params, batch_stats, opt_state, step_metrics)

    steps_per_call > 1 chains that many optimizer steps inside one XLA
    program via lax.scan (one host->device dispatch per chunk -- per-step
    dispatch latency was a measurable cost on the TPU path); metrics are the
    last chunk step's.  donate=True donates params/batch_stats/opt_state
    buffers to avoid copies (caller must rebind).

    mesh (jax.sharding.Mesh with a 'data' axis) turns the step into the
    data-parallel SPMD program: the sampled batch is shard-constrained over
    'data', parameters/optimizer state stay replicated, and XLA inserts the
    gradient all-reduce over ICI.  Numerics match the unsharded step
    bit-for-bit up to reduction order (tests/test_parallel.py).
    """
    batch_sharding = replicated = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        if batch_size % mesh.shape["data"]:
            raise ValueError(
                f"batch_size {batch_size} not divisible by data axis "
                f"{mesh.shape['data']}"
            )
        batch_sharding = NamedSharding(mesh, P("data"))
        replicated = NamedSharding(mesh, P())
    base_opt = optax.inject_hyperparams(optax.adam)(
        learning_rate=0.001, eps=1e-7  # keras Adam epsilon
    )

    # The optimizer runs on the RAVELED parameter vector: Adam is
    # elementwise, so per-leaf and concatenated updates are bit-identical,
    # but per-leaf optax emits ~3 kernels per leaf (~75 for the flagship's
    # ~25 leaves) while the flat form is 3 vector ops -- a measurable slice
    # of the small-kernel tail the fused-step trace identified
    # (documentation/architecture.md).  Callers see pytrees everywhere;
    # opt_state is flat internally (init() ravels).
    class _FlatOptimizer:
        def init(self, params):
            flat, _ = jax.flatten_util.ravel_pytree(params)
            return base_opt.init(flat)

    optimizer = _FlatOptimizer()

    def loss_fn(params, batch_stats, feats, labels, weights, rng):
        probs, updates = bundle.module.apply(
            {"params": params, "batch_stats": batch_stats},
            feats,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        loss = weighted_bce(probs, labels, weights)
        return loss, (probs, updates["batch_stats"])

    host_mode = False
    if isinstance(packed, S.PackedAudioData):
        import functools

        # frontend_backend: 'xla' or 'pallas' (fused VMEM kernel, TPU only)
        sample = functools.partial(
            S.sample_audio_feature_batch, frontend_backend=frontend_backend,
            wide_gather=audio_wide_gather,
        )
    elif _is_host_streamed(packed):
        # Corpus larger than HBM: batches are gathered on host
        # (data/host_stream.py) and ride through the `corpus` slot as a
        # pre-gathered (windows, valid, labels, weights) pytree; the step
        # applies scaling + SpecAugment (same fifth-split augment key, so
        # numerics match the HBM-resident path bit-for-bit).
        host_mode = True

        def sample(batch, rng, batch_size, features_length, **masks):
            windows, valid, labels, weights = batch
            feats = S.finish_batch(rng, windows, valid, **masks)
            return feats, labels, weights

    elif _is_sharded(packed):
        # Mesh-sharded corpus: per-device local sampling under shard_map
        # (parallel/corpus.py) -- corpus capacity scales with the mesh.
        if mesh is None:
            raise ValueError("ShardedTrainingData requires a mesh")
        from microwakeword_tpu.parallel.corpus import make_sharded_sample

        sample = make_sharded_sample(mesh, batch_size)
    elif isinstance(packed, S.PackedMixedData):
        import functools

        # mixed clips+mmap providers: raw-audio sub-batch with in-step
        # frontend, concatenated with a precomputed-spectrogram sub-batch
        sample = functools.partial(
            S.sample_mixed_batch, frontend_backend=frontend_backend
        )
    else:
        sample = S.sample_batch

    def _step_flat(
        flat,
        unravel,
        batch_stats,
        opt_state,
        rng,
        corpus,
        *,
        learning_rate,
        time_mask_max_size,
        time_mask_count,
        freq_mask_max_size,
        freq_mask_count,
        positive_class_weight,
        negative_class_weight,
    ):
        """One optimizer step on the raveled parameter vector; returns the
        step's (probs, labels, loss) so metrics can be computed once per
        call instead of once per chained sub-step."""
        r_batch, r_drop = jax.random.split(rng)
        feats, labels, penalties = sample(
            corpus,
            r_batch,
            batch_size,
            features_length,
            time_mask_max_size=time_mask_max_size,
            time_mask_count=time_mask_count,
            freq_mask_max_size=freq_mask_max_size,
            freq_mask_count=freq_mask_count,
        )
        if batch_sharding is not None:
            feats = jax.lax.with_sharding_constraint(feats, batch_sharding)
            labels = jax.lax.with_sharding_constraint(labels, batch_sharding)
            penalties = jax.lax.with_sharding_constraint(penalties, batch_sharding)
        class_w = jnp.where(labels > 0.5, positive_class_weight, negative_class_weight)
        weights = penalties * class_w

        def loss_flat(f, bs, feats, labels, weights, rng):
            return loss_fn(unravel(f), bs, feats, labels, weights, rng)

        (loss, (probs, new_stats)), grads = jax.value_and_grad(
            loss_flat, has_aux=True
        )(flat, batch_stats, feats, labels, weights, r_drop)
        opt_state.hyperparams["learning_rate"] = jnp.asarray(learning_rate)
        updates, opt_state = base_opt.update(grads, opt_state, flat)
        flat = optax.apply_updates(flat, updates)
        return flat, new_stats, opt_state, (probs, labels, loss)

    def train_step(params, batch_stats, opt_state, rng, corpus, **phase):
        flat, unravel = jax.flatten_util.ravel_pytree(params)
        flat, batch_stats, opt_state, (probs, labels, loss) = _step_flat(
            flat, unravel, batch_stats, opt_state, rng, corpus, **phase
        )
        step_metrics = M.binary_metrics(probs, labels)
        step_metrics["loss"] = loss
        return unravel(flat), batch_stats, opt_state, step_metrics

    if steps_per_call > 1:

        def chained(params, batch_stats, opt_state, rng, corpus, **phase):
            flat, unravel = jax.flatten_util.ravel_pytree(params)

            if host_mode:
                # corpus = per-step batch pytree stacked [steps, ...];
                # scan consumes (step_rng, batch) pairs
                def body(carry, x):
                    step_rng, batch = x
                    flat, batch_stats, opt_state, _ = carry
                    flat, batch_stats, opt_state, pl = _step_flat(
                        flat, unravel, batch_stats, opt_state, step_rng,
                        batch, **phase,
                    )
                    return (flat, batch_stats, opt_state, pl), None

                xs = (jax.random.split(rng, steps_per_call), corpus)
            else:

                def body(carry, step_rng):
                    flat, batch_stats, opt_state, _ = carry
                    flat, batch_stats, opt_state, pl = _step_flat(
                        flat, unravel, batch_stats, opt_state, step_rng,
                        corpus, **phase,
                    )
                    return (flat, batch_stats, opt_state, pl), None

                xs = jax.random.split(rng, steps_per_call)
            pl0 = (
                jnp.zeros((batch_size, 1), jnp.float32),  # probs [B, 1]
                jnp.zeros((batch_size,), jnp.float32),
                jnp.float32(0),
            )
            (flat, batch_stats, opt_state, (probs, labels, loss)), _ = (
                jax.lax.scan(
                    body, (flat, batch_stats, opt_state, pl0), xs
                )
            )
            # metrics once per call, from the LAST sub-step (same record the
            # per-step variant kept; saves the per-step argsort/reductions
            # inside the scan)
            last = M.binary_metrics(probs, labels)
            last["loss"] = loss
            return unravel(flat), batch_stats, opt_state, last

        fn = chained
    else:
        fn = train_step

    jitted = jax.jit(
        fn,
        static_argnames=(
            "time_mask_max_size",
            "time_mask_count",
            "freq_mask_max_size",
            "freq_mask_count",
        ),
        donate_argnums=(0, 1, 2) if donate else (),
        out_shardings=(
            (replicated, replicated, replicated, replicated)
            if replicated is not None
            else None
        ),
    )

    if host_mode:
        from microwakeword_tpu.data.host_stream import HostBatchProducer

        producer = HostBatchProducer(
            packed, batch_size, features_length, steps=steps_per_call
        )

        def call(params, batch_stats, opt_state, rng, **phase):
            # rng must be a host-side value (the training loop keeps the
            # rng chain on the CPU backend in host mode so this never
            # blocks on the in-flight device step)
            rng_np = np.asarray(rng)
            batch = producer(rng_np)  # host gather + async H2D
            return jitted(
                params, batch_stats, opt_state, jnp.asarray(rng_np), batch,
                **phase,
            )

        call.host_streamed = True
        call.cache_size = jitted._cache_size
        call.jitted = jitted
        return optimizer, call

    # The corpus rides as a jit ARGUMENT behind this wrapper (not a closure
    # constant) so the background pool refresher can swap in a same-shaped
    # regenerated corpus without retracing; callers keep the original
    # (params, batch_stats, opt_state, rng, **phase) convention.
    holder = {"corpus": packed}

    def call(params, batch_stats, opt_state, rng, **phase):
        return jitted(params, batch_stats, opt_state, rng, holder["corpus"], **phase)

    call.swap_corpus = lambda new: holder.__setitem__("corpus", new)
    call.get_corpus = lambda: holder["corpus"]
    call.cache_size = jitted._cache_size
    # underlying jit-wrapped fn, exposed for XLA cost analysis (bench.py
    # lowers it to extract flops / bytes-accessed for MFU accounting)
    call.jitted = jitted
    return optimizer, call


def make_eval_fn(bundle, eval_batch: int = 1024, mesh=None):
    """Chunked jitted inference over a fixed batch size (padded).

    With ``mesh``, the batch dim is sharded over the 'data' axis (params
    replicated) so validation rides all chips.
    """
    shardings = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = mesh.shape["data"]
        eval_batch = -(-eval_batch // n) * n  # round up to a multiple
        repl = NamedSharding(mesh, P())
        shardings = dict(
            in_shardings=(repl, repl, NamedSharding(mesh, P("data"))),
            out_shardings=repl,
        )
    forward = jax.jit(
        lambda params, batch_stats, x: bundle.module.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        ),
        **shardings,
    )

    def eval_probs(params, batch_stats, x: np.ndarray) -> np.ndarray:
        n = x.shape[0]
        outs = []
        for i in range(0, n, eval_batch):
            chunk = x[i : i + eval_batch]
            pad = eval_batch - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
                )
            p = np.asarray(forward(params, batch_stats, jnp.asarray(chunk)))
            outs.append(p[: eval_batch - pad if pad else eval_batch])
        return np.concatenate(outs).reshape(-1) if outs else np.zeros((0,))

    return eval_probs


def _save(path: str, pytree) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(pytree))


def model_summary(variables: dict) -> str:
    """Per-layer parameter table (the reference saves Keras model.summary()
    next to the weights, utils.py:131-145; this is the pytree equivalent)."""
    lines = [f"{'layer':<60} {'shape':<20} {'params':>10}"]
    lines.append("-" * 92)
    total = 0
    for coll in ("params", "batch_stats"):
        if coll not in variables:
            continue
        flat = jax.tree_util.tree_flatten_with_path(variables[coll])[0]
        for path, leaf in flat:
            name = "/".join(
                getattr(p, "key", getattr(p, "idx", None)) or str(p) for p in path
            )
            n = int(np.prod(leaf.shape)) if leaf.shape else 1
            if coll == "params":
                total += n
            lines.append(
                f"{coll + ':' + name:<60} {str(tuple(leaf.shape)):<20} {n:>10,}"
            )
    lines.append("-" * 92)
    lines.append(f"Total trainable params: {total:,}")
    return "\n".join(lines)


def _load(path: str, template):
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def _migrate_opt_state(raw: dict) -> bool:
    """Migrates a pre-flat-optimizer checkpoint's opt_state in place.

    Checkpoints written before the flat-Adam change stored per-leaf mu/nu
    pytrees; the current opt_state holds single raveled vectors.  Adam is
    elementwise, so concatenating the saved leaves in tree-flatten order
    (the same order jax.flatten_util.ravel_pytree uses) is an exact
    migration.  Returns True if an old layout was found and migrated.
    This must be an explicit structural check -- flax's from_state_dict
    silently passes mismatched non-dict leaves through, so the old layout
    would otherwise MIS-restore rather than fail.
    """

    def ravel_leaves(node):
        leaves = jax.tree_util.tree_leaves(node)
        return np.concatenate([np.asarray(l).ravel() for l in leaves])

    def walk(node):
        changed = False
        if not isinstance(node, dict):
            return False
        if isinstance(node.get("mu"), dict) and isinstance(node.get("nu"), dict):
            node["mu"] = ravel_leaves(node["mu"])
            node["nu"] = ravel_leaves(node["nu"])
            changed = True
        for v in node.values():
            changed = walk(v) or changed
        return changed

    return walk(raw)


def _load_checkpoint(path: str, template):
    """Loads restore/ckpt.msgpack, migrating pre-flat-optimizer layouts."""
    with open(path, "rb") as f:
        raw = flax.serialization.msgpack_restore(f.read())
    if _migrate_opt_state(raw):
        print(
            "restored checkpoint predates the flat-optimizer format; "
            "migrated per-leaf Adam state to the raveled layout",
            flush=True,
        )
    try:
        return flax.serialization.from_state_dict(template, raw)
    except Exception as e:
        raise ValueError(
            f"checkpoint {path} does not match the expected layout and "
            f"could not be migrated: {e}"
        ) from e


def train(
    bundle,
    config: dict,
    feature_handler,
    restore_checkpoint: bool = False,
    mesh=None,
):
    """Trains a model; returns (variables, history).

    config keys follow the reference YAML schema (SURVEY.md §5 config):
    training_steps, learning_rates, *_mask_*, positive/negative_class_weight,
    batch_size, spectrogram_length, eval_step_interval, train_dir,
    minimization_metric, maximization_metric, target_minimization.

    mesh: optional jax.sharding.Mesh with a 'data' axis.  When given, the
    production loop runs data-parallel: each host packs its shard of the
    corpus (pack_training defaults to jax.process_index()), the fused train
    step shards the batch over 'data', and validation inference is sharded
    too.  The reference has no equivalent (single-process Keras,
    train.py:295-299).
    """
    train_dir = config["train_dir"]
    os.makedirs(train_dir, exist_ok=True)
    phases = resolve_schedules(config)
    total_steps = sum(p["steps"] for p in phases)
    batch_size = int(config.get("batch_size", 128))
    features_length = int(config["spectrogram_length"])
    eval_interval = int(config.get("eval_step_interval", 500))

    rng = jax.random.PRNGKey(int(config.get("seed", 0)))
    variables = bundle.init(rng)
    params, batch_stats = variables["params"], variables["batch_stats"]
    with open(os.path.join(train_dir, "model_summary.txt"), "w") as f:
        f.write(model_summary(variables) + "\n")

    if config.get("raw_audio_training"):
        # Raw-audio pools are bounded by config pack_pool_size, so they
        # don't hit the corpus-vs-HBM ceiling; replicated per device.
        packed = feature_handler.pack_training_audio(
            step_ms=int(config.get("window_step_ms", 10))
        )
        if mesh is not None:
            from microwakeword_tpu.parallel.train_step import replicate

            packed = replicate(packed, mesh)
    elif mesh is not None:
        if str(config.get("corpus_residency", "auto")) == "host":
            raise ValueError(
                "corpus_residency: host is single-device; with a mesh the "
                "corpus is divided across devices instead -- set "
                "corpus_sharding: shard"
            )
        from microwakeword_tpu.parallel.corpus import pack_for_mesh

        packed = pack_for_mesh(feature_handler.providers, config, mesh)
    else:
        from microwakeword_tpu.data.host_stream import (
            pack_training_with_residency,
        )

        packed = pack_training_with_residency(feature_handler.providers, config)
    host_mode = _is_host_streamed(packed)
    spc_cfg = config.get("steps_per_call", "auto")
    if spc_cfg in ("auto", None, ""):
        # On TPU, per-step dispatch is the dominant overhead for these
        # tiny models (bench: 760 -> 2200+ steps/s between chunk 50 and
        # 2000 on a tunnel-attached v5e); chain up to 100 steps per XLA
        # call by default, bounded by the eval interval so the recorded
        # trajectory is unchanged.  CPU keeps per-step calls (compile
        # time of the chained scan isn't worth it there).
        steps_per_call = (
            min(100, eval_interval) if jax.default_backend() == "tpu" else 1
        )
    else:
        steps_per_call = int(spc_cfg)
    if host_mode and steps_per_call > 64:
        # Per-call batch staging is steps*B*L*40 uint16 on both host and
        # device; 64 steps (~128 MB at batch 128) amortizes dispatch while
        # keeping staging memory bounded.
        print(
            f"host-streamed corpus: capping steps_per_call {steps_per_call} "
            "-> 64 (batch staging memory)",
            flush=True,
        )
        steps_per_call = 64
    frontend_backend = config.get("frontend_backend", "xla")
    optimizer, train_step = make_train_step(
        bundle, packed, batch_size, features_length, mesh=mesh,
        frontend_backend=frontend_backend,
    )
    chunk_step = None
    if steps_per_call > 1:
        _, chunk_step = make_train_step(
            bundle, packed, batch_size, features_length,
            steps_per_call=steps_per_call, mesh=mesh,
            frontend_backend=frontend_backend,
        )
    opt_state = optimizer.init(params)
    eval_probs = make_eval_fn(bundle, mesh=mesh)

    # Background augmentation-pool refresh (config pool_refresh_steps: K):
    # a host thread regenerates the clips-type audio pools while the device
    # trains; regenerated pools swap into HBM at step-chunk boundaries with
    # the pack layout preserved, so the step is not retraced
    # (data/refresh.py; closes the static-pool diversity gap vs the
    # reference's fresh-augmentation-per-sample, data.py:324-402).
    refresher = None
    refresh_steps = int(config.get("pool_refresh_steps", 0) or 0)
    if refresh_steps > 0 and (host_mode or _is_sharded(packed)):
        print(
            "pool_refresh_steps ignored: background pool refresh applies to "
            "HBM-resident clips pools, not host-streamed/mesh-sharded "
            "corpora",
            flush=True,
        )
        refresh_steps = 0
    if refresh_steps > 0:
        from microwakeword_tpu.data.refresh import PoolRefresher

        refresher = PoolRefresher(
            feature_handler, packed, refresh_steps,
            shard_index=jax.process_index(), shard_count=jax.process_count(),
        ).start()
    if mesh is not None:
        from microwakeword_tpu.parallel.train_step import replicate

        params = replicate(params, mesh)
        batch_stats = replicate(batch_stats, mesh)
        opt_state = replicate(opt_state, mesh)

    restored_from_step = 0
    ckpt_path = os.path.join(train_dir, "restore", "ckpt.msgpack")
    if restore_checkpoint and os.path.exists(ckpt_path):
        restored = _load_checkpoint(
            ckpt_path,
            {
                "params": params,
                "batch_stats": batch_stats,
                "opt_state": opt_state,
                "step": 0,
            },
        )
        params = restored["params"]
        batch_stats = restored["batch_stats"]
        opt_state = restored["opt_state"]
        if mesh is not None:
            from microwakeword_tpu.parallel.train_step import replicate

            params = replicate(params, mesh)
            batch_stats = replicate(batch_stats, mesh)
            opt_state = replicate(opt_state, mesh)
        # Reference-compatible resume (train.py:229-233, SURVEY.md §8.5):
        # weights+optimizer restore, but the *configured schedule restarts* --
        # the caller adjusts training_steps/learning_rates when resuming.
        restored_from_step = int(restored["step"])

    # --- assemble validation data once -------------------------------
    has_val = feature_handler.get_mode_size("validation") > 0
    val_x = val_y = None
    if has_val:
        val_x, val_y, _ = feature_handler.get_data(
            "validation",
            batch_size=batch_size,
            features_length=features_length,
            truncation_strategy="truncate_start",
        )
    ambient_x = None
    ambient_hours = 0.0
    if feature_handler.get_mode_size("validation_ambient") > 0:
        ambient_x, _, _ = feature_handler.get_data(
            "validation_ambient",
            batch_size=batch_size,
            features_length=features_length,
            truncation_strategy="split",
        )
        ambient_hours = feature_handler.get_mode_duration("validation_ambient") / 3600.0

    # --- logging -----------------------------------------------------
    writers = {}
    try:
        from tensorboardX import SummaryWriter

        writers["train"] = SummaryWriter(os.path.join(train_dir, "logs", "train"))
        writers["validation"] = SummaryWriter(
            os.path.join(train_dir, "logs", "validation")
        )
    except ImportError:  # pragma: no cover
        pass
    history_path = os.path.join(train_dir, "metrics.jsonl")
    history = []

    best_min = 10000.0
    best_max = 0.0
    best_no_faph_cutoff = 1.0
    saturated_evals = 0  # consecutive evals with degenerate selection metrics
    minimization_metric = config.get("minimization_metric")
    maximization_metric = config.get("maximization_metric", "average_viable_recall")
    target_min = float(config.get("target_minimization", 0.9))

    # Optional profiler capture: config profile_dir traces the hot loop
    # once compilation has warmed up (profile_after..+profile_steps), for
    # xprof/TensorBoard analysis.  The reference has no profiling at all
    # (SURVEY.md §5); on TPU this is how the next bottleneck is found.
    profile_dir = config.get("profile_dir")
    profile_after = int(config.get("profile_after", 2))
    profile_steps = int(config.get("profile_steps", 20))
    profiling = False

    if host_mode:
        # Keep the rng chain on the CPU backend: the host batch producer
        # needs each step rng's VALUE before dispatching the step, and a
        # TPU-resident chain would queue the split behind the in-flight
        # step (serializing host gather with device compute).  Threefry is
        # backend-invariant, so the key sequence is unchanged.
        rng = jax.device_put(rng, jax.devices("cpu")[0])

    step_times = []  # (n_steps, seconds) per device call
    step = 0
    while step < total_steps:
        if profile_dir and not profiling and step >= profile_after:
            jax.profiler.start_trace(profile_dir)
            profiling, profile_end = True, step + profile_steps
        # phase lookup (reference train.py:249-263); `step+1` is the step
        # about to execute
        s, phase, phase_end = 0, phases[-1], total_steps
        for p in phases:
            s += p["steps"]
            if step + 1 <= s:
                phase, phase_end = p, s
                break
        # chain steps only within one phase and up to the next eval boundary
        next_eval = step + eval_interval - (step % eval_interval)
        room = min(phase_end, next_eval, total_steps) - step
        rng, step_rng = jax.random.split(rng)
        t0 = time.perf_counter()
        fn = chunk_step if (chunk_step is not None and room >= steps_per_call) else train_step
        n = steps_per_call if fn is chunk_step else 1
        params, batch_stats, opt_state, step_metrics = fn(
            params,
            batch_stats,
            opt_state,
            step_rng,
            learning_rate=phase["learning_rate"],
            time_mask_max_size=phase["time_mask_max_size"],
            time_mask_count=phase["time_mask_count"],
            freq_mask_max_size=phase["freq_mask_max_size"],
            freq_mask_count=phase["freq_mask_count"],
            positive_class_weight=phase["positive_class_weight"],
            negative_class_weight=phase["negative_class_weight"],
        )
        step_times.append((n, time.perf_counter() - t0))
        step += n
        if refresher is not None:
            new_packed = refresher.maybe_swap(
                packed, step,
                block=bool(config.get("pool_refresh_blocking", False)),
            )
            if new_packed is not None:
                if mesh is not None:
                    from microwakeword_tpu.parallel.train_step import replicate

                    new_packed = replicate(new_packed, mesh)
                packed = new_packed
                train_step.swap_corpus(packed)
                if chunk_step is not None:
                    chunk_step.swap_corpus(packed)
        if profiling and step >= profile_end:
            jax.block_until_ready(params)
            jax.profiler.stop_trace()
            profiling, profile_dir = False, None

        if step % eval_interval == 0 or step == total_steps:
            sm = {k: float(v) for k, v in step_metrics.items()}
            if "train" in writers:
                for k in ("loss", "accuracy", "recall", "precision", "auc"):
                    writers["train"].add_scalar(k, sm[k], step)
            _save(
                os.path.join(train_dir, "last_weights.msgpack"),
                {"params": params, "batch_stats": batch_stats},
            )

            val_metrics = {}
            if has_val:
                vp = eval_probs(params, batch_stats, val_x)
                ap = (
                    eval_probs(params, batch_stats, ambient_x)
                    if ambient_x is not None and len(ambient_x)
                    else None
                )
                val_metrics = M.validation_metrics(vp, val_y, ap, ambient_hours)
                if "validation" in writers:
                    for k, v in val_metrics.items():
                        writers["validation"].add_scalar(k, v, step)

                current_min = (
                    float(val_metrics[minimization_metric])
                    if minimization_metric
                    else 0.0
                )
                current_max = float(val_metrics[maximization_metric])
                # per-eval breadcrumb (reference train.py:391-399)
                _save(
                    os.path.join(
                        train_dir,
                        "train",
                        f"{int(best_min * 10000)}_weights_{step}.msgpack",
                    ),
                    {"params": params, "batch_stats": batch_stats},
                )
                # Degenerate-selection watchdog: once faph==0 AND
                # average_viable_recall==1.0, every later eval ties and
                # is_new_best() freezes 'best' at the first such eval --
                # the validation-ambient set is too small/easy to rank
                # checkpoints (reference semantics preserved,
                # train.py:411-442; see documentation/parity.md finding 4).
                if (
                    minimization_metric
                    and current_min == 0.0
                    and float(val_metrics.get("average_viable_recall", 0.0)) >= 1.0
                ):
                    saturated_evals += 1
                    if saturated_evals == 3:
                        print(
                            "WARNING: validation metrics saturated "
                            f"({minimization_metric}=0 and average_viable_recall"
                            "=1.0 for 3 consecutive evals) -- best-checkpoint "
                            "selection is frozen at the first saturated eval. "
                            "Use longer/harder validation_ambient audio so "
                            "selection stays informative.",
                            flush=True,
                        )
                else:
                    saturated_evals = 0
                if M.is_new_best(current_min, current_max, best_min, best_max, target_min):
                    best_min, best_max = current_min, current_max
                    best_no_faph_cutoff = val_metrics["cutoff_for_no_faph"]
                    _save(
                        os.path.join(train_dir, "best_weights.msgpack"),
                        {"params": params, "batch_stats": batch_stats},
                    )
                    _save(
                        ckpt_path,
                        {
                            "params": params,
                            "batch_stats": batch_stats,
                            "opt_state": opt_state,
                            "step": step,
                        },
                    )

            record = {
                "step": step + restored_from_step,
                "train": sm,
                "validation": val_metrics,
                "best_minimization_quantity": best_min,
                "best_maximization_quantity": best_max,
                "best_no_faph_cutoff": best_no_faph_cutoff,
                "steps_per_sec": float(
                    sum(n for n, _ in step_times[-eval_interval:])
                    / max(sum(t for _, t in step_times[-eval_interval:]), 1e-9)
                ),
            }
            history.append(record)
            with open(history_path, "a") as f:
                f.write(json.dumps(record) + "\n")

    if refresher is not None:
        refresher.stop()
    if profiling:  # trace still open: short runs
        jax.block_until_ready(params)
        jax.profiler.stop_trace()

    _save(
        ckpt_path,
        {
            "params": params,
            "batch_stats": batch_stats,
            "opt_state": opt_state,
            "step": total_steps,
        },
    )
    _save(
        os.path.join(train_dir, "last_weights.msgpack"),
        {"params": params, "batch_stats": batch_stats},
    )
    if not os.path.exists(os.path.join(train_dir, "best_weights.msgpack")):
        _save(
            os.path.join(train_dir, "best_weights.msgpack"),
            {"params": params, "batch_stats": batch_stats},
        )
    for w in writers.values():
        w.close()
    return {"params": params, "batch_stats": batch_stats}, history


def load_weights(bundle, path: str):
    """Loads weights saved by train() into a fresh variables template."""
    variables = bundle.init(jax.random.PRNGKey(0))
    return _load(
        path, {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    )
