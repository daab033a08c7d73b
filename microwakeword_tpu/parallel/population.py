"""Population training: N models trained concurrently on one mesh.

Wake-word development is sweep-heavy (seeds, learning rates, class
weights); the models are ~10^4-10^5 params, far too small to saturate even
one TPU chip.  Training a *population* in one program -- parameters stacked
on a leading axis, the train step vmapped over it, the population axis
sharded over the mesh -- is the TPU-native realization of "model-parallel
across models" (SURVEY.md §2.3 TP note).

What it buys, measured on a v5e (BENCH_r04 sweep lines; per-op trace in
documentation/architecture.md): the vmap folds the member axis into the
channel dimension of every conv, so N members' model math runs in N-fold
wider kernels, and one program dispatch serves all members.  The step is
NOT MXU-bound though -- the corpus window gather and the depthwise (VPU)
convs dominate -- so the aggregate speedup over training members serially
comes from (a) sharing the per-step batch gather across members
(``share_batch=True``, the sweep throughput mode) and (b) amortizing
fixed per-kernel overheads, not from MXU tiling alone.  Measured ceiling
with everything dispatch-amortized (1000-2000-step chunks, post the
round-4 flat-optimizer work): ~6,900 aggregate member-steps/s at 8
members and ~9,500 at 32 -- 1.3x / 1.8x a serial single-model baseline
that itself runs at ~5,200 steps/s, bounded by the per-member marginal
cost of the depthwise convs on the VPU (~100 us/member-step fwd+bwd, at
30-50% of VPU peak -- a hardware floor, not overhead).  The ratio
tightens whenever the single-model path speeds up; the bench's
sweep*_vs_serial_ratio lines track it.

Batching semantics: with ``share_batch=False`` (default) each member
samples its own batches (per-member PRNG streams) and every member's
trajectory is bit-identical to training it alone with the same seeds
(vmap is deterministic) -- verified in tests/test_population.py.  With
``share_batch=True`` all members train on member 0's batch stream (member
0 stays bit-identical to solo); per-member learning rates / class weights /
dropout keys still apply.
"""

from __future__ import annotations

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import optax

from microwakeword_tpu.data import sampler as S
from microwakeword_tpu.train import metrics as M
from microwakeword_tpu.train.loop import weighted_bce


def init_population(bundle, seeds) -> dict:
    """Initializes stacked variables: every leaf gains a leading [N] axis."""
    keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
    return jax.vmap(bundle.init)(keys)


def member_variables(stacked: dict, i: int) -> dict:
    """Extracts member i's {'params', 'batch_stats'} from stacked variables."""
    return jax.tree.map(lambda x: x[i], stacked)


def make_population_train_step(
    bundle,
    packed,
    batch_size: int,
    features_length: int,
    mesh=None,
    steps_per_call: int = 1,
    share_batch: bool = False,
):
    """Builds (optimizer, step) for a stacked population.

    step(params, batch_stats, opt_state, rngs[N], learning_rates[N],
         pos_weights[N], neg_weights[N], *, spec-augment statics)
      -> (params, batch_stats, opt_state, metrics[N])

    ``share_batch=True`` samples ONE batch per step and feeds it to every
    member (the sweep throughput mode): the corpus gather -- the single
    hottest op in the step, ~50% of the private-batch population step on a
    v5e (trace: documentation/architecture.md) -- is paid once instead of
    N times.  Member 0's trajectory stays bit-identical to solo training
    with the same keys (it contributes the shared batch stream); members
    i>0 train on member 0's batch stream with their own init / dropout /
    hyperparameters -- the natural paired-comparison setup for seed and
    hyperparameter sweeps.  With ``share_batch=False`` (default) every
    member samples its own batches and every member is bit-identical to
    training it alone (tests/test_population.py).

    With ``mesh``, the population axis is sharded over mesh('data'): each
    device trains its slice of the population; there are no cross-member
    collectives.  ``packed`` is replicated.

    With ``steps_per_call`` > 1 the signature changes: ``rngs`` must be the
    UNfolded per-member base keys and an extra positional ``start_step``
    (int) follows them; the chained program runs optimizer steps
    start_step+1 .. start_step+steps_per_call in one XLA call, deriving each
    sub-step's key as fold_in(member_key, step_index) -- bit-identical to
    calling the unchained step in a Python loop (the sweep analogue of
    train.loop's chunked step; per-step dispatch dominated sweep throughput
    on the real chip: 0.46 ms/step chained single-model vs 9.5 ms/step
    unchained population).  Metrics are the last sub-step's.
    """
    base_opt = optax.inject_hyperparams(optax.adam)(
        learning_rate=0.001, eps=1e-7
    )

    # Per-member Adam runs on the raveled gradient vector (identical math,
    # elementwise; see train/loop.py) -- under vmap this turns ~3 kernels
    # per parameter leaf into 3 batched vector ops per population step.
    # Callers vmap optimizer.init over stacked params; init ravels, so the
    # member opt state is a flat-vector Adam state.
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
        return weighted_bce(probs, labels, weights), (probs, updates["batch_stats"])

    def update_from_batch(
        params, batch_stats, opt_state, r_drop, learning_rate,
        positive_class_weight, negative_class_weight, feats, labels, penalties,
    ):
        """fwd/bwd/opt on an already-sampled batch (the per-member part)."""
        class_w = jnp.where(
            labels > 0.5, positive_class_weight, negative_class_weight
        )
        weights = penalties * class_w
        (loss, (probs, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, feats, labels, weights, r_drop)
        flat_g, unravel = jax.flatten_util.ravel_pytree(grads)
        flat_p, _ = jax.flatten_util.ravel_pytree(params)
        opt_state.hyperparams["learning_rate"] = learning_rate
        updates, opt_state = base_opt.update(flat_g, opt_state, flat_p)
        params = optax.apply_updates(params, unravel(updates))
        # metrics are computed by the caller (once per call in the chained
        # program rather than per scan sub-step)
        return params, new_stats, opt_state, (probs, labels, loss)

    def member_step(
        params,
        batch_stats,
        opt_state,
        rng,
        learning_rate,
        positive_class_weight,
        negative_class_weight,
        *,
        time_mask_max_size,
        time_mask_count,
        freq_mask_max_size,
        freq_mask_count,
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
            # vmapped over N members this is an N*B-row gather -- the regime
            # where the wide-row path is ~2x (VERDICT r4 item 2: private
            # sweeps went 0.46x -> ~1.0x serial); identical features either
            # way, so member trajectories stay bit-identical to solo
            wide_gather=True,
        )
        return update_from_batch(
            params, batch_stats, opt_state, r_drop, learning_rate,
            positive_class_weight, negative_class_weight,
            feats, labels, penalties,
        )

    statics = (
        "time_mask_max_size",
        "time_mask_count",
        "freq_mask_max_size",
        "freq_mask_count",
    )

    def _member_metrics(pl):
        probs, labels, loss = pl
        metrics = jax.vmap(M.binary_metrics)(probs, labels)
        metrics["loss"] = loss
        return metrics

    def vstep_raw(params, batch_stats, opt_state, rngs, lrs, pos_w, neg_w, *,
                  time_mask_max_size, time_mask_count, freq_mask_max_size,
                  freq_mask_count):
        # spec-augment sizes are static (python ints) -> close over them so
        # pjit in_shardings only sees the 7 vmapped array args.
        if share_batch:
            # one gather for the whole population: batch keys/stream come
            # from member 0 (exactly solo's split(rng) convention), dropout
            # keys stay per-member
            r_batch = jax.random.split(rngs[0])[0]
            r_drops = jax.vmap(lambda k: jax.random.split(k)[1])(rngs)
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
            return jax.vmap(
                update_from_batch,
                in_axes=(0, 0, 0, 0, 0, 0, 0, None, None, None),
            )(params, batch_stats, opt_state, r_drops, lrs, pos_w, neg_w,
              feats, labels, penalties)

        def member(p, bs, os_, r, lr, pw, nw):
            return member_step(
                p, bs, os_, r, lr, pw, nw,
                time_mask_max_size=time_mask_max_size,
                time_mask_count=time_mask_count,
                freq_mask_max_size=freq_mask_max_size,
                freq_mask_count=freq_mask_count,
            )

        return jax.vmap(member)(params, batch_stats, opt_state, rngs, lrs, pos_w, neg_w)

    def vstep(params, batch_stats, opt_state, rngs, lrs, pos_w, neg_w, **sa):
        params, batch_stats, opt_state, pl = vstep_raw(
            params, batch_stats, opt_state, rngs, lrs, pos_w, neg_w, **sa
        )
        return params, batch_stats, opt_state, _member_metrics(pl)

    def chained(params, batch_stats, opt_state, member_keys, lrs, pos_w, neg_w,
                start_step, *, time_mask_max_size, time_mask_count,
                freq_mask_max_size, freq_mask_count):

        def body(carry, step_idx):
            params, batch_stats, opt_state, _ = carry
            step_keys = jax.vmap(
                lambda k: jax.random.fold_in(k, step_idx)
            )(member_keys)
            params, batch_stats, opt_state, pl = vstep_raw(
                params, batch_stats, opt_state, step_keys, lrs, pos_w, neg_w,
                time_mask_max_size=time_mask_max_size,
                time_mask_count=time_mask_count,
                freq_mask_max_size=freq_mask_max_size,
                freq_mask_count=freq_mask_count,
            )
            return (params, batch_stats, opt_state, pl), None

        n = member_keys.shape[0]
        pl0 = (
            jnp.zeros((n, batch_size, 1), jnp.float32),
            jnp.zeros((n, batch_size), jnp.float32),
            jnp.zeros((n,), jnp.float32),
        )
        steps = start_step + 1 + jnp.arange(steps_per_call, dtype=jnp.int32)
        (params, batch_stats, opt_state, pl), _ = jax.lax.scan(
            body, (params, batch_stats, opt_state, pl0), steps
        )
        # metrics once per call, from the last sub-step (the same record
        # the per-sub-step variant kept)
        return params, batch_stats, opt_state, _member_metrics(pl)

    fn, n_array_args = (chained, 8) if steps_per_call > 1 else (vstep, 7)

    if mesh is None:
        return optimizer, jax.jit(fn, static_argnames=statics)

    from jax.sharding import NamedSharding, PartitionSpec as P

    pop = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    # population-axis args are sharded; the chained variant's trailing
    # start_step scalar is replicated
    in_shardings = (pop,) * 7 + ((repl,) if n_array_args == 8 else ())

    jitted_inner = jax.jit(
        lambda *args: fn(*args[:-1], **dict(args[-1])),
        static_argnums=(n_array_args,),
        in_shardings=in_shardings,
        out_shardings=(pop, pop, pop, pop),
    )

    def jitted(*args, **sa):
        return jitted_inner(*args, tuple(sorted(sa.items())))

    return optimizer, jitted


def make_population_eval_fn(bundle, n_models: int, eval_batch: int = 512, mesh=None):
    """Chunked vmapped inference: stacked params x shared eval data.

    Returned fn: (params, batch_stats, x [M, L, F]) -> probs [N, M].
    With ``mesh``, the population axis is sharded over mesh('data').
    """
    shardings = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        pop = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        shardings = dict(in_shardings=(pop, pop, repl), out_shardings=pop)

    forward = jax.jit(
        jax.vmap(
            lambda p, bs, x: bundle.module.apply(
                {"params": p, "batch_stats": bs}, x, train=False
            ),
            in_axes=(0, 0, None),
        ),
        **shardings,
    )

    def eval_probs(params, batch_stats, x: np.ndarray) -> np.ndarray:
        m = x.shape[0]
        outs = []
        for i in range(0, m, eval_batch):
            chunk = x[i : i + eval_batch]
            pad = eval_batch - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
                )
            p = np.asarray(forward(params, batch_stats, jnp.asarray(chunk)))
            outs.append(p.reshape(n_models, eval_batch)[:, : eval_batch - pad or None])
        if not outs:
            return np.zeros((n_models, 0))
        return np.concatenate(outs, axis=1)

    return eval_probs


def train_population(
    bundle,
    packed,
    n_models: int,
    steps: int,
    batch_size: int,
    features_length: int,
    seeds=None,
    learning_rates=None,
    positive_class_weights=None,
    negative_class_weights=None,
    mesh=None,
    spec_augment: dict | None = None,
    eval_interval: int = 0,
    sample_seed: int = 1234,
    validation=None,
    ambient=None,
    ambient_hours: float = 0.0,
    minimization_metric: str | None = None,
    maximization_metric: str = "average_viable_recall",
    target_minimization: float = 0.9,
    steps_per_call: int = 1,
    share_batch: bool = False,
):
    """Trains a population; returns (stacked variables, history[, selection]).

    history: list of {"step", "loss": [N], "accuracy": [N], ...} records
    (every eval_interval steps, plus the final step).

    With ``validation=(val_x, val_y)`` (and optionally ``ambient`` split
    windows + ``ambient_hours``), every eval interval runs the vmapped
    validation pass and applies the reference's two-step best-checkpoint
    predicate (train.py:411-451) PER MEMBER; the return gains a third
    element {"best_variables": stacked best weights, "best_step": [N],
    "leaderboard": [...]} where leaderboard rows are sorted best-first by
    (min metric <= target, max metric).
    """
    seeds = list(seeds) if seeds is not None else list(range(n_models))
    assert len(seeds) == n_models
    lrs = jnp.asarray(
        learning_rates if learning_rates is not None else [0.001] * n_models,
        jnp.float32,
    )
    pos_w = jnp.asarray(
        positive_class_weights if positive_class_weights is not None
        else [1.0] * n_models,
        jnp.float32,
    )
    neg_w = jnp.asarray(
        negative_class_weights if negative_class_weights is not None
        else [1.0] * n_models,
        jnp.float32,
    )
    sa = {
        "time_mask_max_size": 0,
        "time_mask_count": 0,
        "freq_mask_max_size": 0,
        "freq_mask_count": 0,
        **(spec_augment or {}),
    }

    variables = init_population(bundle, seeds)
    params, batch_stats = variables["params"], variables["batch_stats"]
    optimizer, step_fn = make_population_train_step(
        bundle, packed, batch_size, features_length, mesh=mesh,
        share_batch=share_batch,
    )
    chunk_fn = None
    if steps_per_call > 1:
        _, chunk_fn = make_population_train_step(
            bundle, packed, batch_size, features_length, mesh=mesh,
            steps_per_call=steps_per_call, share_batch=share_batch,
        )
    opt_state = jax.vmap(optimizer.init)(params)

    # Per-member PRNG streams: member i uses fold_in(stream, seeds[i]).
    base = jax.random.PRNGKey(sample_seed)
    member_keys = jnp.stack(
        [jax.random.fold_in(base, int(s)) for s in seeds]
    )

    select = validation is not None
    eval_probs = None
    best = None
    if select:
        val_x, val_y = validation
        val_x = np.asarray(val_x, np.float32)
        val_y = np.asarray(val_y, np.float32).reshape(-1)
        eval_probs = make_population_eval_fn(bundle, n_models, mesh=mesh)
        best = {
            "min": np.full(n_models, 10000.0),
            "max": np.zeros(n_models),
            "step": np.zeros(n_models, np.int64),
            "metrics": [None] * n_models,
            "params": None,
            "batch_stats": None,
        }

    def run_selection(step):
        vp = eval_probs(params, batch_stats, val_x)  # [N, M]
        ap = (
            eval_probs(params, batch_stats, np.asarray(ambient, np.float32))
            if ambient is not None and len(ambient)
            else None
        )
        new_best_members = []
        val_records = []
        for i in range(n_models):
            vm = M.validation_metrics(
                vp[i], val_y, ap[i] if ap is not None else None, ambient_hours
            )
            val_records.append(vm)
            cur_min = float(vm[minimization_metric]) if minimization_metric else 0.0
            cur_max = float(vm[maximization_metric])
            if M.is_new_best(
                cur_min, cur_max, best["min"][i], best["max"][i], target_minimization
            ):
                best["min"][i] = cur_min
                best["max"][i] = cur_max
                best["step"][i] = step
                best["metrics"][i] = vm
                new_best_members.append(i)
        if new_best_members:
            # Snapshot improved members' weights on host (params are tiny).
            host_p = jax.tree.map(np.asarray, params)
            host_bs = jax.tree.map(np.asarray, batch_stats)
            if best["params"] is None:
                best["params"] = host_p
                best["batch_stats"] = host_bs
            else:
                idx = np.asarray(new_best_members)

                def upd(dst, src):
                    dst = np.array(dst)
                    dst[idx] = src[idx]
                    return dst

                best["params"] = jax.tree.map(upd, best["params"], host_p)
                best["batch_stats"] = jax.tree.map(upd, best["batch_stats"], host_bs)
        return val_records

    history = []
    step = 0
    while step < steps:
        # chain sub-steps only up to the next eval/record boundary so the
        # recorded trajectory is identical to the unchained loop
        if eval_interval:
            boundary = min(steps, step + eval_interval - step % eval_interval)
        else:
            boundary = steps
        if chunk_fn is not None and boundary - step >= steps_per_call:
            params, batch_stats, opt_state, metrics = chunk_fn(
                params, batch_stats, opt_state, member_keys, lrs, pos_w, neg_w,
                jnp.int32(step), **sa
            )
            step += steps_per_call
        else:
            step += 1
            step_keys = jax.vmap(
                lambda k: jax.random.fold_in(k, step)
            )(member_keys)
            params, batch_stats, opt_state, metrics = step_fn(
                params, batch_stats, opt_state, step_keys, lrs, pos_w, neg_w, **sa
            )
        if (eval_interval and step % eval_interval == 0) or step == steps:
            record = {"step": step} | {k: np.asarray(v) for k, v in metrics.items()}
            if select:
                record["validation"] = run_selection(step)
            history.append(record)

    variables = {"params": params, "batch_stats": batch_stats}
    if not select:
        return variables, history

    order = sorted(
        range(n_models),
        key=lambda i: (
            0 if best["min"][i] <= target_minimization else 1,
            -best["max"][i],
            best["min"][i],
        ),
    )
    leaderboard = [
        {
            "member": i,
            "seed": seeds[i],
            "learning_rate": float(lrs[i]),
            "best_step": int(best["step"][i]),
            "minimization": float(best["min"][i]),
            "maximization": float(best["max"][i]),
            "metrics": best["metrics"][i],
        }
        for i in order
    ]
    selection = {
        "best_variables": {
            "params": best["params"],
            "batch_stats": best["batch_stats"],
        },
        "best_step": best["step"],
        "leaderboard": leaderboard,
    }
    return variables, history, selection
