"""Population (sweep) training: vmapped members == individually trained
models, population axis shards over the mesh, members learn the task."""

import jax
import jax.numpy as jnp
import numpy as np

from microwakeword_tpu.data import sampler as S
from microwakeword_tpu.models import build_model
from microwakeword_tpu.models.mixednet import MixedNetConfig
from microwakeword_tpu.parallel import create_mesh
from microwakeword_tpu.parallel.population import (
    init_population,
    make_population_train_step,
    member_variables,
    train_population,
)


def _packed(n_clips=64, length=20):
    """Separable synthetic corpus: positives high channels, negatives low."""
    rng = np.random.default_rng(0)
    lengths = rng.integers(length, length + 10, n_clips)
    specs = []
    half = n_clips // 2
    for i, t in enumerate(lengths):
        s = rng.uniform(0, 80, (t, 40))
        if i < half:
            s[:, 20:] += 300.0
        else:
            s[:, :20] += 300.0
        specs.append(s.astype(np.uint16))
    frames = np.concatenate(specs)
    offsets = np.concatenate([[0], np.cumsum(lengths)])[:-1]
    return S.PackedTrainingData(
        frames=jnp.asarray(frames),
        clip_offset=jnp.asarray(offsets.astype(np.int32)),
        clip_length=jnp.asarray(lengths.astype(np.int32)),
        provider_logits=jnp.asarray([0.0, 0.0], jnp.float32),
        provider_clip_start=jnp.asarray([0, half], jnp.int32),
        provider_clip_count=jnp.asarray([half, n_clips - half], jnp.int32),
        provider_label=jnp.asarray([1.0, 0.0], jnp.float32),
        provider_penalty=jnp.asarray([1.0, 1.0], jnp.float32),
        provider_strategy=jnp.asarray([1, 0], jnp.int32),
        provider_cutoffs=jnp.zeros((2, S.MAX_CUTOFFS), jnp.int32),
        provider_n_cutoffs=jnp.asarray([1, 1], jnp.int32),
    )


def _cfg():
    return MixedNetConfig(
        pointwise_filters=(8, 8),
        repeat_in_block=(1, 1),
        mixconv_kernel_sizes=((3,), (5,)),
        residual_connection=(False, False),
        first_conv_filters=8,
        first_conv_kernel_size=3,
        spectrogram_length=20,
    )


def test_population_trains_and_members_differ():
    bundle = build_model("mixednet", _cfg())
    packed = _packed()
    mesh = create_mesh()
    n = 2 * mesh.devices.size
    variables, history = train_population(
        bundle, packed, n_models=n, steps=50, batch_size=16,
        features_length=20,
        learning_rates=[0.01] * n,
        mesh=mesh, eval_interval=25,
    )
    final = history[-1]
    assert final["loss"].shape == (n,)
    assert (final["accuracy"] > 0.85).all(), final["accuracy"]
    # Different seeds -> different members.
    p0 = member_variables(variables, 0)["params"]
    p1 = member_variables(variables, 1)["params"]
    diffs = jax.tree.leaves(jax.tree.map(lambda a, b: np.abs(a - b).max(), p0, p1))
    assert max(float(d) for d in diffs) > 1e-4


def test_population_member_matches_solo_training():
    """vmapped member trajectory == the same member trained alone."""
    bundle = build_model("mixednet", _cfg())
    packed = _packed()
    n = 3
    seeds = [7, 8, 9]
    lrs = [0.01, 0.003, 0.02]

    variables, _ = train_population(
        bundle, packed, n_models=n, steps=10, batch_size=8,
        features_length=20, seeds=seeds, learning_rates=lrs, sample_seed=42,
    )

    # Re-train member 1 alone as a population of one.
    solo, _ = train_population(
        bundle, packed, n_models=1, steps=10, batch_size=8,
        features_length=20, seeds=[8], learning_rates=[0.003], sample_seed=42,
    )
    want = member_variables(solo, 0)["params"]
    got = member_variables(variables, 1)["params"]
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        # vmapped vs solo reduction order differs -> float noise ~1e-6
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def test_population_step_shapes_and_sharding():
    bundle = build_model("mixednet", _cfg())
    packed = _packed()
    mesh = create_mesh()
    n = mesh.devices.size
    variables = init_population(bundle, range(n))
    optimizer, step = make_population_train_step(
        bundle, packed, 8, 20, mesh=mesh
    )
    opt_state = jax.vmap(optimizer.init)(variables["params"])
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(n, dtype=jnp.uint32))
    params, stats, opt_state, metrics = step(
        variables["params"], variables["batch_stats"], opt_state, keys,
        jnp.full((n,), 0.01), jnp.ones((n,)), jnp.ones((n,)),
        time_mask_max_size=3, time_mask_count=1,
        freq_mask_max_size=3, freq_mask_count=1,
    )
    assert metrics["loss"].shape == (n,)
    assert np.isfinite(np.asarray(metrics["loss"])).all()


def test_population_selection_and_leaderboard():
    """Per-member validation + two-step selection returns best weights and a
    sorted leaderboard (VERDICT r1 item 6; reference train.py:411-451 per
    member)."""
    cfg = _cfg()
    bundle = build_model("mixednet", cfg)
    packed = _packed()

    rng = np.random.default_rng(1)
    val = []
    labels = []
    for i in range(24):
        s = rng.uniform(0, 80, (20, 40))
        if i % 2:
            s[:, 20:] += 300.0
        else:
            s[:, :20] += 300.0
        val.append(s * 0.0390625)
        labels.append(float(i % 2))
    val_x = np.asarray(val, np.float32)
    val_y = np.asarray(labels, np.float32)
    ambient = np.asarray(
        [rng.uniform(0, 3, (20, 40)) for _ in range(8)], np.float32
    )

    n = 4
    # One crippled member (lr=0) can't learn: must rank last.
    lrs = [0.02, 0.02, 0.02, 0.0]
    variables, history, selection = train_population(
        bundle,
        packed,
        n_models=n,
        steps=30,
        batch_size=16,
        features_length=20,
        learning_rates=lrs,
        eval_interval=10,
        validation=(val_x, val_y),
        ambient=ambient,
        ambient_hours=1.0,
        minimization_metric="ambient_false_positives_per_hour",
        maximization_metric="average_viable_recall",
        target_minimization=0.5,
    )
    lb = selection["leaderboard"]
    assert len(lb) == n
    assert lb[-1]["member"] == 3, lb  # lr=0 member ranks last
    assert lb[0]["maximization"] >= lb[-1]["maximization"]
    assert history[-1].get("validation") and len(history[-1]["validation"]) == n

    # best weights reproduce the recorded best metric for the top member
    # (the snapshot is from the member's best_step, not the final step)
    top = lb[0]["member"]
    bv = selection["best_variables"]
    member = {
        "params": jax.tree.map(lambda x: x[top], bv["params"]),
        "batch_stats": jax.tree.map(lambda x: x[top], bv["batch_stats"]),
    }
    probs = np.asarray(bundle.forward(member, val_x)).reshape(-1)
    aprobs = np.asarray(bundle.forward(member, ambient)).reshape(-1)
    from microwakeword_tpu.train import metrics as M

    vm = M.validation_metrics(probs, val_y, aprobs, 1.0)
    np.testing.assert_allclose(
        vm["average_viable_recall"], lb[0]["maximization"], atol=1e-6
    )
    np.testing.assert_allclose(
        vm["ambient_false_positives_per_hour"], lb[0]["minimization"], atol=1e-6
    )


def test_population_chained_matches_unchained():
    """steps_per_call chaining equals the per-step loop (same
    fold_in(member_key, step) key derivation inside the scan; scan-vs-
    standalone compilation reassociates float math -> ~1e-6 noise, same
    tolerance as the vmap-vs-solo test above)."""
    bundle = build_model("mixednet", _cfg())
    packed = _packed()
    n, seeds, lrs = 2, [3, 4], [0.01, 0.005]

    kw = dict(
        n_models=n, steps=10, batch_size=8, features_length=20,
        seeds=seeds, learning_rates=lrs, sample_seed=11, eval_interval=5,
    )
    plain, hist_plain = train_population(bundle, packed, **kw)
    chained, hist_chained = train_population(
        bundle, packed, steps_per_call=5, **kw
    )
    for a, b in zip(jax.tree.leaves(plain["params"]), jax.tree.leaves(chained["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)
    # boundary metrics recorded at the same steps
    assert [h["step"] for h in hist_plain] == [h["step"] for h in hist_chained]
    for hp, hc in zip(hist_plain, hist_chained):
        np.testing.assert_allclose(hp["loss"], hc["loss"], rtol=1e-5)


def test_population_chained_mesh_runs():
    """Chained population step executes on the sharded mesh path."""
    bundle = build_model("mixednet", _cfg())
    packed = _packed()
    mesh = create_mesh()
    n = mesh.devices.size
    variables, history = train_population(
        bundle, packed, n_models=n, steps=12, batch_size=8,
        features_length=20, mesh=mesh, steps_per_call=4, eval_interval=6,
    )
    assert [h["step"] for h in history] == [6, 12]
    assert np.isfinite(history[-1]["loss"]).all()


def test_share_batch_member0_matches_private_and_members_share_stream():
    """share_batch=True (sweep throughput mode): member 0 is bit-identical
    to the private-batch run with the same keys, and members with identical
    init/hyperparameters stay identical (they train on the same batches)."""
    bundle = build_model("mixednet", _cfg())
    packed = _packed()
    n = 3
    # members 1 and 2 share an init seed; member 0 differs
    variables = init_population(bundle, [7, 5, 5])
    optimizer, shared = make_population_train_step(
        bundle, packed, 8, 20, share_batch=True
    )
    _, private = make_population_train_step(
        bundle, packed, 8, 20, share_batch=False
    )
    opt_state = jax.vmap(optimizer.init)(variables["params"])
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(n, dtype=jnp.uint32))
    args = (jnp.full((n,), 0.01), jnp.ones((n,)), jnp.ones((n,)))
    kw = dict(time_mask_max_size=0, time_mask_count=0,
              freq_mask_max_size=0, freq_mask_count=0)

    ps, bss, oss = variables["params"], variables["batch_stats"], opt_state
    pp, bsp, osp = variables["params"], variables["batch_stats"], opt_state
    for i in range(5):
        step_keys = jax.vmap(
            lambda k: jax.random.fold_in(k, i)
        )(keys)
        ps, bss, oss, ms = shared(ps, bss, oss, step_keys, *args, **kw)
        pp, bsp, osp, mp = private(pp, bsp, osp, step_keys, *args, **kw)

    # member 0: shared == private (it defines the shared batch stream)
    for a, b in zip(
        jax.tree.leaves(jax.tree.map(lambda x: x[0], ps)),
        jax.tree.leaves(jax.tree.map(lambda x: x[0], pp)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)
    # members 1 and 2: same init + same shared batches -> identical
    for leaf in jax.tree.leaves(ps):
        np.testing.assert_array_equal(np.asarray(leaf[1]), np.asarray(leaf[2]))
    # ... but in the private run they diverge (different batch streams)
    diffs = [
        float(np.abs(np.asarray(leaf[1]) - np.asarray(leaf[2])).max())
        for leaf in jax.tree.leaves(pp)
    ]
    assert max(diffs) > 1e-6


def test_share_batch_chained_matches_unchained():
    bundle = build_model("mixednet", _cfg())
    packed = _packed()
    n = 2
    variables = init_population(bundle, [1, 2])
    optimizer, one = make_population_train_step(
        bundle, packed, 8, 20, share_batch=True
    )
    _, chained = make_population_train_step(
        bundle, packed, 8, 20, share_batch=True, steps_per_call=4
    )
    opt_state = jax.vmap(optimizer.init)(variables["params"])
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(n, dtype=jnp.uint32))
    args = (jnp.full((n,), 0.01), jnp.ones((n,)), jnp.ones((n,)))
    kw = dict(time_mask_max_size=2, time_mask_count=1,
              freq_mask_max_size=2, freq_mask_count=1)

    p1, bs1, os1 = variables["params"], variables["batch_stats"], opt_state
    for i in range(1, 5):
        step_keys = jax.vmap(lambda k: jax.random.fold_in(k, i))(keys)
        p1, bs1, os1, _ = one(p1, bs1, os1, step_keys, *args, **kw)
    p4, bs4, os4, _ = chained(
        variables["params"], variables["batch_stats"], opt_state, keys,
        *args, jnp.int32(0), **kw
    )
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
