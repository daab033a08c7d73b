"""Benchmark: audio-seconds/s per chip for the frontend + training hot paths.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio_seconds_per_sec", "vs_baseline": N, ...}

- train: fused train step (on-device sampling + SpecAugment + fwd/bwd +
  Adam) on the flagship okay_nabu-style MixedNet (notebook recipe: batch
  128, 204x40 spectrograms = 2.04 s audio each).
- frontend: batched 16 kHz PCM -> 40-mel features pipeline.
- headline value: serial pipeline rate 1/(1/frontend + 1/train), i.e. the
  sustained audio-seconds/s if every training sample's features were also
  computed on-chip.

vs_baseline divides the headline by the measured reference throughput on
this host (tests/golden/reference_baseline.json: reference mixednet
train_on_batch ONLY -- its Python per-step data assembly is excluded, which
is generous to the reference).
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def measure_train(steps: int, batch: int):
    import jax
    import jax.numpy as jnp

    from microwakeword_tpu.data import sampler as S
    from microwakeword_tpu.models import build_model
    from microwakeword_tpu.models.presets import flagship_config
    from microwakeword_tpu.train.loop import make_train_step

    cfg = flagship_config()
    bundle = build_model("mixednet", cfg)
    variables = bundle.init(jax.random.PRNGKey(0))

    # Synthetic packed corpus ~ 1h of spectrograms.
    rng = np.random.default_rng(0)
    n_clips = 1500
    lengths = rng.integers(cfg.spectrogram_length, cfg.spectrogram_length + 120, n_clips)
    frames = rng.uniform(0, 660, (int(lengths.sum()), 40)).astype(np.uint16)
    offsets = np.concatenate([[0], np.cumsum(lengths)])[:-1]
    half = n_clips // 2
    packed = S.PackedTrainingData(
        frames=jnp.asarray(frames),
        clip_offset=jnp.asarray(offsets.astype(np.int32)),
        clip_length=jnp.asarray(lengths.astype(np.int32)),
        provider_logits=jnp.asarray([np.log(2.0), 0.0], jnp.float32),
        provider_clip_start=jnp.asarray([0, half], jnp.int32),
        provider_clip_count=jnp.asarray([half, n_clips - half], jnp.int32),
        provider_label=jnp.asarray([1.0, 0.0], jnp.float32),
        provider_penalty=jnp.asarray([1.0, 1.0], jnp.float32),
        provider_strategy=jnp.asarray([1, 0], jnp.int32),
        provider_cutoffs=jnp.zeros((2, S.MAX_CUTOFFS), jnp.int32),
        provider_n_cutoffs=jnp.asarray([1, 1], jnp.int32),
    )
    # Chained steps (train/loop.py steps_per_call): one XLA dispatch per
    # chunk, the way production configs run the hot loop.
    chunk = 100
    optimizer, step = make_train_step(
        bundle, packed, batch, cfg.spectrogram_length, steps_per_call=chunk
    )
    opt_state = optimizer.init(variables["params"])
    params, batch_stats = variables["params"], variables["batch_stats"]

    kw = dict(
        learning_rate=0.001,
        time_mask_max_size=5,
        time_mask_count=2,
        freq_mask_max_size=5,
        freq_mask_count=2,
        positive_class_weight=1.0,
        negative_class_weight=20.0,
    )
    # warmup/compile
    for i in range(2):
        params, batch_stats, opt_state, m = step(
            params, batch_stats, opt_state, jax.random.PRNGKey(i), **kw
        )
    jax.block_until_ready(params)
    n_calls = max(1, steps // chunk)
    t0 = time.perf_counter()
    for i in range(n_calls):
        params, batch_stats, opt_state, m = step(
            params, batch_stats, opt_state, jax.random.PRNGKey(100 + i), **kw
        )
    jax.block_until_ready(params)
    dt = (time.perf_counter() - t0) / (n_calls * chunk)
    audio_s_per_batch = batch * cfg.spectrogram_length * 0.010
    return {
        "steps_per_sec": 1.0 / dt,
        "audio_seconds_per_sec": audio_s_per_batch / dt,
        "spectrogram_length": cfg.spectrogram_length,
        "batch": batch,
    }


def measure_population(n_models: int, steps: int, batch: int):
    """Sweep throughput: n_models trained concurrently (parallel/population)."""
    import jax
    import jax.numpy as jnp

    from microwakeword_tpu.data import sampler as S
    from microwakeword_tpu.models import build_model
    from microwakeword_tpu.models.presets import flagship_config
    from microwakeword_tpu.parallel.population import (
        init_population,
        make_population_train_step,
    )

    cfg = flagship_config()
    bundle = build_model("mixednet", cfg)
    rng = np.random.default_rng(0)
    n_clips = 800
    lengths = rng.integers(cfg.spectrogram_length, cfg.spectrogram_length + 60, n_clips)
    frames = rng.uniform(0, 660, (int(lengths.sum()), 40)).astype(np.uint16)
    offsets = np.concatenate([[0], np.cumsum(lengths)])[:-1]
    half = n_clips // 2
    packed = S.PackedTrainingData(
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
    variables = init_population(bundle, range(n_models))
    optimizer, step = make_population_train_step(
        bundle, packed, batch, cfg.spectrogram_length
    )
    opt_state = jax.vmap(optimizer.init)(variables["params"])
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(n_models, dtype=jnp.uint32))
    args = (jnp.full((n_models,), 0.001), jnp.ones((n_models,)),
            jnp.full((n_models,), 20.0))
    kw = dict(time_mask_max_size=5, time_mask_count=2,
              freq_mask_max_size=5, freq_mask_count=2)
    p, bs, os_, m = step(
        variables["params"], variables["batch_stats"], opt_state, keys, *args, **kw
    )
    jax.block_until_ready(p)
    t0 = time.perf_counter()
    for i in range(steps):
        keys = jax.vmap(lambda k: jax.random.fold_in(k, i))(keys)
        p, bs, os_, m = step(p, bs, os_, keys, *args, **kw)
    jax.block_until_ready(p)
    dt = (time.perf_counter() - t0) / steps
    return {
        "n_models": n_models,
        "model_steps_per_sec": n_models / dt,
        "audio_seconds_per_sec": n_models * batch * cfg.spectrogram_length * 0.01 / dt,
    }


def measure_frontend(reps: int, batch: int = 64, clip_s: float = 3.0,
                     backend: str = "xla"):
    import jax
    import jax.numpy as jnp

    if backend == "pallas":
        from microwakeword_tpu.frontend import pallas as fmod
    else:
        from microwakeword_tpu.frontend import xla as fmod

    n = int(16000 * clip_s)
    rng = np.random.default_rng(0)
    audio = rng.integers(-8000, 8000, (batch, n)).astype(np.int16)

    audio_j = jnp.asarray(audio)
    out = fmod.frontend_batch(audio_j, step_ms=10)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fmod.frontend_batch(audio_j, step_ms=10)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    return {
        "audio_seconds_per_sec": batch * clip_s / dt,
        "batch_seconds": dt,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer reps")
    ap.add_argument("--steps", type=int, default=None)
    args = ap.parse_args()

    import jax

    backend = jax.default_backend()
    steps = args.steps or (200 if args.quick else 500)

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    train = measure_train(steps, batch=128)
    log(f"[bench] train done {time.perf_counter()-t0:.0f}s")
    frontend = measure_frontend(30 if args.quick else 100)
    log(f"[bench] frontend done {time.perf_counter()-t0:.0f}s")
    sweep = measure_population(8, 15 if args.quick else 60, batch=128)
    log(f"[bench] sweep done {time.perf_counter()-t0:.0f}s")

    fe, tr = frontend["audio_seconds_per_sec"], train["audio_seconds_per_sec"]
    combined = 1.0 / (1.0 / fe + 1.0 / tr)

    baseline_path = os.path.join(
        os.path.dirname(__file__), "tests", "golden", "reference_baseline.json"
    )
    baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
    baseline_rate = baseline["audio_seconds_per_sec"] if baseline else 7229.0

    result = {
        "metric": "audio-seconds/s per chip (frontend+train), flagship MixedNet",
        "value": round(combined, 1),
        "unit": "audio_seconds_per_sec",
        "vs_baseline": round(combined / baseline_rate, 2),
        "backend": backend,
        "train_audio_s_per_s": round(tr, 1),
        "train_steps_per_sec": round(train["steps_per_sec"], 2),
        "frontend_audio_s_per_s": round(fe, 1),
        "sweep8_audio_s_per_s": round(sweep["audio_seconds_per_sec"], 1),
        "sweep8_model_steps_per_sec": round(sweep["model_steps_per_sec"], 1),
        "baseline": {
            "audio_seconds_per_sec": baseline_rate,
            "what": (baseline or {}).get("what", "estimate"),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
