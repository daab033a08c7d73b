"""Capture a jax profiler trace of a bench phase and print the op-level
time breakdown (the committed evidence for documentation/architecture.md's
bottleneck claims -- VERDICT r3 items 1 and 2).

Usage:
  python scripts/trace_summary.py --phase fused --batch 256 --chunk 100
  python scripts/trace_summary.py --phase population --batch 128 --chunk 25
  python scripts/trace_summary.py --phase train --batch 256 --chunk 100

Parses the trace-viewer JSON the profiler writes (plugins/profile/*/
*.trace.json.gz), aggregates device-lane event durations by op name, and
prints a table of the top ops plus lane totals.  The device lanes' busy
time vs the wall time of the timed region separates "device is slow" from
"device is idle waiting for dispatch".
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_phase(phase, batch, chunk, steps, trace_dir, share_batch=True):
    import jax

    import bench

    t_timed = None
    if phase == "fused":
        cfg, bundle, variables = bench._flagship_model()
        packed = bench._synthetic_packed_audio(cfg)
        samples, _, _ = bench._run_train_loop(
            bundle, variables, packed, cfg, 2 * chunk, batch, chunk=chunk,
            reps=1, measure_bytes=False,
        )  # warmup path compiles everything
        # timed, traced region: a few chunked calls
        from microwakeword_tpu.train.loop import make_train_step

        optimizer, step = make_train_step(
            bundle, packed, batch, cfg.spectrogram_length, steps_per_call=chunk
        )
        params, batch_stats = variables["params"], variables["batch_stats"]
        opt_state = optimizer.init(params)
        kw = bench._PHASE_KW
        params, batch_stats, opt_state, m = step(
            params, batch_stats, opt_state, jax.random.PRNGKey(0), **kw
        )
        bench._fence(params)
        with jax.profiler.trace(trace_dir):
            t0 = time.perf_counter()
            for i in range(steps // chunk or 1):
                params, batch_stats, opt_state, m = step(
                    params, batch_stats, opt_state, jax.random.PRNGKey(1 + i),
                    **kw,
                )
            bench._fence(params)
            t_timed = time.perf_counter() - t0
        n_steps = chunk * (steps // chunk or 1)
    elif phase == "train":
        cfg, bundle, variables = bench._flagship_model()
        packed = bench._synthetic_packed(cfg)
        from microwakeword_tpu.train.loop import make_train_step

        optimizer, step = make_train_step(
            bundle, packed, batch, cfg.spectrogram_length, steps_per_call=chunk
        )
        params, batch_stats = variables["params"], variables["batch_stats"]
        opt_state = optimizer.init(params)
        kw = bench._PHASE_KW
        params, batch_stats, opt_state, m = step(
            params, batch_stats, opt_state, jax.random.PRNGKey(0), **kw
        )
        bench._fence(params)
        with jax.profiler.trace(trace_dir):
            t0 = time.perf_counter()
            for i in range(steps // chunk or 1):
                params, batch_stats, opt_state, m = step(
                    params, batch_stats, opt_state, jax.random.PRNGKey(1 + i),
                    **kw,
                )
            bench._fence(params)
            t_timed = time.perf_counter() - t0
        n_steps = chunk * (steps // chunk or 1)
    elif phase == "population":
        import jax.numpy as jnp

        from microwakeword_tpu.parallel.population import (
            init_population,
            make_population_train_step,
        )

        n_models = 8
        cfg, bundle, _ = bench._flagship_model()
        packed = bench._synthetic_packed(cfg, n_clips=800)
        variables = init_population(bundle, range(n_models))
        optimizer, step = make_population_train_step(
            bundle, packed, batch, cfg.spectrogram_length, steps_per_call=chunk,
            share_batch=share_batch,
        )
        opt_state = jax.vmap(optimizer.init)(variables["params"])
        keys = jax.vmap(jax.random.PRNGKey)(
            jnp.arange(n_models, dtype=jnp.uint32)
        )
        args = (jnp.full((n_models,), 0.001), jnp.ones((n_models,)),
                jnp.full((n_models,), 20.0))
        kw = dict(time_mask_max_size=5, time_mask_count=2,
                  freq_mask_max_size=5, freq_mask_count=2)
        p, bs, os_, m = step(
            variables["params"], variables["batch_stats"], opt_state, keys,
            *args, jnp.int32(0), **kw
        )
        bench._fence(p)
        with jax.profiler.trace(trace_dir):
            t0 = time.perf_counter()
            for i in range(steps // chunk or 1):
                p, bs, os_, m = step(
                    p, bs, os_, keys, *args, jnp.int32((i + 1) * chunk), **kw
                )
            bench._fence(p)
            t_timed = time.perf_counter() - t0
        n_steps = chunk * (steps // chunk or 1)
    else:
        raise SystemExit(f"unknown phase {phase}")
    return t_timed, n_steps


def summarize(trace_dir, t_timed, n_steps, top=40):
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        raise SystemExit(f"no trace found under {trace_dir}")
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # pid/tid -> lane name
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", str(e["pid"]))
    lane = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lane[(e["pid"], e["tid"])] = (
                f"{names.get(e['pid'], e['pid'])}/{e['args'].get('name')}"
            )
    # aggregate complete events on device lanes
    per_op = collections.Counter()
    per_op_n = collections.Counter()
    per_lane = collections.Counter()
    for e in events:
        if e.get("ph") != "X":
            continue
        ln = lane.get((e.get("pid"), e.get("tid")), "")
        if "TPU" not in names.get(e.get("pid"), "") and "/device:" not in ln:
            continue
        # XLA op lanes are named like 'XLA Ops' / 'Steps'; keep op lanes
        if "XLA Ops" not in ln and "Ops" not in ln:
            continue
        dur = e.get("dur", 0)  # microseconds
        per_op[e.get("name", "?")] += dur
        per_op_n[e.get("name", "?")] += 1
        per_lane[ln] += dur
    total_us = sum(per_lane.values())
    print(f"timed wall: {t_timed*1e6:.0f} us for {n_steps} steps "
          f"({t_timed/n_steps*1e6:.1f} us/step)")
    print(f"device op lanes busy: {total_us:.0f} us "
          f"({100.0*total_us/(t_timed*1e6):.1f}% of wall)")
    for ln, us in per_lane.most_common():
        print(f"  lane {ln}: {us:.0f} us")
    print(f"\ntop {top} ops by device time:")
    print(f"{'op':<64}{'us_total':>12}{'count':>8}{'us/step':>10}{'%':>7}")
    for name, us in per_op.most_common(top):
        print(f"{name[:63]:<64}{us:>12.0f}{per_op_n[name]:>8}"
              f"{us/n_steps:>10.2f}{100.0*us/max(total_us,1):>7.1f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="fused",
                    choices=["fused", "train", "population"])
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--share-batch", type=int, default=1,
                    help="population phase: 1=shared batch stream, 0=private")
    ap.add_argument("--keep", type=str, default=None,
                    help="keep the raw trace in this directory")
    args = ap.parse_args()
    trace_dir = args.keep or tempfile.mkdtemp(prefix="mww_trace_")
    t_timed, n_steps = run_phase(
        args.phase, args.batch, args.chunk, args.steps, trace_dir,
        share_batch=bool(args.share_batch),
    )
    summarize(trace_dir, t_timed, n_steps, args.top)
    print(f"\nraw trace: {trace_dir}")


if __name__ == "__main__":
    main()
