"""Isolates per-dispatch overhead on the current backend.

Times (a) a trivial jitted op (pure dispatch+tunnel latency), (b) the
fused train step per chained call, and (c) the host-side cost of passing
the packed corpus as a jit argument (pytree flatten of the packed
dataclass, paid per call since the pool-refresh change made the corpus an
argument).  Lets a bench-round throughput swing be attributed to
tunnel-day latency vs code changes.

Run: python scripts/dispatch_probe.py [--chunk 50] [--calls 20]
"""
import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--calls", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import _PHASE_KW, _fence, _flagship_model, _synthetic_packed
    from microwakeword_tpu.train.loop import make_train_step

    print("backend:", jax.default_backend(), file=sys.stderr)

    # (a) trivial dispatch: lower bound on per-call wall time
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128))
    _fence(f(x))
    t0 = time.perf_counter()
    for _ in range(args.calls):
        x = f(x)
    _fence(x)
    triv = (time.perf_counter() - t0) / args.calls

    cfg, bundle, variables = _flagship_model()
    packed = _synthetic_packed(cfg)

    # (c) host-side pytree flatten of the corpus (per-call wrapper cost)
    t0 = time.perf_counter()
    n_flat = 2000
    for _ in range(n_flat):
        jax.tree_util.tree_flatten(packed)
    flatten_us = (time.perf_counter() - t0) / n_flat * 1e6

    # (b) fused train step, chained `chunk` steps per call
    optimizer, step = make_train_step(
        bundle, packed, 128, cfg.spectrogram_length, steps_per_call=args.chunk
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt_state = optimizer.init(params)
    for i in range(2):
        params, batch_stats, opt_state, _ = step(
            params, batch_stats, opt_state, jax.random.PRNGKey(i), **_PHASE_KW
        )
    _fence(params)
    t0 = time.perf_counter()
    for k in range(args.calls):
        params, batch_stats, opt_state, _ = step(
            params, batch_stats, opt_state, jax.random.PRNGKey(100 + k),
            **_PHASE_KW,
        )
    _fence(params)
    dt = (time.perf_counter() - t0) / args.calls

    print({
        "trivial_dispatch_ms": round(triv * 1e3, 3),
        "fused_call_ms": round(dt * 1e3, 3),
        "fused_steps_per_sec": round(args.chunk / dt, 1),
        "corpus_flatten_us_per_call": round(flatten_us, 1),
        "chunk": args.chunk,
    })


if __name__ == "__main__":
    main()
