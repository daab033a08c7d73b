"""Worker process for tests/test_multiprocess.py.

Runs as ``python tests/mp_worker.py <process_id> <workdir> <port>`` with a
sibling process so that jax.process_count() == 2 (CPU backend, gloo
cross-process collectives).  Exercises the REAL multi-host code paths that
single-process tests cannot (VERDICT r2 item 5 / SURVEY §2.3):

- jax.distributed.initialize + pod mesh construction over global devices
- per-host corpus packing (data/sampler.py pack_training_data sharding)
- SPMD training steps over a mesh that spans processes (gradient
  all-reduce crosses process boundaries)
- process-sharded streaming ROC with cross-process count summation
  (evaluate/streaming_eval.py _global_sum via multihost_utils)

Writes results to {workdir}/worker_{pid}.json for the parent to assert.
"""
import json
import os
import sys


def main():
    pid, workdir, port = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2, jax.devices()

    import numpy as np

    from microwakeword_tpu.data.store import FeatureHandler
    from microwakeword_tpu.evaluate import streaming_model_roc
    from microwakeword_tpu.models import build_model
    from microwakeword_tpu.models.mixednet import MixedNetConfig
    from microwakeword_tpu.train import loop as T

    with open(os.path.join(workdir, "config.json")) as f:
        config = json.load(f)
    fh = FeatureHandler(config)
    out = {"process_id": pid}

    # --- 1. per-host packing: this process's deterministic shard ---------
    packed_shard = fh.pack_training()  # defaults to process_index/count
    out["shard_clip_count"] = int(packed_shard.clip_length.shape[0])
    out["shard_frame_sum"] = int(np.sum(np.asarray(packed_shard.clip_length)))

    # --- 2. SPMD training over a mesh spanning both processes -----------
    # Replicated corpus (shard 0/1) so the sampled batches -- and hence the
    # losses -- must match a single-process run exactly (the mesh only
    # changes gradient reduction order).
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    cfg = MixedNetConfig(**config["model_cfg"])
    bundle = build_model("mixednet", cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    packed_full = fh.pack_training(0, 1)

    optimizer, step = T.make_train_step(
        bundle, packed_full, config["batch_size"], cfg.spectrogram_length,
        mesh=mesh,
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt_state = optimizer.init(params)
    losses = []
    for i in range(4):
        params, batch_stats, opt_state, m = step(
            params, batch_stats, opt_state, jax.random.PRNGKey(100 + i),
            learning_rate=0.01, time_mask_max_size=0, time_mask_count=0,
            freq_mask_max_size=0, freq_mask_count=0,
            positive_class_weight=1.0, negative_class_weight=1.0,
        )
        losses.append(float(m["loss"]))
    out["losses"] = losses

    # --- 3. process-sharded streamed ROC: global curve on each host -----
    roc = streaming_model_roc(
        bundle, {"params": params, "batch_stats": batch_stats}, fh, config
    )
    out["auc"] = float(roc["auc"])
    out["faph_at_cutoffs"] = [float(v) for v in roc["faph_at_cutoffs"]]
    out["frr_at_cutoffs"] = [float(v) for v in roc["frr_at_cutoffs"]]

    with open(os.path.join(workdir, f"worker_{pid}.json"), "w") as f:
        json.dump(out, f)
    print(f"worker {pid} ok", flush=True)


if __name__ == "__main__":
    main()
