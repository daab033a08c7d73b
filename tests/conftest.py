"""Test configuration: run JAX on CPU with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4).

Note: this environment preloads jax via an axon sitecustomize with
JAX_PLATFORMS=axon, so env vars set here are too late -- use jax.config
(backends initialize lazily, so this works as long as no jax computation
ran at import time).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
