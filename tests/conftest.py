"""Test config: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes a backend (SURVEY.md §4: test
strategy item 3 — exercises DP / graph-partition collectives without a pod).
"""
import os

# force CPU even when the ambient env selects a TPU platform: unit tests
# must be hermetic and fast (the TPU path is exercised by bench.py).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# parity tests compare against torch fp32: keep matmuls in fp32
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

# Under the ambient axon env, sitecustomize imports jax BEFORE this file
# runs, so the env vars above can come too late — force via jax.config
# (backends initialize lazily, so this still wins).
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compilation cache: first run compiles, reruns are fast
jax.config.update("jax_compilation_cache_dir", "/tmp/magnet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
