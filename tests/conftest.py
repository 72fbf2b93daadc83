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

# Persistent compilation cache: first run compiles, reruns are fast.
# Concurrent suite runs used to write-contend on one shared dir and
# SIGSEGV inside the zstandard cache write (VERDICT r3 weak #3).  Fix:
# each run gets a PRIVATE cache dir seeded from the shared dir via
# hardlinks (cheap, same filesystem), so no process ever writes a file
# another process touches; new entries are published back to the shared
# dir atomically (link to temp name + rename) at exit.
_SHARED_CACHE = os.environ.get("MAGNET_TPU_TEST_CACHE", "/tmp/magnet_jax_cache")
_RUN_CACHE = f"{_SHARED_CACHE}_run{os.getpid()}"
os.makedirs(_SHARED_CACHE, exist_ok=True)
os.makedirs(_RUN_CACHE, exist_ok=True)
for _f in os.listdir(_SHARED_CACHE):
    try:
        os.link(os.path.join(_SHARED_CACHE, _f), os.path.join(_RUN_CACHE, _f))
    except OSError:
        pass  # exists / vanished mid-scan — either way the run works

jax.config.update("jax_compilation_cache_dir", _RUN_CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _publish_cache():
    import shutil
    import uuid

    for f in os.listdir(_RUN_CACHE):
        dst = os.path.join(_SHARED_CACHE, f)
        if os.path.exists(dst):
            continue
        tmp = os.path.join(_SHARED_CACHE, f".tmp-{uuid.uuid4().hex}")
        try:
            os.link(os.path.join(_RUN_CACHE, f), tmp)
            os.rename(tmp, dst)  # atomic: readers see old-or-new, never partial
        except OSError:
            try:
                os.unlink(tmp)
            except OSError:
                pass
    shutil.rmtree(_RUN_CACHE, ignore_errors=True)


import atexit

atexit.register(_publish_cache)
