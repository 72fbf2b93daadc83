#!/bin/bash
# Run python WITH the real TPU (axon tunnel).  Preserves the axon sitecustomize
# on PYTHONPATH; one TPU process at a time (the tunnel serializes claims).
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
case ":$PYTHONPATH:" in *:/root/.axon_site:*) ;; *) export PYTHONPATH="$PYTHONPATH:/root/.axon_site";; esac
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/magnet_jax_cache_tpu}"
exec "$@"
