#!/bin/bash
# Run python without claiming the TPU (axon sitecustomize gates on
# PALLAS_AXON_POOL_IPS).  Use for unit tests and host-side work; anything
# that needs the real chip must run WITH the ambient env, one process at a
# time.
export PYTHONPATH="/root/repo:${PYTHONPATH}"
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu "$@"
