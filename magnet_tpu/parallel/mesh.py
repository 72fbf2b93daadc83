"""Device mesh construction for (dp, graph) parallelism.

The reference's only parallelism is single-node DDP over NCCL
(configs/trainer/default.yaml:6, README.md:124-125).  Here the same program
scales from 1 chip to a pod slice via a ``jax.sharding.Mesh`` with two axes:

  * ``dp``    — data parallel over trajectories (batch axis);
  * ``graph`` — spatial/graph parallel: padded edge lists partitioned across
    chips with halo exchange over ICI (magnet_tpu/parallel/graph_partition).

Multi-host: call :func:`init_distributed` first (jax.distributed).
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed():
    """Initialize jax.distributed from standard env vars when present."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(dp: int = -1, graph: int = 1, devices=None) -> Mesh:
    """Mesh over (dp, graph).  dp=-1 uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp == -1:
        assert n % graph == 0, f"{n} devices not divisible by graph={graph}"
        dp = n // graph
    assert dp * graph <= n, f"need {dp * graph} devices, have {n}"
    arr = np.array(devices[: dp * graph]).reshape(dp, graph)
    return Mesh(arr, axis_names=("dp", "graph"))
