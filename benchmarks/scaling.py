#!/usr/bin/env python
"""Scaling-efficiency benchmark for the edge-partitioned processor.

Measures train-step edges/s of the InteractionNetwork stack at mesh
configurations (dp, graph) and reports efficiency vs the single-device
run — the ≥80% 1-chip → N-chips target (BASELINE.md).

On this round's single-chip environment it runs on the virtual CPU mesh
(code-path validation; absolute numbers are not TPU-representative):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/scaling.py
On a multi-chip host, run under tpu.sh with real devices.
"""
import os
import time

import numpy as np

if __name__ == "__main__" and os.environ.get("JAX_PLATFORMS") != "axon":
    # default to the virtual CPU mesh when no multi-chip TPU is present
    if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from magnet_tpu.models.common import Graph as GraphNT
from magnet_tpu.nn.graphnet import InteractionNetwork
from magnet_tpu.ops.graph import pad_graph, radius_graph_np
from magnet_tpu.parallel.graph_partition import (
    interaction_step_local,
    make_partitioned_processor,
    partition_graph,
)
from magnet_tpu.parallel.mesh import make_mesh


def run_config(dp, g_shards, n=1024, latent=64, steps=4, b_per_dp=2, iters=10):
    mesh = make_mesh(dp=dp, graph=g_shards)
    B = b_per_dp * dp
    rng = np.random.default_rng(0)
    pos = rng.uniform(-1, 1, (n, 2))
    r = float(np.sqrt(16 * 4 / (np.pi * n)))
    s, t = radius_graph_np(pos, r, loop=True)
    sg = partition_graph(s, t, n, g_shards)
    n_pad, e_shard = sg.n_node_pad, sg.senders.shape[1]

    inet = InteractionNetwork(
        node_out=latent, edge_out=latent, mlp_layers=2, mlp_hidden=latent
    )
    g1 = pad_graph(s, t, n_pad, e_pad=len(s))
    gs1 = GraphNT(
        senders=jnp.asarray(g1.senders),
        receivers=jnp.asarray(g1.receivers),
        edge_mask=jnp.asarray(g1.edge_mask),
        recv_edge_ids=jnp.asarray(g1.recv_edge_ids),
    )
    x1 = jnp.asarray(rng.normal(size=(n_pad, latent)).astype(np.float32))
    step_params = [
        inet.init(jax.random.PRNGKey(i), x1, jnp.zeros((len(s), latent)), gs1)
        for i in range(steps)
    ]

    def iapply(params_i, x_full, ee, senders, recv_loc, mask, table):
        return interaction_step_local(
            inet, params_i, x_full, ee, senders, recv_loc, mask, table
        )

    runner = make_partitioned_processor(iapply, steps, mesh)

    ed = NamedSharding(mesh, P("dp", "graph"))
    x = jax.device_put(
        jnp.asarray(rng.normal(size=(B, n_pad, latent)).astype(np.float32)), ed
    )
    e = jax.device_put(
        jnp.asarray(
            rng.normal(size=(B, g_shards, e_shard, latent)).astype(np.float32)
        ),
        ed,
    )
    gargs = [
        jax.device_put(
            jnp.broadcast_to(jnp.asarray(a)[None], (B,) + a.shape), ed
        )
        for a in (sg.senders, sg.receivers_loc, sg.edge_mask, sg.recv_edge_ids)
    ]

    @jax.jit
    def train(params, x, e):
        def lfn(p):
            out, _ = runner(p, x, e, *gargs)
            return jnp.mean(out**2)

        loss, grads = jax.value_and_grad(lfn)(params)
        return loss, grads

    loss, grads = train(step_params, x, e)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, grads = train(step_params, x, e)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters
    eps = B * len(s) * steps / dt
    return eps, dt


def main():
    n_dev = len(jax.devices())
    print(f"devices: {n_dev} ({jax.devices()[0].platform})")
    base, dt = run_config(1, 1)
    print(f"dp=1 graph=1: {base/1e6:9.2f} M edges/s  ({dt*1e3:.1f} ms/step)")
    for dp, g in [(2, 1), (1, 2), (2, 2), (4, 2), (2, 4)]:
        if dp * g > n_dev:
            continue
        eps, dt = run_config(dp, g)
        # per-device efficiency vs single-device baseline
        eff = eps / (base * dp)  # dp scales work; graph shards split the same work
        print(f"dp={dp} graph={g}: {eps/1e6:9.2f} M edges/s  "
              f"({dt*1e3:.1f} ms/step)  eff_vs_dp_scaled={eff:.2f}")


if __name__ == "__main__":
    main()
