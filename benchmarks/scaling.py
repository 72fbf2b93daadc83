#!/usr/bin/env python
"""Scaling-efficiency benchmark for the edge-partitioned processor.

Measures train-step (fwd+bwd) edges/s of the InteractionNetwork stack at
mesh configurations (dp, graph) for two partitioned variants —
  * allgather: node features all-gathered per mp step, plain gathers
  * fused:     per-shard BLOCKED layout + the real fused Pallas edge
               kernels (jnp fallbacks off-TPU) with halo all_to_all
— and reports efficiency vs the single-device baseline, which runs the
actual single-chip path (GraphProcessor on the blocked layout, i.e. the
same fused kernels).  ≥80% 1-chip → N-chips is the BASELINE.md target.

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

from magnet_tpu.models.common import Graph as GraphNT, build_radius_graph_batch
from magnet_tpu.nn.graphnet import GraphProcessor, InteractionNetwork
from magnet_tpu.ops.graph import radius_graph_np
from magnet_tpu.parallel.graph_partition import (
    FUSED_PG_KEYS,
    build_partition_buffers,
    build_partition_buffers_fused,
    interaction_step_local,
    make_partitioned_processor,
    make_partitioned_processor_halo_fused,
)
from magnet_tpu.parallel.mesh import make_mesh

N_NODES = int(os.environ.get("SCALING_N", 1024))
LATENT = int(os.environ.get("SCALING_LATENT", 64))
STEPS = int(os.environ.get("SCALING_MP", 4))
ITERS = int(os.environ.get("SCALING_ITERS", 10))


def _mesh_graph(n):
    rng = np.random.default_rng(0)
    pos = rng.uniform(-1, 1, (n, 2))
    r = float(np.sqrt(16 * 4 / (np.pi * n)))
    s, t = radius_graph_np(pos, r, loop=True)
    return pos, s, t


def _time(train, params, x, e, iters=ITERS):
    """Param-evolving pipelined timing loop (the axon relay result-caches
    repeated identical calls and a blocking round-trip costs ~40 ms —
    see benchmarks/roofline.py; evolving args defeats the cache, async
    dispatch hides the round-trip)."""
    params = train(params, x, e)
    jax.block_until_ready(params)
    t0 = time.perf_counter()
    for _ in range(iters):
        params = train(params, x, e)
    jax.block_until_ready(params)
    return (time.perf_counter() - t0) / iters


def run_single(n=N_NODES, latent=LATENT, steps=STEPS, b=2):
    """Single-device baseline: the real blocked-layout GraphProcessor."""
    pos, s, t = _mesh_graph(n)
    rng = np.random.default_rng(1)
    g = build_radius_graph_batch(
        np.broadcast_to(pos[None], (b,) + pos.shape).astype(np.float32),
        float(np.sqrt(16 * 4 / (np.pi * n))), loop=True,
    )
    proc = GraphProcessor(
        latent_dim=latent, num_steps=steps, mlp_layers=2, mlp_hidden=latent
    )
    from magnet_tpu.models.common import batch_vmap

    from flax import linen as fnn

    procb = batch_vmap(
        GraphProcessor, in_axes=(0, 0, 0),
        latent_dim=latent, num_steps=steps, mlp_layers=2, mlp_hidden=latent,
    )
    e_flat = g.senders.shape[1]
    x = jnp.asarray(rng.normal(size=(b, g.degree.shape[1], latent)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(b, e_flat, latent)).astype(np.float32))
    params = procb.init(jax.random.PRNGKey(0), x, e, g)

    @jax.jit
    def train(params, x, e):
        def lfn(p):
            out, _ = procb.apply(p, x, e, g)
            return jnp.mean(out**2)

        loss, grads = jax.value_and_grad(lfn)(params)
        return jax.tree.map(lambda p, gr: p - 1e-9 * gr, params, grads)

    dt = _time(train, params, x, e)
    return b * len(s) * steps / dt, dt, params


def run_config(dp, g_shards, variant, n=N_NODES, latent=LATENT, steps=STEPS,
               b_per_dp=2):
    mesh = make_mesh(dp=dp, graph=g_shards)
    B = b_per_dp * dp
    pos, s, t = _mesh_graph(n)
    rng = np.random.default_rng(1)
    raw = [(s, t)] * B
    inet = InteractionNetwork(
        node_out=latent, edge_out=latent, mlp_layers=2, mlp_hidden=latent
    )
    ns = -(-n // g_shards)
    n_pad = ns * g_shards
    x = jax.device_put(
        jnp.asarray(rng.normal(size=(B, n_pad, latent)).astype(np.float32)),
        NamedSharding(mesh, P("dp", "graph")),
    )
    bs = NamedSharding(mesh, P("dp"))
    eg = NamedSharding(mesh, P("dp", "graph"))

    # per-step params initialized from a dummy single call
    from magnet_tpu.ops.graph import pad_graph

    g1 = pad_graph(s, t, n_pad, e_pad=len(s))
    gs1 = GraphNT(
        senders=jnp.asarray(g1.senders),
        receivers=jnp.asarray(g1.receivers),
        edge_mask=jnp.asarray(g1.edge_mask),
        recv_edge_ids=jnp.asarray(g1.recv_edge_ids),
    )
    step_params = [
        inet.init(jax.random.PRNGKey(i), x[0], jnp.zeros((len(s), latent)),
                  gs1)
        for i in range(steps)
    ]
    # EVERY jit input must be explicitly placed on the mesh: mixing
    # committed (sharded) and uncommitted inputs makes the axon relay
    # reshard per call (~100x slowdown measured; see CLAUDE.md)
    rep = NamedSharding(mesh, P())
    step_params = jax.tree.map(lambda a: jax.device_put(a, rep), step_params)

    if variant == "fused":
        pg = build_partition_buffers_fused(raw, n, g_shards)
        for k in FUSED_PG_KEYS:
            if k in pg:
                pg[k] = jax.device_put(pg[k], eg)
        e_flat = pg["blk_rl"].shape[2] * pg["blk_rl"].shape[3]
        e = jax.device_put(
            jnp.asarray(
                rng.normal(size=(B, g_shards, e_flat, latent)).astype(np.float32)
            ),
            eg,
        )
        runner = make_partitioned_processor_halo_fused(
            inet, steps, mesh, set(pg.keys())
        )

        @jax.jit
        def train(params, x, e):
            def lfn(p):
                out, _ = runner(p, x, e, pg)
                return jnp.mean(out**2)

            loss, grads = jax.value_and_grad(lfn)(params)
            return jax.tree.map(lambda p, gr: p - 1e-9 * gr, params, grads)

    else:
        pg = build_partition_buffers(raw, n, g_shards)
        for k in ("senders", "recv_loc", "mask", "table"):
            pg[k] = jax.device_put(pg[k], eg)
        e_shard = pg["senders"].shape[2]
        e = jax.device_put(
            jnp.asarray(
                rng.normal(size=(B, g_shards, e_shard, latent)).astype(np.float32)
            ),
            eg,
        )

        def iapply(params_i, x_full, ee, senders, recv_loc, mask, table):
            return interaction_step_local(
                inet, params_i, x_full, ee, senders, recv_loc, mask, table
            )

        runner = make_partitioned_processor(iapply, steps, mesh)

        @jax.jit
        def train(params, x, e):
            def lfn(p):
                out, _ = runner(
                    p, x, e, pg["senders"], pg["recv_loc"], pg["mask"],
                    pg["table"],
                )
                return jnp.mean(out**2)

            loss, grads = jax.value_and_grad(lfn)(params)
            return jax.tree.map(lambda p, gr: p - 1e-9 * gr, params, grads)

    dt = _time(train, step_params, x, e)
    return B * len(s) * steps / dt, dt


def main():
    n_dev = len(jax.devices())
    print(f"devices: {n_dev} ({jax.devices()[0].platform})  "
          f"n={N_NODES} latent={LATENT} mp={STEPS}")
    base, dt, _ = run_single()
    print(f"single-device fused baseline: {base/1e6:9.2f} M edges/s  "
          f"({dt*1e3:.1f} ms/step)")
    # graph_shards=1 fused-partitioned vs unpartitioned: the partitioned
    # machinery's overhead with no communication (<10% target so that a
    # multi-chip run measures scaling, not kernel regression)
    eps1, dt1 = run_config(1, 1, "fused")
    print(f"[fused    ] dp=1 graph=1: {eps1/1e6:9.2f} M edges/s  "
          f"({dt1*1e3:.1f} ms/step)  overhead_vs_single={dt1/dt - 1:+.1%}")
    for variant in ("fused", "allgather"):
        for dp, g in [(1, 2), (2, 2), (1, 4), (2, 4)]:
            if dp * g > n_dev:
                continue
            eps, dtc = run_config(dp, g, variant)
            eff = eps / (base * dp)
            print(f"[{variant:9s}] dp={dp} graph={g}: {eps/1e6:9.2f} M "
                  f"edges/s  ({dtc*1e3:.1f} ms/step)  "
                  f"eff_vs_dp_scaled={eff:.2f}")


if __name__ == "__main__":
    main()
