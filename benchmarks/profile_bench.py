#!/usr/bin/env python
"""Capture a device trace of the bench train step and print the per-op
time breakdown (top XLA ops by total device time).

Run: ./tpu.sh python benchmarks/profile_bench.py
Env: BENCH_* knobs as bench.py; PROF_DIR overrides the trace dir.
"""
import glob
import os
import sys
import time
from collections import defaultdict

import numpy as np


def run_and_trace(prof_dir):
    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as fnn

    from magnet_tpu.models.common import batch_vmap, build_radius_graph_batch
    from magnet_tpu.nn.graphnet import GraphDecoder, GraphEncoder, GraphProcessor
    from magnet_tpu.train.optim import make_optimizer

    B = int(os.environ.get("BENCH_B", 4))
    N = int(os.environ.get("BENCH_N", 2048))
    LATENT = int(os.environ.get("BENCH_LATENT", 128))
    MP_STEPS = int(os.environ.get("BENCH_MP", 10))
    DTYPE = {"float32": None, "bf16": jnp.bfloat16}[
        os.environ.get("BENCH_DTYPE", "bf16")]

    rng = np.random.default_rng(0)
    coords = rng.uniform(-1, 1, (B, N, 2)).astype(np.float32)
    # Morton-order like bench.py — without it the sender locality is too
    # poor for the in-kernel sender gather and this profiles the v1
    # kernel path instead of the headline fused2r/fold-e configuration
    if not os.environ.get("BENCH_NO_MORTON"):
        from magnet_tpu.ops.graph import morton_order

        coords = np.stack([c[morton_order(c)] for c in coords])
    r = float(np.sqrt(20 * 4 / (np.pi * N)))
    graph = build_radius_graph_batch(coords, r, loop=True)

    class Net(fnn.Module):
        @fnn.compact
        def __call__(self, nf, ef, g):
            enc = batch_vmap(GraphEncoder, in_axes=(0, 0), node_out=LATENT,
                             edge_out=LATENT, mlp_layers=2,
                             mlp_hidden=LATENT, dtype=DTYPE, name="enc")
            proc = batch_vmap(GraphProcessor, in_axes=(0, 0, 0),
                              latent_dim=LATENT, num_steps=MP_STEPS,
                              mlp_layers=2, mlp_hidden=LATENT,
                              dtype=DTYPE, name="proc")
            dec = batch_vmap(GraphDecoder, in_axes=(0,), node_out=16,
                             mlp_layers=2, mlp_hidden=LATENT,
                             dtype=DTYPE, name="dec")
            x, e = enc(nf, ef)
            x, _ = proc(x, e, g)
            return dec(x)

    net = Net()
    nf = jnp.asarray(rng.normal(size=(B, N, 16 + 3)).astype(np.float32))
    E = graph.senders.shape[1]
    ef = jnp.asarray(rng.normal(size=(B, E, 16 + 2)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(B, N, 16)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), nf, ef, graph)
    tx = make_optimizer(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, nf, ef, graph, target):
        def lfn(p):
            out = net.apply(p, nf, ef, graph)
            return jnp.mean(jnp.abs(out.astype(jnp.float32) - target))

        loss, grads = jax.value_and_grad(lfn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, nf, ef, graph,
                                       target)
    jax.block_until_ready(loss)

    with jax.profiler.trace(prof_dir):
        for _ in range(5):
            params, opt_state, loss = step(params, opt_state, nf, ef,
                                           graph, target)
        jax.block_until_ready(loss)


def summarize(prof_dir, top=30):
    from jax.profiler import ProfileData

    paths = sorted(glob.glob(os.path.join(prof_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        print("no xplane.pb found under", prof_dir)
        return
    pd = ProfileData.from_serialized_xspace(open(paths[-1], "rb").read())
    op_time = defaultdict(float)
    total = 0.0
    for plane in pd.planes:
        name = plane.name or ""
        # device planes only (skip host/python threads)
        if "TPU" not in name and "Device" not in name and "/device" not in name.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                key = ev.name
                op_time[key] += dur
                total += dur
    if not op_time:
        # fall back: dump plane names to understand the layout
        for plane in pd.planes:
            print("plane:", plane.name,
                  "lines:", sum(1 for _ in plane.lines))
        return
    print(f"total device event time: {total:.1f} ms (5 steps)")
    for k, v in sorted(op_time.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{v:10.3f} ms  {100*v/max(total,1e-9):5.1f}%  {k[:110]}")


if __name__ == "__main__":
    prof_dir = os.environ.get("PROF_DIR", "/tmp/magnet_prof")
    os.makedirs(prof_dir, exist_ok=True)
    if len(sys.argv) > 1 and sys.argv[1] == "summarize":
        summarize(prof_dir)
    else:
        run_and_trace(prof_dir)
        summarize(prof_dir)
