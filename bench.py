#!/usr/bin/env python
"""Headline benchmark: message-passing training throughput (edges/s/chip).

Runs the MAgNet GraphNet processor stack (the #1 hot loop, SURVEY.md §3:
per-edge gather -> edge MLP -> masked-mean scatter -> node MLP, x mp_steps)
as a full jitted train step (forward + backward + Adam) on a realistic
radius-graph workload, and reports processed edge-messages per second.

Prints ONE JSON line:
  {"metric": "mpnn_train_edges_per_s", "value": N, "unit": "edges/s",
   "vs_baseline": R}
vs_baseline compares against bench_baseline.json (recorded first
measurement) — the reference publishes no numbers (BASELINE.md).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as fnn

    # the axon relay occasionally fails backend init transiently
    # ("UNAVAILABLE: TPU backend setup/compile error").  jax caches the
    # failure, so retry by re-exec'ing the process (bounded by an env
    # counter) rather than zeroing the benchmark run.
    try:
        jax.devices()
    except Exception as e:  # pragma: no cover - infra flake path
        import sys
        tries = int(os.environ.get("BENCH_INIT_RETRY", "0"))
        if tries >= 2:
            raise
        print(f"backend init failed ({e}); re-exec retry {tries + 1}/2",
              flush=True)
        time.sleep(60)
        os.environ["BENCH_INIT_RETRY"] = str(tries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)

    from magnet_tpu.models.common import batch_vmap, build_radius_graph_batch
    from magnet_tpu.nn.graphnet import GraphDecoder, GraphEncoder, GraphProcessor
    from magnet_tpu.train.optim import make_optimizer

    B = int(os.environ.get("BENCH_B", 4))
    N = int(os.environ.get("BENCH_N", 2048))
    LATENT = int(os.environ.get("BENCH_LATENT", 128))
    MP_STEPS = int(os.environ.get("BENCH_MP", 10))
    MLP_LAYERS = 2
    T_IN = 16
    # Default bf16: the recommended TPU training mode — mixed-precision
    # GraphNet (bf16 MXU operands, f32 accumulation + LayerNorm in the
    # fused kernels), loss parity to 4 decimals vs fp32
    # (benchmarks/variants.py).  BENCH_DTYPE=float32 for the fp32 number.
    DTYPE = {"float32": None, "bf16": jnp.bfloat16}[
        os.environ.get("BENCH_DTYPE", "bf16")]

    rng = np.random.default_rng(0)
    coords = rng.uniform(-1, 1, (B, N, 2)).astype(np.float32)
    # Hilbert-order the nodes (host preprocessing; graph nets are
    # permutation-equivariant) — concentrates each tile's neighbors into
    # few sender tiles, enabling the in-kernel sender gather
    # (ops/pallas_kernels.py:fused_edge_tail_agg2).  BENCH_NO_MORTON=1
    # benchmarks the unordered layout.
    if not os.environ.get("BENCH_NO_MORTON"):
        from magnet_tpu.ops.graph import morton_order

        coords = np.stack([c[morton_order(c)] for c in coords])
    # radius for ~20 avg degree before the 32 cap: pi r^2 / 4 * N = 20
    r = float(np.sqrt(20 * 4 / (np.pi * N)))
    graph = build_radius_graph_batch(coords, r, loop=True)
    e_real = float(np.asarray(graph.edge_mask).sum()) / B

    class Net(fnn.Module):
        @fnn.compact
        def __call__(self, nf, ef, g):
            enc = batch_vmap(GraphEncoder, in_axes=(0, 0), node_out=LATENT,
                             edge_out=LATENT, mlp_layers=MLP_LAYERS,
                             mlp_hidden=LATENT, dtype=DTYPE, name="enc")
            proc = batch_vmap(GraphProcessor, in_axes=(0, 0, 0),
                              latent_dim=LATENT, num_steps=MP_STEPS,
                              mlp_layers=MLP_LAYERS, mlp_hidden=LATENT,
                              dtype=DTYPE, name="proc")
            dec = batch_vmap(GraphDecoder, in_axes=(0,), node_out=T_IN,
                             mlp_layers=MLP_LAYERS, mlp_hidden=LATENT,
                             dtype=DTYPE, name="dec")
            x, e = enc(nf, ef)
            x, _ = proc(x, e, g)
            return dec(x)

    net = Net()
    nf = jnp.asarray(rng.normal(size=(B, N, T_IN + 3)).astype(np.float32))
    E = graph.senders.shape[1]
    ef = jnp.asarray(rng.normal(size=(B, E, T_IN + 2)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(B, N, T_IN)).astype(np.float32))

    params = net.init(jax.random.PRNGKey(0), nf, ef, graph)
    tx = make_optimizer(1e-3)
    opt_state = tx.init(params)

    fwd_only = bool(os.environ.get("BENCH_FWD_ONLY"))
    # k optimizer steps per jitted call via lax.scan — amortizes per-step
    # dispatch exactly like Trainer(steps_per_call=k) does in real training
    scan_k = int(os.environ.get("BENCH_SCAN", 1))

    def one_step(params, opt_state, nf, ef, graph, target):
        def lfn(p):
            out = net.apply(p, nf, ef, graph)
            return jnp.mean(jnp.abs(out.astype(jnp.float32) - target))

        if fwd_only:
            return params, opt_state, lfn(params)
        loss, grads = jax.value_and_grad(lfn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if scan_k > 1:
        @jax.jit
        def step(params, opt_state, nf, ef, graph, target):
            def body(carry, _):
                p, o = carry
                p, o, loss = one_step(p, o, nf, ef, graph, target)
                return (p, o), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), None, length=scan_k
            )
            return params, opt_state, losses[-1]
    else:
        step = jax.jit(one_step)

    # warmup/compile
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, nf, ef, graph, target)
    jax.block_until_ready(loss)

    iters = int(os.environ.get("BENCH_ITERS", 20))
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, nf, ef, graph, target)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    edges_per_step = B * e_real * MP_STEPS
    value = edges_per_step * iters * scan_k / dt

    # every variant this benchmark can report gets its own pinned
    # comparator (VERDICT r4 weak #5: the unpinned fwd-only number rotted
    # 74.9M -> 175.6M silently).  The default train/bf16 combo keeps the
    # legacy key; other combos pin on first measurement.
    mode = "fwd" if fwd_only else "train"
    dtag = "bf16" if DTYPE is not None else "f32"
    key = ("mpnn_train_edges_per_s" if (mode, dtag) == ("train", "bf16")
           else f"mpnn_{mode}_{dtag}_edges_per_s")
    base_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    vs = 1.0
    base = {}
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
    if base.get(key):
        vs = value / base[key]
    else:
        base[key] = value
        with open(base_path, "w") as f:
            json.dump(base, f)

    from magnet_tpu.nn import graphnet

    lane = graphnet.LAST_FUSED_LANE
    print(json.dumps({
        "metric": key,
        "value": round(value, 1),
        "unit": "edges/s",
        "vs_baseline": round(vs, 4),
        # kernel lane actually taken (VERDICT r3 weak #1): fused2 table
        # residency mode + layout flags recorded at trace time
        "lane": (f"{lane['mode']}"
                 f"{'/snd2only' if lane['snd2_only'] else ''}"
                 f"{'/ragged' if lane['ragged'] else ''}"
                 f"{'/fold' if lane['fold'] else ''}"),
    }))


if __name__ == "__main__":
    main()
