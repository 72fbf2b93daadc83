#!/usr/bin/env python
"""Micro-benchmarks for the message-passing hot path components (TPU).

Times each stage of one InteractionNetwork step at bench shapes to locate
the bottleneck: gathers, edge MLP matmuls, Pallas aggregation, full step.
Run: ./tpu.sh python benchmarks/micro.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from magnet_tpu.models.common import build_radius_graph_batch
from magnet_tpu.ops.pallas_kernels import blocked_segment_sum


def timeit(name, fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:8.3f} ms")
    return dt


def main():
    B, N, C, H = 4, 2048, 128, 128
    rng = np.random.default_rng(0)
    coords = rng.uniform(-1, 1, (B, N, 2)).astype(np.float32)
    r = float(np.sqrt(20 * 4 / (np.pi * N)))
    g = build_radius_graph_batch(coords, r, loop=True)
    T, ET = g.blk_recv_local.shape[1:]
    E = T * ET
    print(f"B={B} N={N} T={T} E_TILE={ET} E={E} "
          f"real_edges/sample={float(np.asarray(g.edge_mask).sum())/B:.0f}")

    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(B, E, C)).astype(np.float32))
    msgs = jnp.asarray(rng.normal(size=(B, T, ET, C)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.normal(size=(H, H)).astype(np.float32) * 0.05)

    # 1. pure gather: (B, E) rows from (B, N, C)
    @jax.jit
    def gather(x, idx):
        return jax.vmap(lambda a, i: jnp.take(a, i, axis=0))(x, idx)

    timeit("gather x[receivers] (B,E,C)", gather, x, g.receivers)

    # 2. edge matmul (E, C) @ (C, H)
    @jax.jit
    def emm(e, w):
        return jnp.einsum("bec,ch->beh", e, w)

    timeit("edge matmul (B,E,C)@(C,H)", emm, e, w1)

    # 3. Pallas blocked aggregation fwd
    @jax.jit
    def agg(m, rl, mask):
        return jax.vmap(lambda a, b, c: blocked_segment_sum(a, b, c, 128))(
            m, rl, mask
        )

    timeit("pallas blocked_segment_sum", agg, msgs,
           g.blk_recv_local, g.edge_mask.reshape(B, T, ET))

    # 4. aggregation backward (take_along_axis)
    @jax.jit
    def aggbwd(m, rl, mask):
        def f(a, b, c):
            return jnp.sum(blocked_segment_sum(a, b, c, 128) ** 2)

        return jax.vmap(jax.grad(f))(m, rl, mask)

    timeit("pallas agg fwd+bwd", aggbwd, msgs,
           g.blk_recv_local, g.edge_mask.reshape(B, T, ET))

    # 5. gather backward (scatter-add)
    @jax.jit
    def gatherbwd(x, idx):
        def f(a):
            return jnp.sum(gather(a, idx) ** 2)

        return jax.grad(f)(x)

    timeit("gather fwd+bwd (scatter-add)", gatherbwd, x, g.receivers)

    # 6. layernorm over edges
    @jax.jit
    def ln(e):
        mu = e.mean(-1, keepdims=True)
        v = e.var(-1, keepdims=True)
        return (e - mu) * jax.lax.rsqrt(v + 1e-5)

    timeit("layernorm (B,E,C)", ln, e)

    # 7. full InteractionNetwork step fwd
    from flax import linen as fnn

    from magnet_tpu.models.common import batch_vmap
    from magnet_tpu.nn.graphnet import InteractionNetwork

    inet = batch_vmap(
        InteractionNetwork, in_axes=(0, 0, 0),
        node_out=C, edge_out=C, mlp_layers=2, mlp_hidden=H,
    )
    params = inet.init(jax.random.PRNGKey(0), x, e, g)

    @jax.jit
    def full(p, x, e):
        return inet.apply(p, x, e, g)

    timeit("InteractionNetwork step fwd", full, params, x, e)

    @jax.jit
    def fullbwd(p, x, e):
        def f(xx, ee):
            a, b = inet.apply(p, xx, ee, g)
            return jnp.sum(a**2) + jnp.sum(b**2)

        return jax.grad(f, argnums=(0, 1))(x, e)

    timeit("InteractionNetwork step fwd+bwd", fullbwd, params, x, e)


if __name__ == "__main__":
    main()
