#!/usr/bin/env python
"""Micro-benchmarks for the message-passing hot path components (TPU).

Times each stage of one InteractionNetwork step at bench shapes to locate
the bottleneck: gathers, edge MLP matmuls, Pallas aggregation, full step.

Methodology (see roofline.py): each op is chained K times inside one jit
lax.scan for K in (4, 16, 64); a least-squares fit of wall(K) separates
device ms/iter (slope) from the axon relay's fixed per-call overhead
(intercept).  Naive host loops either hit the relay's result cache
(repeated identical calls) or pay a ~40 ms round trip per call.

Run: ./tpu.sh python benchmarks/micro.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from magnet_tpu.models.common import build_radius_graph_batch
from magnet_tpu.ops.pallas_kernels import blocked_segment_sum

KS = (4, 16, 64)


def slope_time(step, x, reps=3):
    """Per-iteration device time (s) for x = step(x) chained on-device."""
    totals = []
    for K in KS:
        @jax.jit
        def prog(x, K=K):
            out, _ = jax.lax.scan(lambda c, _: (step(c), None), x, None,
                                  length=K)
            return out

        out = prog(x)
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = prog(x)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        totals.append(float(np.median(ts)))
    slope, _ = np.polyfit(KS, totals, 1)
    return float(slope)


def timeit(name, step, x):
    dt = slope_time(step, x)
    print(f"{name:42s} {dt*1e3:8.3f} ms", flush=True)
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
          f"real_edges/sample={float(np.asarray(g.edge_mask).sum())/B:.0f}",
          flush=True)

    x0 = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    e0 = jnp.asarray(rng.normal(size=(B, E, C)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32) * 0.05)

    # 1. pure gather: (B, E) rows from (B, N, C); fold output back to
    # (B, N, C) so the chain has a real data dependency and nothing DCEs
    k_fold = E // N

    def gather_step(x):
        out = jax.vmap(lambda a, i: jnp.take(a, i, axis=0))(x, g.receivers)
        folded = out[:, : k_fold * N].reshape(B, k_fold, N, C).sum(1)
        return x + 1e-6 * folded

    timeit("gather x[receivers] (B,E,C)", gather_step, x0)

    # 2. edge matmul (B,E,C)@(C,H), normalized chain
    def emm_step(e):
        out = jnp.einsum("bec,ch->beh", e, w1)
        return out * jax.lax.rsqrt(jnp.mean(out * out) + 1e-6)

    timeit("edge matmul (B,E,C)@(C,H)", emm_step, e0)

    # 3. Pallas blocked aggregation fwd (chain through a broadcast-back)
    msk = g.edge_mask.reshape(B, T, ET)

    def agg_step(m):
        out = jax.vmap(lambda a, b, c: blocked_segment_sum(a, b, c, 128))(
            m, g.blk_recv_local, msk
        )  # (B, N, C)
        gat = jax.vmap(lambda a, i: jnp.take(a, i, axis=0))(
            out.reshape(B, -1, C), g.receivers
        )
        return m + 1e-6 * gat.reshape(m.shape)

    msgs = jnp.asarray(rng.normal(size=(B, T, ET, C)).astype(np.float32))
    timeit("pallas agg (+chain gather)", agg_step, msgs)

    # 4. layernorm (B,E,C)
    def ln_step(e):
        mu = e.mean(-1, keepdims=True)
        v = e.var(-1, keepdims=True)
        return (e - mu) * jax.lax.rsqrt(v + 1e-5)

    timeit("layernorm (B,E,C)", ln_step, e0)

    # 5/6. full InteractionNetwork step fwd and fwd+bwd
    from magnet_tpu.models.common import batch_vmap
    from magnet_tpu.nn.graphnet import InteractionNetwork

    for dt_, nm in ((None, "f32"), (jnp.bfloat16, "bf16")):
        inet = batch_vmap(
            InteractionNetwork, in_axes=(0, 0, 0),
            node_out=C, edge_out=C, mlp_layers=2, mlp_hidden=H, dtype=dt_,
        )
        params = inet.init(jax.random.PRNGKey(0), x0, e0, g)

        def fwd_step(xe):
            x, e = xe
            xn, en = inet.apply(params, x, e, g)
            return (xn, en / 2.0)   # undo the e+e doubling to keep finite

        timeit(f"InteractionNetwork fwd {nm}", fwd_step, (x0, e0))

        def bwd_step(xe):
            x, e = xe

            def f(xx, ee):
                a, b = inet.apply(params, xx, ee, g)
                return jnp.mean(a**2) + jnp.mean(b**2)

            gx, ge = jax.grad(f, argnums=(0, 1))(x, e)
            nrm = jax.lax.rsqrt(jnp.mean(gx**2) + 1e-12)
            return (gx * nrm, ge * jax.lax.rsqrt(jnp.mean(ge**2) + 1e-12))

        timeit(f"InteractionNetwork fwd+bwd {nm}", bwd_step, (x0, e0))


if __name__ == "__main__":
    main()
