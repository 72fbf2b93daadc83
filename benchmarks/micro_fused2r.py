#!/usr/bin/env python
"""Isolated timing of the fused2rf (ragged fold-e) kernel: fwd and
fwd+bwd at bench shapes, via the K-scan slope methodology (roofline.py).
Fast inner loop for kernel-variant iteration — compiles in ~1 min vs the
full bench's several.

Run: ./tpu.sh python benchmarks/micro_fused2r.py
Env: BENCH_B/N/LATENT, MAGNET_TPU_* kernel knobs.
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from magnet_tpu.models.common import build_radius_graph_batch
from magnet_tpu.ops.graph import morton_order
from magnet_tpu.ops.pallas_kernels import fused_edge_tail_agg2rf

KS = (4, 16, 64)


def slope_time(prog_of_k, reps=3):
    ts = {}
    for K in KS:
        prog = prog_of_k(K)
        out = prog()
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            out = prog()
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        ts[K] = best
    ks = np.array(list(ts.keys()), dtype=np.float64)
    ws = np.array(list(ts.values()))
    slope, icept = np.polyfit(ks, ws, 1)
    return slope, icept


def main():
    B = int(os.environ.get("BENCH_B", 4))
    N = int(os.environ.get("BENCH_N", 2048))
    H = int(os.environ.get("BENCH_LATENT", 128))
    L1 = 1
    dt = jnp.bfloat16

    rng = np.random.default_rng(0)
    coords = rng.uniform(-1, 1, (B, N, 2)).astype(np.float32)
    coords = np.stack([c[morton_order(c)] for c in coords])
    r = float(np.sqrt(20 * 4 / (np.pi * N)))
    g = build_radius_graph_batch(coords, r, loop=True)
    T, et = g.blk_recv_local.shape[1:]
    E = T * et
    n_pad = T * 128
    e_real = float(np.asarray(g.edge_mask).sum()) / B

    def mk(shape, dtype=dt, scale=0.1):
        return jnp.asarray(
            (rng.normal(size=shape) * scale).astype(np.float32)).astype(dtype)

    e0 = mk((B, T, et, H))
    we = mk((B, H, H))
    be = mk((B, 1, H))
    pxj = mk((B, n_pad, H))
    pxi = mk((B, T, 128, H))
    wr = mk((B, L1, H, H))
    br = mk((B, L1, H))
    wo = mk((B, H, H))
    bo = mk((B, H), jnp.float32)
    ls = jnp.ones((B, H), jnp.float32)
    lb = jnp.zeros((B, H), jnp.float32)

    def call(e0, pxj, pxi, we, wr, wo):
        def one(e0, we, be, pxj, pxi, wr, br, wo, bo, ls, lb,
                tids, sl2, recv, mask, ct, cc, fl, sei, sl):
            return fused_edge_tail_agg2rf(
                e0, we, be, pxj, pxi, wr, br, wo, bo, ls, lb,
                tids, sl2, recv, mask.reshape(T, et), ct, cc, fl, sei, sl)
        return jax.vmap(one)(
            e0, we, be, pxj, pxi, wr, br, wo, bo, ls, lb,
            g.blk_snd2_tids, g.blk_snd2_local, g.blk_recv_local,
            g.edge_mask, g.blk_chunk_ct, g.blk_chunk_cc,
            g.blk_chunk_flag, g.blk_snd_edge_ids, g.blk_snd_local)

    # forward only: carry evolves pxj so calls aren't result-cached
    def fwd_prog(K):
        @jax.jit
        def p(pxj=pxj):
            def body(c, _):
                out = call(e0, c, pxi, we, wr, wo)
                upd = out.reshape(B, n_pad, H)[:, :, :H].astype(dt)
                return c + 1e-3 * upd, None
            c, _ = jax.lax.scan(body, pxj, None, length=K)
            return c
        return p

    # fwd+bwd: grad wrt (e0, pxj, we, wr, wo)
    def loss(e0, pxj, we, wr, wo):
        out = call(e0, pxj, pxi, we, wr, wo)
        return jnp.mean(jnp.abs(out))

    gfn = jax.grad(loss, argnums=(0, 1, 2, 3, 4))

    def bwd_prog(K):
        @jax.jit
        def p(pxj=pxj):
            def body(c, _):
                gs = gfn(e0, c, we, wr, wo)
                return c + 1e-3 * gs[1].astype(dt), None
            c, _ = jax.lax.scan(body, pxj, None, length=K)
            return c
        return p

    sf, _ = slope_time(fwd_prog)
    sb, _ = slope_time(bwd_prog)
    eps_f = B * e_real / sf
    eps_b = B * e_real / sb
    print(f"fwd : {sf*1e3:8.3f} ms/call  {eps_f/1e6:8.1f}M edges/s")
    print(f"f+b : {sb*1e3:8.3f} ms/call  {eps_b/1e6:8.1f}M edges/s")


if __name__ == "__main__":
    main()
