#!/usr/bin/env python
"""Probe: does Mosaic lower a same-shape VMEM row gather
(take_along_axis along the sublane axis, input/indices/output all
(N, H)) on this backend?  If yes, the one-hot gather matmuls in the
fused edge kernels (~70% of kernel FLOPs at the bench shape) can be
replaced by real gathers.

Run: ./tpu.sh python benchmarks/probe_gather.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def probe(desc, build):
    try:
        out, ref = build()
        ok = np.allclose(np.asarray(out), np.asarray(ref))
        print(f"[{'OK ' if ok else 'BAD'}] {desc}")
        return ok
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"[ERR] {desc}: {type(e).__name__}: {msg}")
        return False


def main():
    N, H = 2048, 128
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    tblb = tbl.astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, N, size=(N,)).astype(np.int32))

    # same-shape take_along_axis: out[r, c] = tbl[idx[r], c]
    def k_taa(tbl_ref, idx_ref, out_ref):
        ii = jnp.broadcast_to(idx_ref[...][:, None], (N, H))
        out_ref[...] = jnp.take_along_axis(tbl_ref[...], ii, axis=0)

    probe("take_along_axis same-shape f32 (2048x128)", lambda: (
        pl.pallas_call(
            k_taa, out_shape=jax.ShapeDtypeStruct((N, H), jnp.float32),
        )(tbl, idx),
        tbl[idx],
    ))

    def k_taab(tbl_ref, idx_ref, out_ref):
        ii = jnp.broadcast_to(idx_ref[...][:, None], (N, H))
        out_ref[...] = jnp.take_along_axis(tbl_ref[...], ii, axis=0)

    probe("take_along_axis same-shape bf16", lambda: (
        pl.pallas_call(
            k_taab, out_shape=jax.ShapeDtypeStruct((N, H), jnp.bfloat16),
        )(tblb, idx),
        tblb[idx],
    ))

    # smaller gather block: (128, H) out of a (128, H) tile — the
    # in-tile variant (gather within one 128-row window)
    def k_tile(tbl_ref, idx_ref, out_ref):
        ii = jnp.broadcast_to(idx_ref[...][:, None], (128, H))
        out_ref[...] = jnp.take_along_axis(tbl_ref[...], ii, axis=0)

    idx128 = jnp.asarray(rng.integers(0, 128, size=(128,)).astype(np.int32))
    probe("take_along_axis 128x128 tile f32", lambda: (
        pl.pallas_call(
            k_tile, out_shape=jax.ShapeDtypeStruct((128, H), jnp.float32),
        )(tbl[:128], idx128),
        tbl[:128][idx128],
    ))

    # timing: same-shape gather vs one-hot matmul chain for an
    # equivalent (2048, 128) gather
    def time_it(f, *args, iters=50):
        import functools as ft
        g = jax.jit(f)
        o = g(*args); jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(iters):
            o = g(*args)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / iters * 1e6

    def gather_pallas(tbl, idx):
        return pl.pallas_call(
            k_taa, out_shape=jax.ShapeDtypeStruct((N, H), jnp.float32),
        )(tbl, idx)

    # K-scan chained timing (relay result-caches identical calls):
    def chain(f):
        def g(tbl, idx):
            def body(c, _):
                return f(c, idx) * 0 + c + 1e-7, None
            out, _ = jax.lax.scan(body, tbl, None, length=20)
            return out
        return g

    us = time_it(chain(gather_pallas), tbl, idx)
    print(f"pallas same-shape gather ~{us/20:.1f} us/gather (chained)")


if __name__ == "__main__":
    main()
