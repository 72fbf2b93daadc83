#!/usr/bin/env python
"""Chip roofline calibration: peak matmul TFLOP/s (f32/bf16) and peak
HBM copy bandwidth, to put the edges/s numbers in speed-of-light terms.

Run: ./tpu.sh python benchmarks/roofline.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)

    for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        k = 4096
        a = jnp.asarray(rng.normal(size=(k, k)), dtype=dt)
        b = jnp.asarray(rng.normal(size=(k, k)), dtype=dt)

        @jax.jit
        def mm(a, b):
            return a @ b

        dt_s = timeit(mm, a, b)
        tf = 2 * k**3 / dt_s / 1e12
        print(f"matmul {k}^3 {name:5s}: {dt_s*1e3:7.3f} ms  {tf:6.1f} TFLOP/s")

    # HBM bandwidth: big elementwise op (read + write)
    for mb in (64, 256, 1024):
        n = mb * 1024 * 1024 // 4
        x = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))

        @jax.jit
        def add1(x):
            return x + 1.0

        dt_s = timeit(add1, x)
        gbps = 2 * n * 4 / dt_s / 1e9
        print(f"copy {mb:5d} MB f32   : {dt_s*1e3:7.3f} ms  {gbps:6.1f} GB/s")

    # thin matmul at bench shape: (180k,128)@(128,128) — the edge-MLP shape
    E = 180224
    a = jnp.asarray(rng.normal(size=(E, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32))

    @jax.jit
    def thin(a, w):
        return a @ w

    dt_s = timeit(thin, a, w)
    tf = 2 * E * 128 * 128 / dt_s / 1e12
    gbps = (E * 128 * 2 + 128 * 128) * 4 / dt_s / 1e9
    print(f"thin matmul (180k,128)@(128,128) f32: {dt_s*1e3:7.3f} ms  "
          f"{tf:6.1f} TFLOP/s  {gbps:6.1f} GB/s")

    # dispatch overhead: trivial jitted op
    y = jnp.zeros((8, 128), jnp.float32)

    @jax.jit
    def tiny(y):
        return y + 1.0

    dt_s = timeit(tiny, y, iters=100)
    print(f"tiny dispatch          : {dt_s*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
