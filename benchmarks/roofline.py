#!/usr/bin/env python
"""Chip roofline calibration: peak matmul TFLOP/s (f32/bf16) and peak
HBM bandwidth, to put the edges/s numbers in speed-of-light terms.

Methodology: each op is chained K times inside one jit program via
lax.scan, for K in (8, 32, 128); a least-squares line over total wall
time vs K separates the per-iteration device time (slope) from the fixed
per-program dispatch/round-trip overhead of the axon relay (intercept,
~tens of ms when the host blocks between calls).  Host-side repetition is
unusable: repeated identical (fn, args) calls get result-cached by the
dispatch path ("3695 TFLOP/s"), and blocking host-chained calls eat the
full round-trip per call.

Run: ./tpu.sh python benchmarks/roofline.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

KS = (8, 32, 128)


def dev_time(step, x, reps=5):
    """Per-iteration device time via slope of wall(K); also returns the
    per-call overhead intercept."""
    totals = []
    for K in KS:
        @jax.jit
        def prog(x, K=K):
            def body(c, _):
                return step(c), None

            out, _ = jax.lax.scan(body, x, None, length=K)
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
    slope, intercept = np.polyfit(KS, totals, 1)
    return float(slope), float(intercept)


def report(label, slope, intercept, flops=0, bytes_=0):
    parts = [f"{label:42s} {slope*1e3:8.4f} ms/iter  "
             f"(+{intercept*1e3:6.1f} ms/call)"]
    if flops:
        parts.append(f"{flops / slope / 1e12:7.1f} TFLOP/s")
    if bytes_:
        parts.append(f"{bytes_ / slope / 1e9:7.1f} GB/s")
    print("  ".join(parts), flush=True)


def main():
    rng = np.random.default_rng(0)

    for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        k = 4096
        a = jnp.asarray(rng.normal(size=(k, k)) / np.sqrt(k), dtype=dt)
        b = jnp.asarray(rng.normal(size=(k, k)) / np.sqrt(k), dtype=dt)

        def mm(a):
            out = a @ b
            return (out * jax.lax.rsqrt(
                jnp.mean(out.astype(jnp.float32) ** 2) + 1e-6
            ).astype(out.dtype)).astype(a.dtype)

        s, i = dev_time(mm, a)
        report(f"matmul {k}^3 {name}", s, i, flops=2 * k**3)

    for mb in (512,):
        n = mb * 1024 * 1024 // 4
        x = jnp.zeros((n,), jnp.float32)

        def add1(x):
            return x + 1.0

        s, i = dev_time(add1, x)
        report(f"copy {mb} MB f32", s, i, bytes_=2 * n * 4)

    for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        E = 180224
        a = jnp.asarray(rng.normal(size=(E, 128)), dtype=dt)
        w = jnp.asarray(rng.normal(size=(128, 128)) / 16.0, dtype=dt)

        def thin(a):
            out = a @ w
            return (out * jax.lax.rsqrt(jnp.mean(
                out.astype(jnp.float32) ** 2) + 1e-6).astype(out.dtype)
                    ).astype(a.dtype)

        s, i = dev_time(thin, a)
        bs = 2 if dt == jnp.bfloat16 else 4
        report(f"thin matmul (180k,128)@(128,128) {name}", s, i,
               flops=2 * E * 128 * 128, bytes_=E * 128 * 2 * bs)

    # random row gather, FULL output consumed (reduce back to table shape
    # with a real dependency so nothing is DCE'd): 180k rows from (8k,128)
    N, E = 8192, 180224
    idx = jnp.asarray(rng.integers(0, N, size=(E,)), jnp.int32)
    xg = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))

    def gath(x):
        out = jnp.take(x, idx, axis=0)            # (E, 128)
        folded = out.reshape(-1, N, 128).sum(0)   # (N, 128), consumes all E
        return x + 1e-6 * folded

    pad = (-E) % N
    idx = jnp.concatenate([idx, jnp.zeros((pad,), jnp.int32)])
    E += pad
    s, i = dev_time(gath, xg)
    report("row gather (184k rows of 512B)", s, i, bytes_=E * 128 * 4 * 2)

    y = jnp.zeros((8, 128), jnp.float32)

    def tiny(y):
        return y + 1.0

    s, i = dev_time(tiny, y)
    report("tiny op (scan floor)", s, i)


if __name__ == "__main__":
    main()
