"""Pallas TPU kernels for the message-passing hot path.

The #1 bandwidth hazard in gather-table aggregation is the materialized
(N, K, C) neighbor tensor (~134 MB per mp step at bench shapes).  The
blocked formulation sidesteps it: edges are sorted by receiver and packed
into per-node-tile buckets host-side (ops/graph.py:block_graph); per tile,
aggregation is a one-hot (TILE_N × E_TILE) @ (E_TILE × C) matmul on the MXU
— each message is read from HBM exactly once, the one-hot never touches HBM.

``blocked_segment_sum`` runs the Pallas kernel on TPU and a jnp einsum
fallback elsewhere; the backward pass is a cheap per-edge gather
(custom_vjp).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

TILE_N = 128  # nodes per tile (MXU-aligned)

# VMEM budget for the in-kernel f32 d_pxj accumulator table in the fused2r
# backward.  Callers gating the fold-e / v2r paths (nn/graphnet.py,
# nn/gnn_layer.py) MUST import this constant rather than hardcoding a copy:
# fold-e has no transpose-blocking fallback, so a caller gate looser than the
# kernel gate would crash training at runtime.
# Env-overridable (MiB) for large-mesh experiments: at 256^2/H=32 the d_pxj
# table is 8 MiB — over the default gate but well inside the chip's ~16 MiB
# VMEM when the pxj table itself is bf16 (4 MiB).
DPXJ_TABLE_BYTES = int(
    float(os.environ.get("MAGNET_TPU_DPXJ_MB", 6)) * 2**20)
# Looser d_pxj budget when the h0 forward-activation cache is active: the
# backward then holds NO sender table (stub) and no recompute scratch, so
# the accumulator can take most of the chip VMEM.  Measured: 8 MiB d_pxj
# (256^2 x H32) compiles and trains at 44.9M edges/s on v5e.
DPXJ_H0_BYTES = int(
    float(os.environ.get("MAGNET_TPU_DPXJ_H0_MB", 9)) * 2**20)


def _use_pallas() -> bool:
    if os.environ.get("MAGNET_TPU_NO_PALLAS"):
        return False
    if os.environ.get("MAGNET_TPU_PALLAS_INTERPRET"):
        return True  # interpret-mode (CI coverage of the kernel on CPU)
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _einsum_impl(msgs, recv_local, mask, tile_n):
    """msgs (T, E, C); recv_local/mask (T, E) -> (T, tile_n, C) float32."""
    iota = jnp.arange(tile_n, dtype=recv_local.dtype)
    onehot = (recv_local[:, None, :] == iota[None, :, None]).astype(msgs.dtype)
    onehot = onehot * mask[:, None, :].astype(msgs.dtype)
    return jnp.einsum(
        "tne,tec->tnc", onehot, msgs, preferred_element_type=jnp.float32
    )


MAX_E_CHUNK = 2048  # bounds the (tile_n, chunk) one-hot VMEM footprint


def _e_chunk(e: int) -> int:
    """Largest divisor of e that is a multiple of 128 and <= MAX_E_CHUNK
    (e itself is always a multiple of 128)."""
    if e <= MAX_E_CHUNK:
        return e
    k = e // 128
    for m in range(MAX_E_CHUNK // 128, 0, -1):
        if k % m == 0:
            return 128 * m
    return 128


def _pallas_impl(msgs, recv_local, mask, tile_n):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, E, C = msgs.shape
    chunk = _e_chunk(E)
    n_chunks = E // chunk
    recv3 = recv_local.reshape(T, 1, E)
    mask3 = mask.reshape(T, 1, E)

    def kernel(msgs_ref, recv_ref, mask_ref, out_ref):
        ec = pl.program_id(1)
        recv = recv_ref[0, 0]                               # (chunk,)
        m = mask_ref[0, 0]                                  # (chunk,)
        rows = jax.lax.broadcasted_iota(jnp.int32, (tile_n, chunk), 0)
        onehot = (rows == recv[None, :]).astype(msgs_ref.dtype) * m[None, :].astype(
            msgs_ref.dtype
        )
        part = jax.lax.dot_general(
            onehot,
            msgs_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(ec == 0)
        def _():
            out_ref[0] = part

        @pl.when(ec != 0)
        def _():
            out_ref[0] = out_ref[0] + part

    return pl.pallas_call(
        kernel,
        grid=(T, n_chunks),
        interpret=bool(os.environ.get("MAGNET_TPU_PALLAS_INTERPRET")),
        in_specs=[
            pl.BlockSpec((1, chunk, C), lambda t, ec: (t, ec, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda t, ec: (t, 0, ec),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda t, ec: (t, 0, ec),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n, C), lambda t, ec: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, tile_n, C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * tile_n * E * C,
            bytes_accessed=T * E * C * 4 + T * tile_n * C * 4,
            transcendentals=0,
        ),
    )(msgs, recv3, mask3)


def _impl(msgs, recv_local, mask, tile_n):
    if _use_pallas():
        return _pallas_impl(msgs, recv_local, mask, tile_n)
    return _einsum_impl(msgs, recv_local, mask, tile_n)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def blocked_segment_sum(msgs, recv_local, mask, tile_n: int = TILE_N):
    """Sum messages into their receiver slots, per node tile.

    Args:
      msgs: (T, E_TILE, C) edge messages (sorted/packed by receiver tile).
      recv_local: (T, E_TILE) int32 receiver index within the tile.
      mask: (T, E_TILE) 1/0 edge validity.
    Returns: (T, tile_n, C) per-tile sums.
    """
    return _impl(msgs, recv_local, mask, tile_n)


def _fwd(msgs, recv_local, mask, tile_n):
    proto = jnp.zeros((0,), msgs.dtype)     # records the primal dtype
    return _impl(msgs, recv_local, mask, tile_n), (recv_local, mask, proto)


def _bwd(tile_n, res, g):
    recv_local, mask, proto = res
    # d_msgs[t, e] = g[t, recv_local[t, e]] * mask[t, e]
    d_msgs = jnp.take_along_axis(g, recv_local[..., None], axis=1)
    d_msgs = d_msgs * mask[..., None]
    return d_msgs.astype(proto.dtype), None, None


blocked_segment_sum.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Fused edge pipeline: [receiver gather + edge-MLP tail + LayerNorm + masked
# aggregation] in one VMEM-resident kernel.
#
# The InteractionNetwork hot loop (reference magnet_cnn.py:46-93) computes,
# per edge e with receiver n(e):
#   h   = relu(h0[e] + p_xi[n(e)])          h0 = W_xj·x[sender] + W_e·edge + b
#   h   = relu(h @ W_rest[k] + b_rest[k])   for each remaining hidden layer
#   y   = LN(h @ W_out + b_out)
#   agg[n] = sum over incoming e of y[e]
# Unfused, every E-sized intermediate round-trips HBM (~10 passes per mp
# step).  Fused, HBM traffic is: read h0 (E,H) + read p_xi (N,H) + write agg
# (N,C); the gathers ride the MXU as tile-local one-hot matmuls (edges are
# receiver-tile-packed by ops/graph.py:block_graph so every receiver gather
# stays within the 128-row node tile).
#
# The backward kernel recomputes the tail in VMEM (FLOPs are free relative
# to HBM here) and emits d_h0, d_pxi and all weight grads, accumulated
# across grid steps (TPU grid is sequential; constant-index_map output
# blocks persist in VMEM).
# ---------------------------------------------------------------------------

# VMEM budget for the fused kernels' edge-chunk size: the bwd kernel holds
# ~L1+3 (chunk, H) activation buffers.  Larger chunks mean bigger MXU
# matmuls and fewer grid steps (e.g. E_TILE=2816: cap 1024 -> chunk 256 /
# 11 grid chunks; cap 4096 -> one 2816 chunk).  Swept on v5e (bench.py,
# E_TILE=2816): bf16 peaks at cap 2048 (28.7M train edges/s, +10% over
# cap 1024), f32 at cap 4096 (25.0M, +7%).  Overridable for tuning.
_FUSED_CHUNK_ENV = os.environ.get("MAGNET_TPU_FUSED_CHUNK")


def _fused_e_chunk(e: int, dtype=None, h: int = 128) -> int:
    if _FUSED_CHUNK_ENV:
        cap = int(_FUSED_CHUNK_ENV)
    else:
        cap = 2048 if dtype == jnp.bfloat16 else 4096
        # scoped-VMEM guard: the limit is 16 MB on v5e and the bwd kernel
        # keeps ~8 live (chunk, max(tile_n, H)) f32 buffers (activations,
        # one-hots, double buffering).  Without this, e.g. H=32 with
        # E_TILE=4096 requests a 20.9 MB scoped allocation and the
        # compile fails.
        vmem_cap = (12 * 1024 * 1024) // (max(TILE_N, h) * 4 * 8)
        cap = min(cap, max(128, (vmem_cap // 128) * 128))
    if e <= cap:
        return e
    k = e // 128
    for m in range(cap // 128, 0, -1):
        if k % m == 0:
            return 128 * m
    return 128


LN_EPS = 1e-5  # torch nn.LayerNorm default (reference magnet_cnn.py:58)


def _tail_ref(h0g, w_rest, b_rest, w_out, b_out, ln_s, ln_b):
    """relu -> rest layers -> out -> LayerNorm on pre-gathered inputs."""
    h = jax.nn.relu(h0g)
    for k in range(w_rest.shape[0]):
        h = jax.nn.relu(h @ w_rest[k] + b_rest[k])
    y = h @ w_out + b_out
    mu = jnp.mean(y, axis=-1, keepdims=True)
    # two-pass variance: E[(y-mu)^2] stays >= 0 where the
    # fast form E[y^2]-mu^2 can cancel NEGATIVE and NaN the
    # rsqrt (torch LayerNorm semantics; B1-64 epoch-30 NaN)
    var = jnp.mean((y - mu) * (y - mu), axis=-1,
                   keepdims=True)
    return (y - mu) * jax.lax.rsqrt(var + LN_EPS) * ln_s + ln_b


def _fused_ref_impl(h0, pxi, w_rest, b_rest, w_out, b_out, ln_s, ln_b,
                    recv_local, mask):
    """jnp reference (CPU fallback + test oracle).  Shapes:
    h0 (T,E,H), pxi (T,tile_n,H), recv_local/mask (T,E) -> (T,tile_n,C)."""
    tile_n = pxi.shape[1]
    gath = jnp.take_along_axis(pxi, recv_local[..., None], axis=1)
    y = _tail_ref(h0 + gath, w_rest, b_rest, w_out, b_out, ln_s, ln_b)
    iota = jnp.arange(tile_n, dtype=recv_local.dtype)
    onehot = (recv_local[:, None, :] == iota[None, :, None]).astype(y.dtype)
    onehot = onehot * mask[:, None, :].astype(y.dtype)
    return jnp.einsum("tne,tec->tnc", onehot, y,
                      preferred_element_type=jnp.float32)


def _dot(a, b):
    """MXU dot with f32 accumulation.  Operands keep their own dtype —
    bf16×bf16 runs at double MXU rate; mixed operands are aligned to the
    wider dtype to keep Mosaic happy."""
    if a.dtype != b.dtype:
        wide = jnp.promote_types(a.dtype, b.dtype)
        a, b = a.astype(wide), b.astype(wide)
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_t(a, b):
    """a^T @ b for (E,H)-style operands: contract the leading axis."""
    if a.dtype != b.dtype:
        wide = jnp.promote_types(a.dtype, b.dtype)
        a, b = a.astype(wide), b.astype(wide)
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fused_fwd_pallas(h0, pxi, w_rest, b_rest, w_out, b_out, ln_s, ln_b,
                      recv_local, mask):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, E, H = h0.shape
    tile_n = pxi.shape[1]
    L1 = w_rest.shape[0]
    C = w_out.shape[1]
    chunk = _fused_e_chunk(E, h0.dtype, H)
    n_chunks = E // chunk
    recv3 = recv_local.reshape(T, 1, E)
    mask3 = mask.reshape(T, 1, E)
    b_out2 = b_out.reshape(1, C)
    ln_s2 = ln_s.reshape(1, C)
    ln_b2 = ln_b.reshape(1, C)
    if not L1:  # dummy block; the static loop skips it
        w_rest = jnp.zeros((1, H, H), jnp.float32)
        b_rest = jnp.zeros((1, H), jnp.float32)

    dt = h0.dtype  # compute dtype: bf16 operands double MXU rate; all
    #                accumulation and the LayerNorm stay f32
    # dead-chunk skip: E_TILE is the batch-max in-degree bucket, so
    # low-degree tiles carry fully-padded edge chunks (up to ~20% with
    # Hilbert node ordering) — an SMEM occupancy flag gates all compute
    alive = (jnp.sum(mask.reshape(T, n_chunks, chunk), axis=-1) > 0
             ).astype(jnp.int32)

    def kernel(h0_ref, pxi_ref, wr_ref, br_ref, wo_ref, bo_ref, ls_ref,
               lb_ref, recv_ref, mask_ref, alive_ref, out_ref):
        t = pl.program_id(0)
        ec = pl.program_id(1)

        @pl.when(ec == 0)
        def _():
            out_ref[0] = jnp.zeros((tile_n, C), jnp.float32)

        @pl.when(alive_ref[t, ec] > 0)
        def _():
            recv = recv_ref[0, 0]                           # (chunk,)
            m = mask_ref[0, 0]
            cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, tile_n), 1)
            oh_g = (cols == recv[:, None]).astype(dt)       # (chunk, tile_n)
            gath = _dot(oh_g, pxi_ref[0])                   # (chunk, H) f32
            h = jax.nn.relu(h0_ref[0] + gath).astype(dt)
            for k in range(L1):
                h = jax.nn.relu(_dot(h, wr_ref[k])
                                + br_ref[k][None, :]).astype(dt)
            y = _dot(h, wo_ref[:]) + bo_ref[0][None, :]
            mu = jnp.mean(y, axis=-1, keepdims=True)
            # two-pass variance: E[(y-mu)^2] stays >= 0 where the
            # fast form E[y^2]-mu^2 can cancel NEGATIVE and NaN the
            # rsqrt (torch LayerNorm semantics; B1-64 epoch-30 NaN)
            var = jnp.mean((y - mu) * (y - mu), axis=-1,
                           keepdims=True)
            y = (y - mu) * jax.lax.rsqrt(var + LN_EPS) * ls_ref[0][None, :] \
                + lb_ref[0][None, :]
            rows = jax.lax.broadcasted_iota(jnp.int32, (tile_n, chunk), 0)
            oh_a = (rows == recv[None, :]).astype(dt) * m[None, :].astype(dt)
            out_ref[0] = out_ref[0] + _dot(oh_a, y.astype(dt))

    full = lambda *shape: pl.BlockSpec(shape, lambda t, ec: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    flops_tail = 2 * T * E * (tile_n * H + L1 * H * H + H * C + tile_n * C)
    return pl.pallas_call(
        kernel,
        grid=(T, n_chunks),
        interpret=bool(os.environ.get("MAGNET_TPU_PALLAS_INTERPRET")),
        in_specs=[
            pl.BlockSpec((1, chunk, H), lambda t, ec: (t, ec, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, H), lambda t, ec: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            full(max(L1, 1), H, H),
            full(max(L1, 1), H),
            full(H, C),
            full(1, C),
            full(1, C),
            full(1, C),
            pl.BlockSpec((1, 1, chunk), lambda t, ec: (t, 0, ec),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda t, ec: (t, 0, ec),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, n_chunks), lambda t, ec: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n, C), lambda t, ec: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, tile_n, C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_tail,
            bytes_accessed=4 * (T * E * H + T * tile_n * (H + C)),
            transcendentals=0,
        ),
    )(h0, pxi, w_rest, b_rest, w_out, b_out2, ln_s2, ln_b2, recv3, mask3,
      alive)


def _fused_bwd_pallas(h0, pxi, w_rest, b_rest, w_out, b_out, ln_s, ln_b,
                      recv_local, mask, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, E, H = h0.shape
    tile_n = pxi.shape[1]
    L1 = w_rest.shape[0]
    C = w_out.shape[1]
    chunk = _fused_e_chunk(E, h0.dtype, H)
    n_chunks = E // chunk
    recv3 = recv_local.reshape(T, 1, E)
    mask3 = mask.reshape(T, 1, E)
    b_out2 = b_out.reshape(1, C)
    ln_s2 = ln_s.reshape(1, C)
    if not L1:  # dummy block; the static loop skips it
        w_rest = jnp.zeros((1, H, H), jnp.float32)
        b_rest = jnp.zeros((1, H), jnp.float32)

    dt = h0.dtype  # compute dtype; see _fused_fwd_pallas

    def _dot_rt(a, b):
        """a @ b^T with f32 accumulation, operands aligned like _dot."""
        if a.dtype != b.dtype:
            wide = jnp.promote_types(a.dtype, b.dtype)
            a, b = a.astype(wide), b.astype(wide)
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    alive = (jnp.sum(mask.reshape(T, n_chunks, chunk), axis=-1) > 0
             ).astype(jnp.int32)  # dead-chunk skip; see _fused_fwd_pallas

    def kernel(h0_ref, pxi_ref, wr_ref, br_ref, wo_ref, bo_ref, ls_ref,
               recv_ref, mask_ref, g_ref, alive_ref,
               dh0_ref, dpxi_ref, dwr_ref, dbr_ref, dwo_ref, dbo_ref,
               dls_ref, dlb_ref):
        t = pl.program_id(0)
        ec = pl.program_id(1)
        first = jnp.logical_and(t == 0, ec == 0)

        @pl.when(first)
        def _():
            dwr_ref[...] = jnp.zeros_like(dwr_ref)
            dbr_ref[...] = jnp.zeros_like(dbr_ref)
            dwo_ref[...] = jnp.zeros_like(dwo_ref)
            dbo_ref[...] = jnp.zeros_like(dbo_ref)
            dls_ref[...] = jnp.zeros_like(dls_ref)
            dlb_ref[...] = jnp.zeros_like(dlb_ref)

        @pl.when(ec == 0)
        def _():
            dpxi_ref[0] = jnp.zeros((tile_n, H), jnp.float32)

        @pl.when(alive_ref[t, ec] == 0)
        def _():
            dh0_ref[0] = jnp.zeros((chunk, H), jnp.float32)

        @pl.when(alive_ref[t, ec] > 0)
        def _():
            recv = recv_ref[0, 0]
            m = mask_ref[0, 0]
            cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, tile_n), 1)
            oh_g = (cols == recv[:, None]).astype(dt)

            # --- recompute forward, keeping layer inputs ---
            gath = _dot(oh_g, pxi_ref[0])
            h = jax.nn.relu(h0_ref[0] + gath).astype(dt)
            hs = [h]                                # inputs to rest layers
            for k in range(L1):
                h = jax.nn.relu(_dot(h, wr_ref[k])
                                + br_ref[k][None, :]).astype(dt)
                hs.append(h)
            y = _dot(h, wo_ref[:]) + bo_ref[0][None, :]
            mu = jnp.mean(y, axis=-1, keepdims=True)
            # two-pass variance: E[(y-mu)^2] stays >= 0 where the
            # fast form E[y^2]-mu^2 can cancel NEGATIVE and NaN the
            # rsqrt (torch LayerNorm semantics; B1-64 epoch-30 NaN)
            var = jnp.mean((y - mu) * (y - mu), axis=-1,
                           keepdims=True)
            inv = jax.lax.rsqrt(var + LN_EPS)
            xhat = (y - mu) * inv

            # --- backward (element-wise math f32; dot operands in dt) ---
            d_out = _dot(oh_g, g_ref[0].astype(dt)) * m[:, None]  # (chunk, C)
            dls = jnp.sum(d_out * xhat, axis=0, keepdims=True)
            dlb = jnp.sum(d_out, axis=0, keepdims=True)
            d_xhat = d_out * ls_ref[0][None, :]
            d_y = inv * (
                d_xhat
                - jnp.mean(d_xhat, axis=-1, keepdims=True)
                - xhat * jnp.mean(d_xhat * xhat, axis=-1, keepdims=True)
            )
            d_yc = d_y.astype(dt)
            dwo = _dot_t(hs[L1], d_yc)              # (H, C)
            dbo = jnp.sum(d_y, axis=0, keepdims=True)
            d_h = _dot_rt(d_yc, wo_ref[:])          # d_y @ W_out^T
            dwr_list = []
            dbr_list = []
            for k in range(L1 - 1, -1, -1):
                # relu mask in f32 — Mosaic has no bf16 cmpf lowering
                d_h = d_h * (hs[k + 1].astype(jnp.float32) > 0)
                dwr_list.append(_dot_t(hs[k], d_h.astype(dt)))
                dbr_list.append(jnp.sum(d_h, axis=0))
                d_h = _dot_rt(d_h.astype(dt), wr_ref[k])
            d_h = d_h * (hs[0].astype(jnp.float32) > 0)
            dh0_ref[0] = d_h
            rows = jax.lax.broadcasted_iota(jnp.int32, (tile_n, chunk), 0)
            oh_a = (rows == recv[None, :]).astype(dt)
            dpxi_ref[0] = dpxi_ref[0] + _dot(oh_a, d_h.astype(dt))

            if L1:
                dwr_new = jnp.stack(dwr_list[::-1])
                dbr_new = jnp.stack(dbr_list[::-1])
            else:
                dwr_new = jnp.zeros((1, H, H), jnp.float32)
                dbr_new = jnp.zeros((1, H), jnp.float32)
            dwr_ref[...] = dwr_ref[...] + dwr_new
            dbr_ref[...] = dbr_ref[...] + dbr_new
            dwo_ref[...] = dwo_ref[...] + dwo
            dbo_ref[...] = dbo_ref[...] + dbo
            dls_ref[...] = dls_ref[...] + dls
            dlb_ref[...] = dlb_ref[...] + dlb

    full = lambda *shape: pl.BlockSpec(shape, lambda t, ec: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    outs = (
        jax.ShapeDtypeStruct((T, E, H), jnp.float32),        # dh0
        jax.ShapeDtypeStruct((T, tile_n, H), jnp.float32),   # dpxi
        jax.ShapeDtypeStruct((max(L1, 1), H, H), jnp.float32),
        jax.ShapeDtypeStruct((max(L1, 1), H), jnp.float32),
        jax.ShapeDtypeStruct((H, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, chunk, H), lambda t, ec: (t, ec, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_n, H), lambda t, ec: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        full(max(L1, 1), H, H),
        full(max(L1, 1), H),
        full(H, C),
        full(1, C),
        full(1, C),
        full(1, C),
    )
    flops_tail = 4 * T * E * (tile_n * H + 2 * L1 * H * H + 2 * H * C
                              + tile_n * C)
    dh0, dpxi, dwr, dbr, dwo, dbo, dls, dlb = pl.pallas_call(
        kernel,
        grid=(T, n_chunks),
        interpret=bool(os.environ.get("MAGNET_TPU_PALLAS_INTERPRET")),
        in_specs=[
            pl.BlockSpec((1, chunk, H), lambda t, ec: (t, ec, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, H), lambda t, ec: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            full(max(L1, 1), H, H),
            full(max(L1, 1), H),
            full(H, C),
            full(1, C),
            full(1, C),
            pl.BlockSpec((1, 1, chunk), lambda t, ec: (t, 0, ec),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda t, ec: (t, 0, ec),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, C), lambda t, ec: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, n_chunks), lambda t, ec: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=outs,
        cost_estimate=pl.CostEstimate(
            flops=flops_tail,
            bytes_accessed=4 * (2 * T * E * H + T * tile_n * (2 * H + 2 * C)),
            transcendentals=0,
        ),
    )(h0, pxi, w_rest, b_rest, w_out, b_out2, ln_s2, recv3, mask3, g, alive)
    if not L1:
        dwr = jnp.zeros((0, H, H), jnp.float32)
        dbr = jnp.zeros((0, H), jnp.float32)
    return (dh0, dpxi, dwr, dbr, dwo, dbo.reshape(C), dls.reshape(C),
            dlb.reshape(C))


def _fused_ref_bwd(h0, pxi, w_rest, b_rest, w_out, b_out, ln_s, ln_b,
                   recv_local, mask, g):
    """jnp fallback backward (CPU): plain autodiff of the reference impl."""
    def f(h0_, pxi_, wr_, br_, wo_, bo_, ls_, lb_):
        return _fused_ref_impl(h0_, pxi_, wr_, br_, wo_, bo_, ls_, lb_,
                               recv_local, mask)

    _, vjp = jax.vjp(f, h0, pxi, w_rest, b_rest, w_out, b_out, ln_s, ln_b)
    return vjp(g)


def _fused_impl(h0, pxi, w_rest, b_rest, w_out, b_out, ln_s, ln_b,
                recv_local, mask):
    if _use_pallas():
        return _fused_fwd_pallas(h0, pxi, w_rest, b_rest, w_out, b_out,
                                 ln_s, ln_b, recv_local, mask)
    return _fused_ref_impl(h0, pxi, w_rest, b_rest, w_out, b_out, ln_s, ln_b,
                           recv_local, mask)


@jax.custom_vjp
def fused_edge_tail_agg(h0, pxi, w_rest, b_rest, w_out, b_out, ln_s, ln_b,
                        recv_local, mask):
    """Fused [receiver-gather + edge-MLP tail + LayerNorm + masked segment
    sum] over receiver-tile-blocked edges.

    Args:
      h0: (T, E_TILE, H) first-layer pre-activations minus the receiver
          chunk (W_xj·x[sender] + W_e·edge + bias), blocked layout.
      pxi: (T, tile_n, H) receiver-side first-layer chunk per node tile.
      w_rest/b_rest: (L-1, H, H)/(L-1, H) remaining hidden layers.
      w_out/b_out: (H, C)/(C,) output layer; ln_s/ln_b: (C,) LayerNorm.
      recv_local: (T, E_TILE) int32 receiver index within the tile.
      mask: (T, E_TILE) 1/0 edge validity.
    Returns: (T, tile_n, C) float32 masked sums of the per-edge outputs.
    """
    return _fused_impl(h0, pxi, w_rest, b_rest, w_out, b_out, ln_s, ln_b,
                       recv_local, mask)


def _fused_fwd(h0, pxi, w_rest, b_rest, w_out, b_out, ln_s, ln_b,
               recv_local, mask):
    out = _fused_impl(h0, pxi, w_rest, b_rest, w_out, b_out, ln_s,
                      ln_b, recv_local, mask)
    return out, (h0, pxi, w_rest, b_rest, w_out, b_out, ln_s, ln_b,
                 recv_local, mask)


def _fused_bwd(res, g):
    h0, pxi, w_rest, b_rest, w_out, b_out, ln_s, ln_b, recv_local, mask = res
    if _use_pallas():
        grads = _fused_bwd_pallas(h0, pxi, w_rest, b_rest, w_out, b_out,
                                  ln_s, ln_b, recv_local, mask, g)
    else:
        grads = _fused_ref_bwd(h0, pxi, w_rest, b_rest, w_out, b_out,
                               ln_s, ln_b, recv_local, mask, g)
    dh0, dpxi, dwr, dbr, dwo, dbo, dls, dlb = grads
    return (dh0.astype(h0.dtype), dpxi.astype(pxi.dtype),
            dwr.astype(w_rest.dtype), dbr.astype(b_rest.dtype),
            dwo.astype(w_out.dtype), dbo.astype(b_out.dtype),
            dls.astype(ln_s.dtype), dlb.astype(ln_b.dtype), None, None)


fused_edge_tail_agg.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Fused MPNN edge tail: the Brandstetter GNN_Layer message path (reference
# models/mpnn.py:51-77) is msg = swish(Linear(swish(recv_side[i] +
# send_side[j]))) followed by a masked mean.  Same blocking as
# fused_edge_tail_agg, but with swish activations and no out-layer/LN.
# ---------------------------------------------------------------------------


def _swish(z):
    return z * jax.nn.sigmoid(z)


def _dswish(z):
    s = jax.nn.sigmoid(z)
    return s * (1.0 + z * (1.0 - s))


def _mpnn_ref_impl(h0, precv, w, b, recv_local, mask):
    """jnp reference.  h0 (T,E,H) pre-gathered sender side; precv
    (T,tile_n,H) receiver side; returns (T,tile_n,H) masked sums of
    swish((h0+precv[recv]) @ w + b) ... precisely:
    h1 = swish(h0 + precv[recv]); h2 = swish(h1 @ w + b); sum h2 by recv."""
    tile_n = precv.shape[1]
    gath = jnp.take_along_axis(precv, recv_local[..., None], axis=1)
    h1 = _swish(h0 + gath)
    h2 = _swish(h1 @ w + b)
    iota = jnp.arange(tile_n, dtype=recv_local.dtype)
    onehot = (recv_local[:, None, :] == iota[None, :, None]).astype(h2.dtype)
    onehot = onehot * mask[:, None, :].astype(h2.dtype)
    return jnp.einsum("tne,tec->tnc", onehot, h2,
                      preferred_element_type=jnp.float32)


def _mpnn_fwd_pallas(h0, precv, w, b, recv_local, mask):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, E, H = h0.shape
    tile_n = precv.shape[1]
    chunk = _fused_e_chunk(E, h0.dtype, H)
    n_chunks = E // chunk
    recv3 = recv_local.reshape(T, 1, E)
    mask3 = mask.reshape(T, 1, E)
    b2 = b.reshape(1, H)

    dt = h0.dtype  # compute dtype; see _fused_fwd_pallas
    alive = (jnp.sum(mask.reshape(T, n_chunks, chunk), axis=-1) > 0
             ).astype(jnp.int32)  # dead-chunk skip; see _fused_fwd_pallas

    def kernel(h0_ref, pr_ref, w_ref, b_ref, recv_ref, mask_ref, alive_ref,
               out_ref):
        t = pl.program_id(0)
        ec = pl.program_id(1)

        @pl.when(ec == 0)
        def _():
            out_ref[0] = jnp.zeros((tile_n, H), jnp.float32)

        @pl.when(alive_ref[t, ec] > 0)
        def _():
            recv = recv_ref[0, 0]
            m = mask_ref[0, 0]
            cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, tile_n), 1)
            oh_g = (cols == recv[:, None]).astype(dt)
            gath = _dot(oh_g, pr_ref[0])
            h1 = _swish(h0_ref[0] + gath).astype(dt)
            h2 = _swish(_dot(h1, w_ref[:]) + b_ref[0][None, :])
            rows = jax.lax.broadcasted_iota(jnp.int32, (tile_n, chunk), 0)
            oh_a = (rows == recv[None, :]).astype(dt) * m[None, :].astype(dt)
            out_ref[0] = out_ref[0] + _dot(oh_a, h2.astype(dt))

    full = lambda *shape: pl.BlockSpec(shape, lambda t, ec: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(T, n_chunks),
        interpret=bool(os.environ.get("MAGNET_TPU_PALLAS_INTERPRET")),
        in_specs=[
            pl.BlockSpec((1, chunk, H), lambda t, ec: (t, ec, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, H), lambda t, ec: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            full(H, H),
            full(1, H),
            pl.BlockSpec((1, 1, chunk), lambda t, ec: (t, 0, ec),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda t, ec: (t, 0, ec),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, n_chunks), lambda t, ec: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n, H), lambda t, ec: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, tile_n, H), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * E * (2 * tile_n * H + H * H),
            bytes_accessed=4 * (T * E * H + 2 * T * tile_n * H),
            transcendentals=2 * T * E * H,
        ),
    )(h0, precv, w, b2, recv3, mask3, alive)


def _mpnn_bwd_pallas(h0, precv, w, b, recv_local, mask, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, E, H = h0.shape
    tile_n = precv.shape[1]
    chunk = _fused_e_chunk(E, h0.dtype, H)
    n_chunks = E // chunk
    recv3 = recv_local.reshape(T, 1, E)
    mask3 = mask.reshape(T, 1, E)
    b2 = b.reshape(1, H)

    dt = h0.dtype  # compute dtype; see _fused_fwd_pallas
    alive = (jnp.sum(mask.reshape(T, n_chunks, chunk), axis=-1) > 0
             ).astype(jnp.int32)  # dead-chunk skip; see _fused_fwd_pallas

    def kernel(h0_ref, pr_ref, w_ref, b_ref, recv_ref, mask_ref, g_ref,
               alive_ref, dh0_ref, dpr_ref, dw_ref, db_ref):
        t = pl.program_id(0)
        ec = pl.program_id(1)
        first = jnp.logical_and(t == 0, ec == 0)

        @pl.when(first)
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        @pl.when(ec == 0)
        def _():
            dpr_ref[0] = jnp.zeros((tile_n, H), jnp.float32)

        @pl.when(alive_ref[t, ec] == 0)
        def _():
            dh0_ref[0] = jnp.zeros((chunk, H), jnp.float32)

        @pl.when(alive_ref[t, ec] > 0)
        def _():
            recv = recv_ref[0, 0]
            m = mask_ref[0, 0]
            cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, tile_n), 1)
            oh_g = (cols == recv[:, None]).astype(dt)
            gath = _dot(oh_g, pr_ref[0])
            z1 = h0_ref[0] + gath                   # f32
            h1 = _swish(z1)
            z2 = _dot(h1.astype(dt), w_ref[:]) + b_ref[0][None, :]

            d_h2 = _dot(oh_g, g_ref[0].astype(dt)) * m[:, None]
            d_z2 = d_h2 * _dswish(z2)
            dw = _dot_t(h1.astype(dt), d_z2.astype(dt))
            db = jnp.sum(d_z2, axis=0, keepdims=True)
            d_h1 = jax.lax.dot_general(
                d_z2.astype(dt), w_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            d_z1 = d_h1 * _dswish(z1)
            dh0_ref[0] = d_z1
            rows = jax.lax.broadcasted_iota(jnp.int32, (tile_n, chunk), 0)
            oh_a = (rows == recv[None, :]).astype(dt)
            dpr_ref[0] = dpr_ref[0] + _dot(oh_a, d_z1.astype(dt))
            dw_ref[...] = dw_ref[...] + dw
            db_ref[...] = db_ref[...] + db

    full = lambda *shape: pl.BlockSpec(shape, lambda t, ec: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    dh0, dpr, dw, db = pl.pallas_call(
        kernel,
        grid=(T, n_chunks),
        interpret=bool(os.environ.get("MAGNET_TPU_PALLAS_INTERPRET")),
        in_specs=[
            pl.BlockSpec((1, chunk, H), lambda t, ec: (t, ec, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, H), lambda t, ec: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            full(H, H),
            full(1, H),
            pl.BlockSpec((1, 1, chunk), lambda t, ec: (t, 0, ec),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda t, ec: (t, 0, ec),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, H), lambda t, ec: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, n_chunks), lambda t, ec: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, chunk, H), lambda t, ec: (t, ec, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, H), lambda t, ec: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            full(H, H),
            full(1, H),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, E, H), jnp.float32),
            jax.ShapeDtypeStruct((T, tile_n, H), jnp.float32),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * T * E * (2 * tile_n * H + 2 * H * H),
            bytes_accessed=4 * (2 * T * E * H + 3 * T * tile_n * H),
            transcendentals=4 * T * E * H,
        ),
    )(h0, precv, w, b2, recv3, mask3, g, alive)
    return dh0, dpr, dw, db.reshape(H)


def _mpnn_impl(h0, precv, w, b, recv_local, mask):
    if _use_pallas():
        return _mpnn_fwd_pallas(h0, precv, w, b, recv_local, mask)
    return _mpnn_ref_impl(h0, precv, w, b, recv_local, mask)


@jax.custom_vjp
def fused_mpnn_edge_agg(h0, precv, w, b, recv_local, mask):
    """Fused [receiver gather + swish + Linear + swish + masked segment
    sum] for the MPNN message path.  Shapes as fused_edge_tail_agg with
    out width == H; returns (T, tile_n, H) float32 masked sums."""
    return _mpnn_impl(h0, precv, w, b, recv_local, mask)


def _mpnn_fwd(h0, precv, w, b, recv_local, mask):
    return _mpnn_impl(h0, precv, w, b, recv_local, mask), (
        h0, precv, w, b, recv_local, mask)


def _mpnn_bwd(res, g):
    h0, precv, w, b, recv_local, mask = res
    if _use_pallas():
        dh0, dpr, dw, db = _mpnn_bwd_pallas(h0, precv, w, b, recv_local,
                                            mask, g)
    else:
        def f(h0_, pr_, w_, b_):
            return _mpnn_ref_impl(h0_, pr_, w_, b_, recv_local, mask)

        _, vjp = jax.vjp(f, h0, precv, w, b)
        dh0, dpr, dw, db = vjp(g)
    return (dh0.astype(h0.dtype), dpr.astype(precv.dtype),
            dw.astype(w.dtype), db.astype(b.dtype), None, None)


fused_mpnn_edge_agg.defvjp(_mpnn_fwd, _mpnn_bwd)


# ---------------------------------------------------------------------------
# Fused edge pipeline v2: the SENDER gather also happens in-kernel.
#
# Profiling (benchmarks/profile_bench.py) showed the XLA-side sender-row
# gather is the single largest non-kernel cost (~1.2-1.5 ms per mp step at
# bench shapes — sub-512 B row DMAs).  Edges within a receiver tile ascend
# by sender id (ops/graph.py packer), so each `chunk`-sized edge chunk
# draws its senders from at most K distinct 128-row node tiles
# (host-computed `snd2_tids`; with Hilbert-ordered nodes K <= ~6 and the
# median chunk touches 1).  The kernel keeps the whole projected node
# table p_xj in VMEM (size-guarded by the caller), slices each referenced
# tile with pl.ds, and gathers via per-tile (chunk, 128) one-hot matmuls
# on the MXU, predicated with pl.when so unused tile slots cost nothing —
# the (E, H) gathered array never exists in HBM.
#
# Backward: the kernel recomputes the tail and emits d_z (the cotangent of
# pe + sender_gather + receiver_gather, one value serves all three), plus
# d_pxi and weight grads; d_pxj is reduced OUTSIDE via the existing
# sender-transpose blocking (ops/segment.py machinery).
# ---------------------------------------------------------------------------


def _fused2_ref_impl(pe, pxj, pxi, w_rest, b_rest, w_out, b_out,
                     ln_s, ln_b, tids, sl2, recv_local, mask):
    """jnp oracle.  pe (T,E,H); pxj (N_pad,H); pxi (T,tile_n,H);
    tids (T,nc,K) int32 (pad -1); sl2 (T,E) = slot*128 + local (pad -1);
    recv_local/mask (T,E) -> (T,tile_n,C) f32."""
    T, E, H = pe.shape
    nc, K = tids.shape[1:]
    chunk = E // nc
    n_pad = pxj.shape[0]
    slot = jnp.where(sl2 >= 0, sl2 // 128, 0)
    local = jnp.where(sl2 >= 0, sl2 % 128, 0)
    tid_per_edge = jnp.take_along_axis(
        jnp.repeat(tids, chunk, axis=1).reshape(T, E, K),
        slot[..., None], axis=2)[..., 0]
    gidx = jnp.clip(tid_per_edge * 128 + local, 0, n_pad - 1)
    g0 = jnp.take(pxj, gidx.reshape(-1), axis=0).reshape(T, E, H)
    g0 = jnp.where((sl2 >= 0)[..., None], g0, 0)
    gath = jnp.take_along_axis(pxi, recv_local[..., None], axis=1)
    z = (pe.astype(jnp.float32) + g0.astype(jnp.float32)
         + gath.astype(jnp.float32)).astype(pe.dtype)
    y = _tail_ref(z, w_rest, b_rest, w_out, b_out, ln_s, ln_b)
    tile_n = pxi.shape[1]
    iota = jnp.arange(tile_n, dtype=recv_local.dtype)
    onehot = (recv_local[:, None, :] == iota[None, :, None]).astype(y.dtype)
    onehot = onehot * mask[:, None, :].astype(y.dtype)
    return jnp.einsum("tne,tec->tnc", onehot, y,
                      preferred_element_type=jnp.float32)


def _fused2_fwd_pallas(pe, pxj, pxi, w_rest, b_rest, w_out, b_out,
                       ln_s, ln_b, tids, sl2, recv_local, mask):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, E, H = pe.shape
    tile_n = pxi.shape[1]
    L1 = w_rest.shape[0]
    C = w_out.shape[1]
    nc, K = tids.shape[1:]
    chunk = E // nc
    n_pad = pxj.shape[0]
    sl3 = sl2.reshape(T, 1, E)
    recv3 = recv_local.reshape(T, 1, E)
    mask3 = mask.reshape(T, 1, E)
    b_out2 = b_out.reshape(1, C)
    ln_s2 = ln_s.reshape(1, C)
    ln_b2 = ln_b.reshape(1, C)
    if not L1:
        w_rest = jnp.zeros((1, H, H), jnp.float32)
        b_rest = jnp.zeros((1, H), jnp.float32)
    dt = pe.dtype

    def gather_g0(pxj_ref, tid_ref, sl, g0_ref, t, ec):
        """Accumulate the sender gather into g0_ref (scratch), one
        predicated (chunk, 128) one-hot matmul per referenced tile."""
        g0_ref[...] = jnp.zeros((chunk, H), jnp.float32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, 128), 1)
        for k in range(K):
            tid = tid_ref[t, ec, k]

            @pl.when(tid >= 0)
            def _(k=k, tid=tid):
                base = pl.multiple_of(tid * 128, 128)
                win = pxj_ref[pl.ds(base, 128), :]
                ohk = (cols == (sl - k * 128)[:, None]).astype(dt)
                g0_ref[...] += _dot(ohk, win.astype(dt))

    def kernel(pe_ref, pxj_ref, pxi_ref, wr_ref, br_ref, wo_ref, bo_ref,
               ls_ref, lb_ref, tid_ref, sl_ref, recv_ref, mask_ref,
               out_ref, g0_ref):
        t = pl.program_id(0)
        ec = pl.program_id(1)

        @pl.when(ec == 0)
        def _():
            out_ref[0] = jnp.zeros((tile_n, C), jnp.float32)

        # fully-padded chunks (no referenced sender tile) are skipped:
        # E_TILE is the batch-max in-degree bucket, so low-degree tiles
        # carry dead chunks (up to ~20% with Hilbert node ordering)
        @pl.when(tid_ref[t, ec, 0] >= 0)
        def _():
            sl = sl_ref[0, 0]
            gather_g0(pxj_ref, tid_ref, sl, g0_ref, t, ec)
            recv = recv_ref[0, 0]
            cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, tile_n), 1)
            oh_g = (cols == recv[:, None]).astype(dt)
            gath = _dot(oh_g, pxi_ref[0])
            h = jax.nn.relu(pe_ref[0] + g0_ref[...] + gath).astype(dt)
            for k in range(L1):
                h = jax.nn.relu(_dot(h, wr_ref[k])
                                + br_ref[k][None, :]).astype(dt)
            y = _dot(h, wo_ref[:]) + bo_ref[0][None, :]
            mu = jnp.mean(y, axis=-1, keepdims=True)
            # two-pass variance: E[(y-mu)^2] stays >= 0 where the
            # fast form E[y^2]-mu^2 can cancel NEGATIVE and NaN the
            # rsqrt (torch LayerNorm semantics; B1-64 epoch-30 NaN)
            var = jnp.mean((y - mu) * (y - mu), axis=-1,
                           keepdims=True)
            y = (y - mu) * jax.lax.rsqrt(var + LN_EPS) \
                * ls_ref[0][None, :] + lb_ref[0][None, :]
            m = mask_ref[0, 0]
            rws = jax.lax.broadcasted_iota(jnp.int32, (tile_n, chunk), 0)
            oh_a = (rws == recv[None, :]).astype(dt) * m[None, :].astype(dt)
            out_ref[0] = out_ref[0] + _dot(oh_a, y.astype(dt))

    full = lambda *shape: pl.BlockSpec(shape, lambda t, ec: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(T, nc),
        interpret=bool(os.environ.get("MAGNET_TPU_PALLAS_INTERPRET")),
        in_specs=[
            pl.BlockSpec((1, chunk, H), lambda t, ec: (t, ec, 0),
                         memory_space=pltpu.VMEM),
            full(n_pad, H),                                  # pxj table
            pl.BlockSpec((1, tile_n, H), lambda t, ec: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            full(max(L1, 1), H, H),
            full(max(L1, 1), H),
            full(H, C),
            full(1, C),
            full(1, C),
            full(1, C),
            pl.BlockSpec((T, nc, K), lambda t, ec: (0, 0, 0),
                         memory_space=pltpu.SMEM),           # tids (whole)
            pl.BlockSpec((1, 1, chunk), lambda t, ec: (t, 0, ec),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda t, ec: (t, 0, ec),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda t, ec: (t, 0, ec),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n, C), lambda t, ec: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, tile_n, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((chunk, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * E * (K * 128 + tile_n * 2 + L1 * H + C) * H // 2,
            bytes_accessed=4 * (T * E * H + n_pad * H + T * tile_n * H),
            transcendentals=0,
        ),
    )(pe, pxj, pxi, w_rest, b_rest, w_out, b_out2, ln_s2, ln_b2,
      tids, sl3, recv3, mask3)


def _fused2_bwd_pallas(pe, pxj, pxi, w_rest, b_rest, w_out, b_out,
                       ln_s, ln_b, tids, sl2, recv_local, mask, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, E, H = pe.shape
    tile_n = pxi.shape[1]
    L1 = w_rest.shape[0]
    C = w_out.shape[1]
    nc, K = tids.shape[1:]
    chunk = E // nc
    n_pad = pxj.shape[0]
    sl3 = sl2.reshape(T, 1, E)
    recv3 = recv_local.reshape(T, 1, E)
    mask3 = mask.reshape(T, 1, E)
    b_out2 = b_out.reshape(1, C)
    ln_s2 = ln_s.reshape(1, C)
    if not L1:
        w_rest = jnp.zeros((1, H, H), jnp.float32)
        b_rest = jnp.zeros((1, H), jnp.float32)
    dt = pe.dtype

    def _dot_rt(a, b):
        if a.dtype != b.dtype:
            wide = jnp.promote_types(a.dtype, b.dtype)
            a, b = a.astype(wide), b.astype(wide)
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def kernel(pe_ref, pxj_ref, pxi_ref, wr_ref, br_ref, wo_ref, bo_ref,
               ls_ref, tid_ref, sl_ref, recv_ref, mask_ref, g_ref,
               dz_ref, dpxi_ref, dwr_ref, dbr_ref, dwo_ref, dbo_ref,
               dls_ref, dlb_ref, g0_ref):
        t = pl.program_id(0)
        ec = pl.program_id(1)
        first = jnp.logical_and(t == 0, ec == 0)

        # zero-init accumulators and the per-chunk dz output; the alive
        # branch below overwrites/accumulates
        @pl.when(first)
        def _():
            dwr_ref[...] = jnp.zeros_like(dwr_ref)
            dbr_ref[...] = jnp.zeros_like(dbr_ref)
            dwo_ref[...] = jnp.zeros_like(dwo_ref)
            dbo_ref[...] = jnp.zeros_like(dbo_ref)
            dls_ref[...] = jnp.zeros_like(dls_ref)
            dlb_ref[...] = jnp.zeros_like(dlb_ref)

        @pl.when(ec == 0)
        def _():
            dpxi_ref[0] = jnp.zeros((tile_n, H), jnp.float32)

        dz_ref[0] = jnp.zeros((chunk, H), jnp.float32)

        @pl.when(tid_ref[t, ec, 0] >= 0)
        def _():
            sl = sl_ref[0, 0]
            # recompute the sender gather (predicated per referenced tile)
            g0_ref[...] = jnp.zeros((chunk, H), jnp.float32)
            cols128 = jax.lax.broadcasted_iota(jnp.int32, (chunk, 128), 1)
            for k in range(K):
                tid = tid_ref[t, ec, k]

                @pl.when(tid >= 0)
                def _(k=k, tid=tid):
                    base = pl.multiple_of(tid * 128, 128)
                    win = pxj_ref[pl.ds(base, 128), :]
                    ohk = (cols128 == (sl - k * 128)[:, None]).astype(dt)
                    g0_ref[...] += _dot(ohk, win.astype(dt))

            recv = recv_ref[0, 0]
            m = mask_ref[0, 0]
            cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, tile_n), 1)
            oh_g = (cols == recv[:, None]).astype(dt)
            gath = _dot(oh_g, pxi_ref[0])

            h = jax.nn.relu(pe_ref[0] + g0_ref[...] + gath).astype(dt)
            hs = [h]
            for k in range(L1):
                h = jax.nn.relu(_dot(h, wr_ref[k])
                                + br_ref[k][None, :]).astype(dt)
                hs.append(h)
            y = _dot(h, wo_ref[:]) + bo_ref[0][None, :]
            mu = jnp.mean(y, axis=-1, keepdims=True)
            # two-pass variance: E[(y-mu)^2] stays >= 0 where the
            # fast form E[y^2]-mu^2 can cancel NEGATIVE and NaN the
            # rsqrt (torch LayerNorm semantics; B1-64 epoch-30 NaN)
            var = jnp.mean((y - mu) * (y - mu), axis=-1,
                           keepdims=True)
            inv = jax.lax.rsqrt(var + LN_EPS)
            xhat = (y - mu) * inv

            d_out = _dot(oh_g, g_ref[0].astype(dt)) * m[:, None]
            dls = jnp.sum(d_out * xhat, axis=0, keepdims=True)
            dlb = jnp.sum(d_out, axis=0, keepdims=True)
            d_xhat = d_out * ls_ref[0][None, :]
            d_y = inv * (
                d_xhat
                - jnp.mean(d_xhat, axis=-1, keepdims=True)
                - xhat * jnp.mean(d_xhat * xhat, axis=-1, keepdims=True)
            )
            d_yc = d_y.astype(dt)
            dwo = _dot_t(hs[L1], d_yc)
            dbo = jnp.sum(d_y, axis=0, keepdims=True)
            d_h = _dot_rt(d_yc, wo_ref[:])
            dwr_list = []
            dbr_list = []
            for k in range(L1 - 1, -1, -1):
                d_h = d_h * (hs[k + 1].astype(jnp.float32) > 0)
                dwr_list.append(_dot_t(hs[k], d_h.astype(dt)))
                dbr_list.append(jnp.sum(d_h, axis=0))
                d_h = _dot_rt(d_h.astype(dt), wr_ref[k])
            d_h = d_h * (hs[0].astype(jnp.float32) > 0)
            dz_ref[0] = d_h
            rws = jax.lax.broadcasted_iota(jnp.int32, (tile_n, chunk), 0)
            oh_a = (rws == recv[None, :]).astype(dt)
            dpxi_ref[0] = dpxi_ref[0] + _dot(oh_a, d_h.astype(dt))

            if L1:
                dwr_new = jnp.stack(dwr_list[::-1])
                dbr_new = jnp.stack(dbr_list[::-1])
            else:
                dwr_new = jnp.zeros((1, H, H), jnp.float32)
                dbr_new = jnp.zeros((1, H), jnp.float32)
            dwr_ref[...] = dwr_ref[...] + dwr_new
            dbr_ref[...] = dbr_ref[...] + dbr_new
            dwo_ref[...] = dwo_ref[...] + dwo
            dbo_ref[...] = dbo_ref[...] + dbo
            dls_ref[...] = dls_ref[...] + dls
            dlb_ref[...] = dlb_ref[...] + dlb

    full = lambda *shape: pl.BlockSpec(shape, lambda t, ec: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    outs = (
        jax.ShapeDtypeStruct((T, E, H), jnp.float32),        # d_z
        jax.ShapeDtypeStruct((T, tile_n, H), jnp.float32),   # d_pxi
        jax.ShapeDtypeStruct((max(L1, 1), H, H), jnp.float32),
        jax.ShapeDtypeStruct((max(L1, 1), H), jnp.float32),
        jax.ShapeDtypeStruct((H, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, chunk, H), lambda t, ec: (t, ec, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_n, H), lambda t, ec: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        full(max(L1, 1), H, H),
        full(max(L1, 1), H),
        full(H, C),
        full(1, C),
        full(1, C),
        full(1, C),
    )
    dz, dpxi, dwr, dbr, dwo, dbo, dls, dlb = pl.pallas_call(
        kernel,
        grid=(T, nc),
        interpret=bool(os.environ.get("MAGNET_TPU_PALLAS_INTERPRET")),
        in_specs=[
            pl.BlockSpec((1, chunk, H), lambda t, ec: (t, ec, 0),
                         memory_space=pltpu.VMEM),
            full(n_pad, H),
            pl.BlockSpec((1, tile_n, H), lambda t, ec: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            full(max(L1, 1), H, H),
            full(max(L1, 1), H),
            full(H, C),
            full(1, C),
            full(1, C),
            pl.BlockSpec((T, nc, K), lambda t, ec: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, chunk), lambda t, ec: (t, 0, ec),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda t, ec: (t, 0, ec),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda t, ec: (t, 0, ec),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, C), lambda t, ec: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=outs,
        scratch_shapes=[pltpu.VMEM((chunk, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * T * E * (K * 128 + tile_n * 2 + 2 * L1 * H
                               + 2 * C) * H // 2,
            bytes_accessed=4 * (2 * T * E * H + n_pad * H
                                + T * tile_n * (H + C)),
            transcendentals=0,
        ),
    )(pe, pxj, pxi, w_rest, b_rest, w_out, b_out2, ln_s2,
      tids, sl3, recv3, mask3, g)
    if not L1:
        dwr = jnp.zeros((0, H, H), jnp.float32)
        dbr = jnp.zeros((0, H), jnp.float32)
    return dz, dpxi, dwr, dbr, dwo, dbo.reshape(C), dls.reshape(C), \
        dlb.reshape(C)


def _fused2_impl(pe, pxj, pxi, w_rest, b_rest, w_out, b_out,
                 ln_s, ln_b, tids, sl2, recv_local, mask):
    if _use_pallas():
        return _fused2_fwd_pallas(pe, pxj, pxi, w_rest, b_rest,
                                  w_out, b_out, ln_s, ln_b, tids, sl2,
                                  recv_local, mask)
    return _fused2_ref_impl(pe, pxj, pxi, w_rest, b_rest, w_out,
                            b_out, ln_s, ln_b, tids, sl2, recv_local, mask)


@jax.custom_vjp
def fused_edge_tail_agg2(pe, pxj, pxi, w_rest, b_rest, w_out, b_out,
                         ln_s, ln_b, tids, sl2, recv_local, mask,
                         snd_edge_ids, snd_local):
    """Fused [in-kernel sender gather + receiver gather + edge-MLP tail +
    LayerNorm + masked aggregation] over receiver-tile-blocked edges whose
    senders ascend within each tile.

    Args:
      pe: (T, E_TILE, H) non-gather part of the first layer
          (W_e·edge (+scale) + bias), blocked layout.
      pxj: (N_pad, H) sender-side projected node table (VMEM-resident;
          caller guards its size).
      pxi: (T, tile_n, H) receiver-side chunk per node tile.
      tids: (T, nc, K) int32 sender tile ids per edge chunk (pad -1).
      sl2: (T, E_TILE) int32 = slot*128 + within-tile offset (pad -1).
      recv_local/mask: (T, E_TILE).
      snd_edge_ids/snd_local: sender-transpose layout, used only by the
          backward for d_pxj (ops/segment.py machinery).
    Returns: (T, tile_n, C) float32 masked sums.
    """
    return _fused2_impl(pe, pxj, pxi, w_rest, b_rest, w_out, b_out,
                        ln_s, ln_b, tids, sl2, recv_local, mask)


def _fused2_fwd(pe, pxj, pxi, w_rest, b_rest, w_out, b_out,
                ln_s, ln_b, tids, sl2, recv_local, mask,
                snd_edge_ids, snd_local):
    out = _fused2_impl(pe, pxj, pxi, w_rest, b_rest, w_out, b_out,
                       ln_s, ln_b, tids, sl2, recv_local, mask)
    return out, (pe, pxj, pxi, w_rest, b_rest, w_out, b_out, ln_s, ln_b,
                 tids, sl2, recv_local, mask, snd_edge_ids, snd_local)


def _fused2_bwd(res, g):
    (pe, pxj, pxi, w_rest, b_rest, w_out, b_out, ln_s, ln_b,
     tids, sl2, recv_local, mask, snd_edge_ids, snd_local) = res
    if not _use_pallas():
        def f(pe_, pxj_, pxi_, wr_, br_, wo_, bo_, ls_, lb_):
            return _fused2_ref_impl(pe_, pxj_, pxi_, wr_, br_, wo_,
                                    bo_, ls_, lb_, tids, sl2, recv_local,
                                    mask)

        _, vjp = jax.vjp(f, pe, pxj, pxi, w_rest, b_rest, w_out, b_out,
                         ln_s, ln_b)
        dpe_r, dpxj_r, dpxi, dwr, dbr, dwo, dbo, dls, dlb = vjp(g)
        return (dpe_r.astype(pe.dtype), dpxj_r.astype(pxj.dtype),
                dpxi.astype(pxi.dtype), dwr.astype(w_rest.dtype),
                dbr.astype(b_rest.dtype), dwo.astype(w_out.dtype),
                dbo.astype(b_out.dtype), dls.astype(ln_s.dtype),
                dlb.astype(ln_b.dtype), None, None, None, None, None, None)

    dz, dpxi, dwr, dbr, dwo, dbo, dls, dlb = _fused2_bwd_pallas(
        pe, pxj, pxi, w_rest, b_rest, w_out, b_out, ln_s, ln_b,
        tids, sl2, recv_local, mask, g)
    # d_pxj: reduce d_z into sender rows via the transpose blocking —
    # gather rows by snd_edge_ids then per-tile one-hot matmul (no scatter)
    T, E, H = pe.shape
    dz_flat = dz.reshape(T * E, H)
    padded = jnp.concatenate([dz_flat, jnp.zeros((1, H), dz_flat.dtype)], 0)
    ts, ets = snd_local.shape
    gathered = jnp.take(padded, snd_edge_ids.reshape(-1), axis=0).reshape(
        ts, ets, H)
    smask = (snd_edge_ids < T * E).astype(jnp.float32)
    dpxj = blocked_segment_sum(gathered, snd_local, smask, 128).reshape(
        -1, H)
    # pxj may be padded past the tile count; padding rows get zero grad
    dpxj = jnp.pad(dpxj, ((0, pxj.shape[0] - dpxj.shape[0]), (0, 0)))
    return (dz.astype(pe.dtype), dpxj.astype(pxj.dtype),
            dpxi.astype(pxi.dtype), dwr.astype(w_rest.dtype),
            dbr.astype(b_rest.dtype), dwo.astype(w_out.dtype),
            dbo.astype(b_out.dtype), dls.astype(ln_s.dtype),
            dlb.astype(ln_b.dtype), None, None, None, None, None, None)


fused_edge_tail_agg2.defvjp(_fused2_fwd, _fused2_bwd)


# ---------------------------------------------------------------------------
# Fused edge pipeline v2r: fused2 math on a RAGGED flat live-chunk grid.
#
# The rectangular (T, E_TILE) layout pads every tile to the batch-max
# in-degree bucket; with spatially-ordered nodes up to ~25% of slots are
# padding.  Instead of a (T, nc) grid with in-kernel dead-chunk skips
# (which still DMA the dead blocks and burn grid steps), the grid here is
# a host-built flat list of live (tile, chunk) pairs delivered by scalar
# prefetch (models/common.py:_chunk_list): dead chunks never enter the
# grid, so they cost no DMA and no steps, and the chunk size can shrink
# (MAGNET_TPU_CHUNK2) to reclaim partial-chunk padding without paying for
# the extra dead chunks that creates.  flag per entry: 1 = live compute,
# 0 = dead-but-included (zero-init of the tile's output / d_z block —
# chunk 0 of every tile is always listed), 2 = batch-pad repeat (no-op).
#
# Backward caveat: d_z blocks of unlisted dead chunks are never written
# (uninitialized) — the VJP wrapper zeroes them with jnp.where(mask).
# ---------------------------------------------------------------------------


def _fused2r_fwd_pallas(pe, pxj, pxi, w_rest, b_rest, w_out, b_out,
                        ln_s, ln_b, tids, sl2, recv_local, mask,
                        ct, cc, flag, hbm_table=False, we=None, be=None,
                        emit_h0=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # TIMING-ONLY ablations (wrong results!) for locating the in-kernel
    # limiter: MAGNET_TPU_ABLATE=onehot,gather,ln (comma list)
    _ABLATE = set(filter(None, os.environ.get(
        "MAGNET_TPU_ABLATE", "").split(",")))
    # merged sender+receiver one-hot gather (one deep-k matmul instead of
    # K accumulating 128-deep matmuls + a separate receiver gather).
    # OPT-IN on the forward: measured 0.815 vs 0.772 ms at the bench
    # shape — the per-chunk scratch copies + dense (chunk, (K+1)*128)
    # construction cost more than the saved matmul issues there.
    merged_oh = (not hbm_table and not _ABLATE
                 and bool(os.environ.get("MAGNET_TPU_MERGEOH_FWD")))
    fold = we is not None
    if fold:
        # pe is the raw (scan-invariant) edge latents e0 (T, E, Ce); the
        # per-step projection e0 @ we + be happens in-kernel so the
        # (E, H) projected array never exists in HBM
        T, E, Ce = pe.shape
        H = we.shape[1]
        be2 = be.reshape(1, H)
    else:
        T, E, H = pe.shape
    tile_n = pxi.shape[1]
    L1 = w_rest.shape[0]
    C = w_out.shape[1]
    nc, K = tids.shape[1:]
    chunk = E // nc
    n_pad = pxj.shape[0]
    ncl = ct.shape[0]
    sl3 = sl2.reshape(T, 1, E)
    recv3 = recv_local.reshape(T, 1, E)
    mask3 = mask.reshape(T, 1, E)
    b_out2 = b_out.reshape(1, C)
    ln_s2 = ln_s.reshape(1, C)
    ln_b2 = ln_b.reshape(1, C)
    if not L1:
        w_rest = jnp.zeros((1, H, H), jnp.float32)
        b_rest = jnp.zeros((1, H), jnp.float32)
    dt = pe.dtype

    # ---- bucketed-K forward (opt-in, ledger #15 fwd experiment) -------
    # The serial per-k gather already predicates on live windows, but a
    # K_live<=Kb chunk can instead take the MERGED one-hot at width Kb:
    # one (Kb*128 + tile_n)-deep matmul replaces K_live accumulating
    # 128-deep matmuls + the separate receiver gather + the g0 zero-init
    # and its scratch accumulate round-trips (the measured fwd limiter,
    # ledger #14).  The all-chunk merged fwd lost at width K (0.815 vs
    # 0.772 ms); narrow widths change the trade.  MAGNET_TPU_BUCKETK_FWD
    # ="1,2" enables; wide chunks keep their usual path.
    bucket_env_f = os.environ.get("MAGNET_TPU_BUCKETK_FWD", "")
    if not hbm_table and not _ABLATE and bucket_env_f not in ("", "0"):
        bucket_cuts_f = sorted({int(x) for x in bucket_env_f.split(",")
                                if x.strip() and 0 < int(x) < K})
    else:
        bucket_cuts_f = []
    bucket_ks_f = (bucket_cuts_f + [K]) if bucket_cuts_f else None
    if bucket_ks_f is not None:
        klive = jnp.sum(tids[ct, cc] >= 0, axis=-1).astype(jnp.int32)
        kb = jnp.searchsorted(
            jnp.asarray(bucket_cuts_f, jnp.int32), klive).astype(jnp.int32)
    else:
        kb = jnp.zeros((ncl,), jnp.int32)

    def kernel(ct_ref, cc_ref, fl_ref, kb_ref, tid_ref, pe_ref, *rest):
        if fold:
            we_ref, be_ref = rest[:2]
            rest = rest[2:]
        (pxj_ref, pxi_ref, wr_ref, br_ref, wo_ref, bo_ref,
         ls_ref, lb_ref, sl_ref, recv_ref, mask_ref,
         out_ref, *rest) = rest
        if bucket_ks_f is not None:
            if emit_h0:
                h0_ref, *rest = rest
            comb_ref, g0_ref, *win = rest
        else:
            if emit_h0:
                h0_ref, *rest = rest
            if merged_oh:
                comb_ref, *win = rest
            else:
                g0_ref, *win = rest
        i = pl.program_id(0)
        t = ct_ref[i]
        ec = cc_ref[i]
        new_tile = jnp.logical_or(i == 0, ct_ref[jnp.maximum(i - 1, 0)] != t)

        @pl.when(new_tile)
        def _():
            out_ref[0] = jnp.zeros((tile_n, C), jnp.float32)

        def _live(Kb, use_merged):
            if hbm_table:
                # sender table stays in HBM; DMA the K referenced 128-row
                # windows into scratch (issue all, then wait per use)
                win_ref, sem = win
                cps = []
                for k in range(K):
                    tid = tid_ref[(t * nc + ec) * K + k]
                    cp = pltpu.make_async_copy(
                        pxj_ref.at[jnp.maximum(tid, 0)],
                        win_ref.at[pl.ds(k * 128, 128)],
                        sem.at[k],
                    )

                    @pl.when(tid >= 0)
                    def _(cp=cp):
                        cp.start()

                    cps.append(cp)
            sl = sl_ref[0, 0]
            recv = recv_ref[0, 0]
            if use_merged:
                # merged sender+receiver gather: copy the <=Kb live sender
                # tiles plus the pxi tile into one contiguous scratch and
                # gather via ONE deep-k matmul — replaces K serial
                # accumulating 128-deep one-hot matmuls (+ the separate
                # receiver gather), whose VMEM accumulate round-trips and
                # per-matmul issue dominate the kernel (ablation:
                # construction 21% + gather matmuls 45% of fwd time)
                for k in range(Kb):
                    tid = tid_ref[(t * nc + ec) * K + k]

                    @pl.when(tid >= 0)
                    def _(k=k, tid=tid):
                        base = pl.multiple_of(tid * 128, 128)
                        comb_ref[pl.ds(k * 128, 128), :] = (
                            pxj_ref[pl.ds(base, 128), :].astype(dt))

                    @pl.when(tid < 0)
                    def _(k=k):
                        # zero dead windows: their one-hot columns are
                        # never selected, but 0 * garbage(NaN) would
                        # poison the f32 accumulation
                        comb_ref[pl.ds(k * 128, 128), :] = jnp.zeros(
                            (128, H), dt)

                comb_ref[pl.ds(Kb * 128, tile_n), :] = (
                    pxi_ref[0].astype(dt))
                colsw = jax.lax.broadcasted_iota(
                    jnp.int32, (chunk, Kb * 128 + tile_n), 1)
                oh_w = jnp.logical_or(
                    colsw == sl[:, None],
                    colsw == (Kb * 128 + recv)[:, None]).astype(dt)
                gg = _dot(oh_w, comb_ref[0:Kb * 128 + tile_n, :])
            else:
                g0_ref[...] = jnp.zeros((chunk, Hp), jnp.float32)
                cols128 = jax.lax.broadcasted_iota(
                    jnp.int32, (chunk, 128), 1)
                for k in range(K):
                    tid = tid_ref[(t * nc + ec) * K + k]

                    @pl.when(tid >= 0)
                    def _(k=k, tid=tid):
                        if hbm_table:
                            cps[k].wait()
                            w_rows = win[0][pl.ds(k * 128, 128), :]
                        else:
                            base = pl.multiple_of(tid * 128, 128)
                            w_rows = pxj_ref[pl.ds(base, 128), :]
                        if "onehot" in _ABLATE:
                            ohk = (cols128 * 0).astype(dt)
                        else:
                            ohk = (cols128
                                   == (sl - k * 128)[:, None]).astype(dt)
                        if "gather" not in _ABLATE:
                            g0_ref[...] += _dot(ohk, w_rows.astype(dt))

                cols = jax.lax.broadcasted_iota(
                    jnp.int32, (chunk, tile_n), 1)
                if "onehot" in _ABLATE:
                    oh_g = (cols * 0).astype(dt)
                else:
                    oh_g = (cols == recv[:, None]).astype(dt)
                if "gather" in _ABLATE:
                    gath = jnp.zeros((chunk, H), jnp.float32)
                else:
                    gath = _dot(oh_g, pxi_ref[0])
                g0 = (g0_ref[...][:, :H] if Hp != H else g0_ref[...])
                gg = g0 + gath
            if fold:
                pe_c = _dot(pe_ref[0], we_ref[:]) + be_ref[0][None, :]
            else:
                pe_c = pe_ref[0]
            h = jax.nn.relu(pe_c + gg).astype(dt)
            if emit_h0:
                # cache the post-relu first activation for the backward:
                # the bwd kernel then skips the K sender one-hot gathers,
                # the receiver gather, and the fold-e projection recompute
                # (bit-identical — this IS the dt value the bwd rebuilds)
                h0_ref[0] = h
            for k in range(L1):
                h = jax.nn.relu(_dot(h, wr_ref[k])
                                + br_ref[k][None, :]).astype(dt)
            y = _dot(h, wo_ref[:]) + bo_ref[0][None, :]
            if "ln" not in _ABLATE:
                mu = jnp.mean(y, axis=-1, keepdims=True)
                # two-pass variance: E[(y-mu)^2] stays >= 0 where the
                # fast form E[y^2]-mu^2 can cancel NEGATIVE and NaN the
                # rsqrt (torch LayerNorm semantics; B1-64 epoch-30 NaN)
                var = jnp.mean((y - mu) * (y - mu), axis=-1,
                               keepdims=True)
                y = (y - mu) * jax.lax.rsqrt(var + LN_EPS) \
                    * ls_ref[0][None, :] + lb_ref[0][None, :]
            m = mask_ref[0, 0]
            rws = jax.lax.broadcasted_iota(jnp.int32, (tile_n, chunk), 0)
            if "onehot" in _ABLATE:
                oh_a = (rws * 0).astype(dt)
            else:
                oh_a = (rws == recv[None, :]).astype(dt) \
                    * m[None, :].astype(dt)
            out_ref[0] = out_ref[0] + _dot(oh_a, y.astype(dt))

        if bucket_ks_f is None:
            @pl.when(fl_ref[i] == 1)
            def _():
                _live(K, merged_oh)
        else:
            for bi, Kb in enumerate(bucket_ks_f):
                wide = bi == len(bucket_ks_f) - 1

                @pl.when(jnp.logical_and(fl_ref[i] == 1, kb_ref[i] == bi))
                def _(Kb=Kb, wide=wide):
                    # narrow branches take the merged gather (one deep
                    # matmul, no scratch accumulates); the full-K branch
                    # keeps the serial predicated path that wins there
                    _live(Kb, True if not wide else merged_oh)

    full = lambda *shape: pl.BlockSpec(
        shape, lambda i, ct, cc, fl, kb, tid: (0,) * len(shape))
    pxj_spec = (pl.BlockSpec(memory_space=pl.ANY) if hbm_table
                else full(n_pad, H))
    Hp = ((H + 127) // 128) * 128 if hbm_table else H
    if hbm_table:
        # whole-tile 3-D view with the lane dim padded to the 128 tiling:
        # window DMAs must copy whole (128, Hp) tiles (Mosaic rejects
        # slices narrower than the lane tiling); the gather matmul runs
        # at Hp and the result is sliced back to H once per chunk
        pxj = jnp.pad(pxj.reshape(n_pad // 128, 128, H),
                      ((0, 0), (0, 0), (0, Hp - H)))
    if bucket_ks_f is not None:
        # narrow branches gather through comb, the full-K branch through
        # the serial g0 scratch — both must exist
        scratch = [pltpu.VMEM((K * 128 + tile_n, H), dt),
                   pltpu.VMEM((chunk, Hp), jnp.float32)]
    elif merged_oh:
        scratch = [pltpu.VMEM((K * 128 + tile_n, H), dt)]
    else:
        scratch = [pltpu.VMEM((chunk, Hp), jnp.float32)]
    if hbm_table:
        scratch += [pltpu.VMEM((K * 128, Hp), pxj.dtype),
                    pltpu.SemaphoreType.DMA((K,))]
    pe_spec = pl.BlockSpec(
        (1, chunk, Ce if fold else H),
        lambda i, ct, cc, fl, kb, tid: (ct[i], cc[i], 0))
    fold_specs = [full(Ce, H), full(1, H)] if fold else []
    fold_args = [we, be2] if fold else []
    out_shape = jax.ShapeDtypeStruct((T, tile_n, C), jnp.float32)
    out_specs = pl.BlockSpec((1, tile_n, C),
                             lambda i, ct, cc, fl, kb, tid: (ct[i], 0, 0))
    if emit_h0:
        out_shape = (out_shape, jax.ShapeDtypeStruct((T, E, H), dt))
        out_specs = (out_specs,
                     pl.BlockSpec((1, chunk, H),
                                  lambda i, ct, cc, fl, kb, tid:
                                  (ct[i], cc[i], 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(ncl,),
        in_specs=[pe_spec] + fold_specs + [
            pxj_spec,                                        # pxj table
            pl.BlockSpec((1, tile_n, H),
                         lambda i, ct, cc, fl, kb, tid: (ct[i], 0, 0)),
            full(max(L1, 1), H, H),
            full(max(L1, 1), H),
            full(H, C),
            full(1, C),
            full(1, C),
            full(1, C),
            pl.BlockSpec((1, 1, chunk),
                         lambda i, ct, cc, fl, kb, tid: (ct[i], 0, cc[i])),
            pl.BlockSpec((1, 1, chunk),
                         lambda i, ct, cc, fl, kb, tid: (ct[i], 0, cc[i])),
            pl.BlockSpec((1, 1, chunk),
                         lambda i, ct, cc, fl, kb, tid: (ct[i], 0, cc[i])),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=bool(os.environ.get("MAGNET_TPU_PALLAS_INTERPRET")),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * T * E * (K * 128 + tile_n * 2 + L1 * H + C
                               + (Ce if fold else 0)) * H // 2,
            bytes_accessed=4 * (T * E * H + n_pad * H + T * tile_n * H),
            transcendentals=0,
        ),
    )(ct, cc, flag, kb, tids.reshape(-1), pe, *fold_args, pxj, pxi, w_rest, b_rest,
      w_out, b_out2, ln_s2, ln_b2, sl3, recv3, mask3)


def _fused2r_bwd_pallas(pe, pxj, pxi, w_rest, b_rest, w_out, b_out,
                        ln_s, ln_b, tids, sl2, recv_local, mask,
                        ct, cc, flag, g, hbm_table=False,
                        dpxj_in_kernel=False, we=None, be=None, h0=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fold = we is not None
    # h0: the forward's cached post-relu first activation (T, E, H) —
    # skips the K sender one-hot gathers, the receiver gather, and the
    # fold-e projection recompute (bit-identical to the recompute)
    use_h0 = h0 is not None
    # merged one-hot gathers (see _fused2r_fwd_pallas)
    merged_oh = (not hbm_table
                 and not os.environ.get("MAGNET_TPU_NO_MERGEOH"))
    if fold:
        # pe is e0 (T, E, Ce); recompute the in-kernel projection and emit
        # d_e0 (= d_h @ we^T) instead of d_z, plus dwe/dbe accumulators
        T, E, Ce = pe.shape
        H = we.shape[1]
        be2 = be.reshape(1, H)
    else:
        T, E, H = pe.shape
        Ce = H
    tile_n = pxi.shape[1]
    L1 = w_rest.shape[0]
    C = w_out.shape[1]
    nc, K = tids.shape[1:]
    chunk = E // nc
    n_pad = pxj.shape[0]
    ncl = ct.shape[0]
    sl3 = sl2.reshape(T, 1, E)
    recv3 = recv_local.reshape(T, 1, E)
    mask3 = mask.reshape(T, 1, E)
    b_out2 = b_out.reshape(1, C)
    ln_s2 = ln_s.reshape(1, C)
    if not L1:
        w_rest = jnp.zeros((1, H, H), jnp.float32)
        b_rest = jnp.zeros((1, H), jnp.float32)
    dt = pe.dtype
    # d_z emission dtype: the compute dtype halves its HBM write+read
    # traffic when d_pxj is accumulated in-kernel (d_z is then only read
    # back as d_pe), but on the transpose-blocking FALLBACK path d_z
    # addends are segment-summed into d_pxj — emit f32 there so the
    # gradient isn't bf16-quantized exactly where per-node edge counts
    # are highest (ADVICE round 1).
    dz_dt = dt if dpxj_in_kernel else jnp.float32

    def _dot_rt(a, b):
        if a.dtype != b.dtype:
            wide = jnp.promote_types(a.dtype, b.dtype)
            a, b = a.astype(wide), b.astype(wide)
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # ---- bucketed-K backward (ledger #15) -----------------------------
    # 73% of the bench graph's live chunks reference <= 2 sender tiles
    # (54% exactly one) yet every chunk pays the STATIC K widths in the
    # merged one-hot machinery: the (chunk, K*128) oh_s construction, the
    # (K*128 + tile_n)-deep merged gather matmul, the (chunk, K*128)^T
    # d_pxj transpose matmul, and K-cycle window copies.  Live sender
    # tiles are packed FIRST in tids (ops/graph.py:_snd2_layout — so a
    # chunk with K_live <= Kb only references windows [0, Kb) and its
    # sl < Kb*128): per-chunk pl.when branches specialized at width Kb
    # cut those MACs ~K/Kb x.  The branch index is scalar-prefetched so
    # the (cheap, jit-traced) bucket classification stays outside the
    # kernel.  MAGNET_TPU_BUCKETK="1,2" (default) adds Kb in {1,2}
    # branches ahead of the full-K one; "0" disables.  VMEM merged-oh
    # lane only (the hbm/no-merge lanes already predicate per-window).
    bucket_env = os.environ.get("MAGNET_TPU_BUCKETK", "1,2")
    if merged_oh and not hbm_table and bucket_env not in ("", "0"):
        bucket_cuts = sorted({int(x) for x in bucket_env.split(",")
                              if x.strip() and 0 < int(x) < K})
    else:
        bucket_cuts = []
    bucket_ks = (bucket_cuts + [K]) if bucket_cuts else None
    if bucket_ks is not None:
        klive = jnp.sum(tids[ct, cc] >= 0, axis=-1).astype(jnp.int32)
        kb = jnp.searchsorted(
            jnp.asarray(bucket_cuts, jnp.int32), klive).astype(jnp.int32)
    else:
        kb = jnp.zeros((ncl,), jnp.int32)

    def kernel(ct_ref, cc_ref, fl_ref, kb_ref, tid_ref, pe_ref, *rest):
        if fold:
            we_ref, be_ref = rest[:2]
            rest = rest[2:]
        (pxj_ref, pxi_ref, wr_ref, br_ref, wo_ref, bo_ref,
         ls_ref, sl_ref, recv_ref, mask_ref, g_ref, *rest) = rest
        if use_h0:
            h0_ref, *rest = rest
        (dz_ref, dpxi_ref, dwr_ref, dbr_ref, dwo_ref, dbo_ref,
         dls_ref, dlb_ref, *rest) = rest
        if fold:
            dwe_ref, dbe_ref = rest[:2]
            rest = rest[2:]
        if dpxj_in_kernel:
            dpxj_ref, *rest = rest
        if use_h0:
            win = rest
        elif merged_oh:
            comb_ref, *win = rest
        else:
            g0_ref, *win = rest
        i = pl.program_id(0)
        t = ct_ref[i]
        ec = cc_ref[i]
        new_tile = jnp.logical_or(i == 0, ct_ref[jnp.maximum(i - 1, 0)] != t)

        @pl.when(i == 0)
        def _():
            dwr_ref[...] = jnp.zeros_like(dwr_ref)
            dbr_ref[...] = jnp.zeros_like(dbr_ref)
            dwo_ref[...] = jnp.zeros_like(dwo_ref)
            dbo_ref[...] = jnp.zeros_like(dbo_ref)
            dls_ref[...] = jnp.zeros_like(dls_ref)
            dlb_ref[...] = jnp.zeros_like(dlb_ref)
            if fold:
                dwe_ref[...] = jnp.zeros_like(dwe_ref)
                dbe_ref[...] = jnp.zeros_like(dbe_ref)
            if dpxj_in_kernel:
                dpxj_ref[...] = jnp.zeros_like(dpxj_ref)

        @pl.when(new_tile)
        def _():
            dpxi_ref[0] = jnp.zeros((tile_n, H), jnp.float32)

        @pl.when(fl_ref[i] == 0)
        def _():
            dz_ref[0] = jnp.zeros((chunk, Ce), dz_dt)

        def _live(Kb):
            # Kb: the bucketed one-hot width for this branch (== K when
            # bucketing is off).  tid_ref strides stay at the STATIC K.
            sl = sl_ref[0, 0]
            cols128 = jax.lax.broadcasted_iota(jnp.int32, (chunk, 128), 1)
            recv = recv_ref[0, 0]
            m = mask_ref[0, 0]
            cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, tile_n), 1)
            oh_g = (cols == recv[:, None]).astype(dt)
            if merged_oh and dpxj_in_kernel:
                # sender-only merged one-hot, shared by the recompute
                # (concat with oh_g) and the d_pxj transpose scatter
                colss = jax.lax.broadcasted_iota(
                    jnp.int32, (chunk, Kb * 128), 1)
                oh_s = (colss == sl[:, None]).astype(dt)
            if use_h0:
                h = h0_ref[0]
            else:
                if hbm_table:
                    win_ref, sem = win
                    cps = []
                    for k in range(Kb):
                        tid = tid_ref[(t * nc + ec) * K + k]
                        cp = pltpu.make_async_copy(
                            pxj_ref.at[jnp.maximum(tid, 0)],
                            win_ref.at[pl.ds(k * 128, 128)],
                            sem.at[k],
                        )

                        @pl.when(tid >= 0)
                        def _(cp=cp):
                            cp.start()

                        cps.append(cp)
                if merged_oh:
                    for k in range(Kb):
                        tid = tid_ref[(t * nc + ec) * K + k]

                        @pl.when(tid >= 0)
                        def _(k=k, tid=tid):
                            base = pl.multiple_of(tid * 128, 128)
                            comb_ref[pl.ds(k * 128, 128), :] = (
                                pxj_ref[pl.ds(base, 128), :].astype(dt))

                        @pl.when(tid < 0)
                        def _(k=k):
                            comb_ref[pl.ds(k * 128, 128), :] = jnp.zeros(
                                (128, H), dt)

                    comb_ref[pl.ds(Kb * 128, tile_n), :] = (
                        pxi_ref[0].astype(dt))
                    if not dpxj_in_kernel:
                        colss = jax.lax.broadcasted_iota(
                            jnp.int32, (chunk, Kb * 128), 1)
                        oh_s = (colss == sl[:, None]).astype(dt)
                    oh_w = jnp.concatenate([oh_s, oh_g], axis=1)
                    gg = _dot(oh_w, comb_ref[0:Kb * 128 + tile_n, :])
                else:
                    g0_ref[...] = jnp.zeros((chunk, Hp), jnp.float32)
                    for k in range(Kb):
                        tid = tid_ref[(t * nc + ec) * K + k]

                        @pl.when(tid >= 0)
                        def _(k=k, tid=tid):
                            if hbm_table:
                                cps[k].wait()
                                w_rows = win[0][pl.ds(k * 128, 128), :]
                            else:
                                base = pl.multiple_of(tid * 128, 128)
                                w_rows = pxj_ref[pl.ds(base, 128), :]
                            ohk = (cols128
                                   == (sl - k * 128)[:, None]).astype(dt)
                            g0_ref[...] += _dot(ohk, w_rows.astype(dt))

                    gath = _dot(oh_g, pxi_ref[0])
                    g0 = (g0_ref[...][:, :H] if Hp != H else g0_ref[...])
                    gg = g0 + gath

                if fold:
                    pe_c = _dot(pe_ref[0], we_ref[:]) + be_ref[0][None, :]
                else:
                    pe_c = pe_ref[0]
                h = jax.nn.relu(pe_c + gg).astype(dt)
            hs = [h]
            for k in range(L1):
                h = jax.nn.relu(_dot(h, wr_ref[k])
                                + br_ref[k][None, :]).astype(dt)
                hs.append(h)
            y = _dot(h, wo_ref[:]) + bo_ref[0][None, :]
            mu = jnp.mean(y, axis=-1, keepdims=True)
            # two-pass variance: E[(y-mu)^2] stays >= 0 where the
            # fast form E[y^2]-mu^2 can cancel NEGATIVE and NaN the
            # rsqrt (torch LayerNorm semantics; B1-64 epoch-30 NaN)
            var = jnp.mean((y - mu) * (y - mu), axis=-1,
                           keepdims=True)
            inv = jax.lax.rsqrt(var + LN_EPS)
            xhat = (y - mu) * inv

            d_out = _dot(oh_g, g_ref[0].astype(dt)) * m[:, None]
            dls = jnp.sum(d_out * xhat, axis=0, keepdims=True)
            dlb = jnp.sum(d_out, axis=0, keepdims=True)
            d_xhat = d_out * ls_ref[0][None, :]
            d_y = inv * (
                d_xhat
                - jnp.mean(d_xhat, axis=-1, keepdims=True)
                - xhat * jnp.mean(d_xhat * xhat, axis=-1, keepdims=True)
            )
            d_yc = d_y.astype(dt)
            dwo = _dot_t(hs[L1], d_yc)
            dbo = jnp.sum(d_y, axis=0, keepdims=True)
            d_h = _dot_rt(d_yc, wo_ref[:])
            dwr_list = []
            dbr_list = []
            for k in range(L1 - 1, -1, -1):
                d_h = d_h * (hs[k + 1].astype(jnp.float32) > 0)
                dwr_list.append(_dot_t(hs[k], d_h.astype(dt)))
                dbr_list.append(jnp.sum(d_h, axis=0))
                d_h = _dot_rt(d_h.astype(dt), wr_ref[k])
            d_h = d_h * (hs[0].astype(jnp.float32) > 0)
            # d_z / d_e0 is written once per chunk (no accumulation), so
            # emitting it in the compute dtype halves its HBM write+read
            # traffic; callers cast to the primal dtype anyway
            if fold:
                d_h16 = d_h.astype(dt)
                dz_ref[0] = _dot_rt(d_h16, we_ref[:]).astype(dz_dt)  # d_e0
                dwe_ref[...] = dwe_ref[...] + _dot_t(pe_ref[0], d_h16)
                dbe_ref[...] = dbe_ref[...] + jnp.sum(
                    d_h, axis=0, keepdims=True)
            else:
                dz_ref[0] = d_h.astype(dz_dt)
            rws = jax.lax.broadcasted_iota(jnp.int32, (tile_n, chunk), 0)
            oh_a = (rws == recv[None, :]).astype(dt)
            dpxi_ref[0] = dpxi_ref[0] + _dot(oh_a, d_h.astype(dt))

            if dpxj_in_kernel:
                # d_pxj accumulated in-kernel via the transposed sender
                # one-hots (VMEM-resident (n_pad, H) output) — replaces
                # the E-sized XLA transpose-gather + segment sum
                d_hc = d_h.astype(dt)
                if merged_oh:
                    # one deep-k transpose matmul over the merged sender
                    # one-hot, then per-window VMEM adds (dead windows'
                    # rows are zero — sl never points at them)
                    tmp = _dot_t(oh_s, d_hc)              # (Kb*128, H) f32
                    for k in range(Kb):
                        tid = tid_ref[(t * nc + ec) * K + k]

                        @pl.when(tid >= 0)
                        def _(k=k, tid=tid):
                            sli = pl.ds(tid * 128, 128)
                            dpxj_ref[sli, :] = (
                                dpxj_ref[sli, :]
                                + tmp[k * 128:(k + 1) * 128, :])
                else:
                    for k in range(Kb):
                        tid = tid_ref[(t * nc + ec) * K + k]

                        @pl.when(tid >= 0)
                        def _(k=k, tid=tid):
                            ohk = (cols128
                                   == (sl - k * 128)[:, None]).astype(dt)
                            sli = pl.ds(tid * 128, 128)
                            dpxj_ref[sli, :] = (dpxj_ref[sli, :]
                                                + _dot_t(ohk, d_hc))

            if L1:
                dwr_new = jnp.stack(dwr_list[::-1])
                dbr_new = jnp.stack(dbr_list[::-1])
            else:
                dwr_new = jnp.zeros((1, H, H), jnp.float32)
                dbr_new = jnp.zeros((1, H), jnp.float32)
            dwr_ref[...] = dwr_ref[...] + dwr_new
            dbr_ref[...] = dbr_ref[...] + dbr_new
            dwo_ref[...] = dwo_ref[...] + dwo
            dbo_ref[...] = dbo_ref[...] + dbo
            dls_ref[...] = dls_ref[...] + dls
            dlb_ref[...] = dlb_ref[...] + dlb

        if bucket_ks is None:
            @pl.when(fl_ref[i] == 1)
            def _():
                _live(K)
        else:
            for bi, Kb in enumerate(bucket_ks):
                @pl.when(jnp.logical_and(fl_ref[i] == 1, kb_ref[i] == bi))
                def _(Kb=Kb):
                    _live(Kb)

    full = lambda *shape: pl.BlockSpec(
        shape, lambda i, ct, cc, fl, kb, tid: (0,) * len(shape))
    outs = (
        jax.ShapeDtypeStruct((T, E, Ce), dz_dt),             # d_z / d_e0
        jax.ShapeDtypeStruct((T, tile_n, H), jnp.float32),   # d_pxi
        jax.ShapeDtypeStruct((max(L1, 1), H, H), jnp.float32),
        jax.ShapeDtypeStruct((max(L1, 1), H), jnp.float32),
        jax.ShapeDtypeStruct((H, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, chunk, Ce),
                     lambda i, ct, cc, fl, kb, tid: (ct[i], cc[i], 0)),
        pl.BlockSpec((1, tile_n, H),
                     lambda i, ct, cc, fl, kb, tid: (ct[i], 0, 0)),
        full(max(L1, 1), H, H),
        full(max(L1, 1), H),
        full(H, C),
        full(1, C),
        full(1, C),
        full(1, C),
    )
    if fold:
        outs = outs + (jax.ShapeDtypeStruct((Ce, H), jnp.float32),
                       jax.ShapeDtypeStruct((1, H), jnp.float32))
        out_specs = out_specs + (full(Ce, H), full(1, H))
    if dpxj_in_kernel:
        outs = outs + (jax.ShapeDtypeStruct((n_pad, H), jnp.float32),)
        out_specs = out_specs + (full(n_pad, H),)
    pxj_spec = (pl.BlockSpec(memory_space=pl.ANY) if hbm_table
                else full(n_pad, H))
    Hp = ((H + 127) // 128) * 128 if hbm_table else H
    if hbm_table:
        # whole-tile lane-padded 3-D view — see _fused2r_fwd_pallas
        pxj = jnp.pad(pxj.reshape(n_pad // 128, 128, H),
                      ((0, 0), (0, 0), (0, Hp - H)))
    if use_h0 and not hbm_table:
        # with the cached forward activation the recompute branch (the
        # only reader of the sender table) is dead code — pass a 128-row
        # stub instead of keeping the (n_pad, H) table resident in VMEM
        # (frees the table budget for the d_pxj accumulator: the enabler
        # for the snd2-only vmem lane at 256²·H32, where table 4 MiB +
        # d_pxj 8 MiB + chunk scratch exceeds the ~16 MiB chip VMEM)
        pxj = pxj[:128]
        pxj_spec = full(128, H)
    if use_h0:
        scratch = []
    elif merged_oh:
        scratch = [pltpu.VMEM((K * 128 + tile_n, H), dt)]
    else:
        scratch = [pltpu.VMEM((chunk, Hp), jnp.float32)]
    if hbm_table:
        assert not use_h0, "h0 cache is gated to the VMEM-table variant"
        scratch += [pltpu.VMEM((K * 128, Hp), pxj.dtype),
                    pltpu.SemaphoreType.DMA((K,))]
    pe_spec = pl.BlockSpec(
        (1, chunk, Ce if fold else H),
        lambda i, ct, cc, fl, kb, tid: (ct[i], cc[i], 0))
    fold_specs = [full(Ce, H), full(1, H)] if fold else []
    fold_args = [we, be2] if fold else []
    h0_specs = [pl.BlockSpec(
        (1, chunk, H),
        lambda i, ct, cc, fl, kb, tid: (ct[i], cc[i], 0))] if use_h0 else []
    h0_args = [h0] if use_h0 else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(ncl,),
        in_specs=[pe_spec] + fold_specs + [
            pxj_spec,
            pl.BlockSpec((1, tile_n, H),
                         lambda i, ct, cc, fl, kb, tid: (ct[i], 0, 0)),
            full(max(L1, 1), H, H),
            full(max(L1, 1), H),
            full(H, C),
            full(1, C),
            full(1, C),
            pl.BlockSpec((1, 1, chunk),
                         lambda i, ct, cc, fl, kb, tid: (ct[i], 0, cc[i])),
            pl.BlockSpec((1, 1, chunk),
                         lambda i, ct, cc, fl, kb, tid: (ct[i], 0, cc[i])),
            pl.BlockSpec((1, 1, chunk),
                         lambda i, ct, cc, fl, kb, tid: (ct[i], 0, cc[i])),
            pl.BlockSpec((1, tile_n, C),
                         lambda i, ct, cc, fl, kb, tid: (ct[i], 0, 0)),
        ] + h0_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=bool(os.environ.get("MAGNET_TPU_PALLAS_INTERPRET")),
        out_shape=outs,
        cost_estimate=pl.CostEstimate(
            flops=4 * T * E * ((0 if use_h0 else K * 128 + tile_n)
                               + tile_n + 2 * L1 * H
                               + 2 * C + (2 * Ce if fold else 0)) * H // 2,
            bytes_accessed=4 * (2 * T * E * H + n_pad * H
                                + T * tile_n * (H + C)),
            transcendentals=0,
        ),
    )(ct, cc, flag, kb, tids.reshape(-1), pe, *fold_args, pxj, pxi, w_rest, b_rest,
      w_out, b_out2, ln_s2, sl3, recv3, mask3, g, *h0_args)
    dz, dpxi, dwr, dbr, dwo, dbo, dls, dlb = res[:8]
    res = res[8:]
    if fold:
        dwe, dbe = res[:2]
        dbe = dbe.reshape(-1)
        res = res[2:]
    else:
        dwe = dbe = None
    dpxj = res[0] if dpxj_in_kernel else None
    # unlisted dead chunks were never written — zero them (NaN-safe select)
    dz = jnp.where((mask > 0).reshape(T, E, 1), dz, 0.0)
    if not L1:
        dwr = jnp.zeros((0, H, H), jnp.float32)
        dbr = jnp.zeros((0, H), jnp.float32)
    return (dz, dpxi, dwr, dbr, dwo, dbo.reshape(C), dls.reshape(C),
            dlb.reshape(C), dpxj, dwe, dbe)


def _fused2re_ref_impl(e0, we, be, pxj, pxi, w_rest, b_rest, w_out,
                       b_out, ln_s, ln_b, tids, sl2, recv_local, mask):
    """jnp oracle for the fold-e variant: project e0 (f32 accumulation,
    like the kernel's MXU dot) then run the fused2 oracle."""
    pe = (jnp.einsum("tec,ch->teh", e0, we,
                     preferred_element_type=jnp.float32)
          + be.astype(jnp.float32))
    return _fused2_ref_impl(pe, pxj, pxi, w_rest, b_rest, w_out,
                            b_out, ln_s, ln_b, tids, sl2, recv_local, mask)


def _fused2r_impl(pe, pxj, pxi, w_rest, b_rest, w_out, b_out,
                  ln_s, ln_b, tids, sl2, recv_local, mask, ct, cc, flag,
                  hbm_table=False, we=None, be=None):
    if _use_pallas():
        return _fused2r_fwd_pallas(pe, pxj, pxi, w_rest, b_rest,
                                   w_out, b_out, ln_s, ln_b, tids, sl2,
                                   recv_local, mask, ct, cc, flag,
                                   hbm_table=hbm_table, we=we, be=be)
    if we is not None:
        return _fused2re_ref_impl(pe, we, be, pxj, pxi, w_rest, b_rest,
                                  w_out, b_out, ln_s, ln_b, tids, sl2,
                                  recv_local, mask)
    return _fused2_ref_impl(pe, pxj, pxi, w_rest, b_rest, w_out,
                            b_out, ln_s, ln_b, tids, sl2, recv_local, mask)


def _make_fused2r(hbm_table: bool, fold_e: bool = False):
    """fold_e=False: takes the pre-projected pe (T,E,H).
    fold_e=True: takes the raw edge latents e0 (T,E,Ce) plus the (Ce,H)
    projection weight / (H,) bias; the projection runs in-kernel so the
    (E,H) array (and its cotangent pass) never exists in HBM.  Callers
    fold any scalar edge scale into ``we`` (autodiff through that product
    recovers d_scale outside the kernel)."""

    def _impl_args(pe, we, be):
        return dict(hbm_table=hbm_table,
                    we=we if fold_e else None,
                    be=be if fold_e else None)

    @jax.custom_vjp
    def f2r(pe, we, be, pxj, pxi, w_rest, b_rest, w_out, b_out,
            ln_s, ln_b, tids, sl2, recv_local, mask,
            ct, cc, flag, snd_edge_ids, snd_local):
        return _fused2r_impl(pe, pxj, pxi, w_rest, b_rest, w_out, b_out,
                             ln_s, ln_b, tids, sl2, recv_local, mask,
                             ct, cc, flag, **_impl_args(pe, we, be))

    def fwd(pe, we, be, pxj, pxi, w_rest, b_rest, w_out, b_out,
            ln_s, ln_b, tids, sl2, recv_local, mask,
            ct, cc, flag, snd_edge_ids, snd_local):
        # cache the post-relu first activation as a VJP residual so the
        # backward kernel skips its gather/projection recompute entirely
        # (one extra (E, H) compute-dtype write fwd + read bwd vs
        # K sender one-hots + receiver gather + fold matmul per chunk).
        # OPT-IN: at the bench shape this measured a net LOSS (47.9M vs
        # 51.2M edges/s) — the kernels there are bound by per-chunk
        # issue/VPU work, not the recomputed matmuls, and the extra
        # per-chunk h0 block write-back costs more than the saved MXU
        # time.  Kept for larger-H / deeper-tail shapes where the
        # recompute dominates.
        # (with an HBM table, h0 additionally lets the BACKWARD drop the
        # window DMAs AND the table residency entirely — see bwd below —
        # which is what makes the snd-less hbm lane viable at 256²·H32;
        # for that lane h0 is MANDATORY: the backward has neither a
        # transpose fallback (no snd layout) nor the VMEM for a resident
        # table, so it auto-enables rather than reading the env)
        emit = (_use_pallas()
                and (bool(os.environ.get("MAGNET_TPU_H0CACHE"))
                     or (hbm_table and snd_edge_ids is None)))
        if emit:
            out, h0 = _fused2r_fwd_pallas(
                pe, pxj, pxi, w_rest, b_rest, w_out, b_out, ln_s, ln_b,
                tids, sl2, recv_local, mask, ct, cc, flag,
                hbm_table=hbm_table, emit_h0=True,
                **({"we": we, "be": be} if fold_e else {}))
        else:
            out = _fused2r_impl(pe, pxj, pxi, w_rest, b_rest, w_out,
                                b_out, ln_s, ln_b, tids, sl2, recv_local,
                                mask, ct, cc, flag,
                                **_impl_args(pe, we, be))
            h0 = None
        return out, (pe, we, be, pxj, pxi, w_rest, b_rest, w_out, b_out,
                     ln_s, ln_b, tids, sl2, recv_local, mask, ct, cc,
                     flag, snd_edge_ids, snd_local, h0)

    def bwd(res, g):
        (pe, we, be, pxj, pxi, w_rest, b_rest, w_out, b_out, ln_s, ln_b,
         tids, sl2, recv_local, mask, ct, cc, flag,
         snd_edge_ids, snd_local, h0) = res
        idx_nones = (None,) * 9
        if not _use_pallas():
            if fold_e:
                def f(pe_, we_, be_, pxj_, pxi_, wr_, br_, wo_, bo_,
                      ls_, lb_):
                    return _fused2re_ref_impl(
                        pe_, we_, be_, pxj_, pxi_, wr_, br_, wo_, bo_,
                        ls_, lb_, tids, sl2, recv_local, mask)

                _, vjp = jax.vjp(f, pe, we, be, pxj, pxi, w_rest,
                                 b_rest, w_out, b_out, ln_s, ln_b)
                (dpe_r, dwe, dbe, dpxj_r, dpxi, dwr, dbr, dwo, dbo,
                 dls, dlb) = vjp(g)
                return (dpe_r.astype(pe.dtype), dwe.astype(we.dtype),
                        dbe.astype(be.dtype), dpxj_r.astype(pxj.dtype),
                        dpxi.astype(pxi.dtype), dwr.astype(w_rest.dtype),
                        dbr.astype(b_rest.dtype), dwo.astype(w_out.dtype),
                        dbo.astype(b_out.dtype), dls.astype(ln_s.dtype),
                        dlb.astype(ln_b.dtype)) + idx_nones

            def f(pe_, pxj_, pxi_, wr_, br_, wo_, bo_, ls_, lb_):
                return _fused2_ref_impl(pe_, pxj_, pxi_, wr_, br_, wo_,
                                        bo_, ls_, lb_, tids, sl2,
                                        recv_local, mask)

            _, vjp = jax.vjp(f, pe, pxj, pxi, w_rest, b_rest, w_out,
                             b_out, ln_s, ln_b)
            dpe_r, dpxj_r, dpxi, dwr, dbr, dwo, dbo, dls, dlb = vjp(g)
            return (dpe_r.astype(pe.dtype), None, None,
                    dpxj_r.astype(pxj.dtype),
                    dpxi.astype(pxi.dtype), dwr.astype(w_rest.dtype),
                    dbr.astype(b_rest.dtype), dwo.astype(w_out.dtype),
                    dbo.astype(b_out.dtype), dls.astype(ln_s.dtype),
                    dlb.astype(ln_b.dtype)) + idx_nones

        # d_pxj accumulates in-kernel (VMEM-resident (n_pad, H) f32
        # output) when it fits; the transpose-blocking reduce is the
        # fallback (and the only option for the HBM-table variant)
        T, E = pe.shape[:2]
        H = we.shape[1] if fold_e else pe.shape[2]
        # with the cached h0 the backward never reads the sender table,
        # so the HBM-table variant degenerates to the (stubbed) VMEM
        # form — window DMAs and the hbm gating both drop out
        bwd_hbm = hbm_table and h0 is None
        in_kernel = (not bwd_hbm
                     and pxj.shape[0] * H * 4
                     <= (DPXJ_H0_BYTES if h0 is not None
                         else DPXJ_TABLE_BYTES))
        (dz, dpxi, dwr, dbr, dwo, dbo, dls, dlb, dpxj, dwe,
         dbe) = _fused2r_bwd_pallas(
            pe, pxj, pxi, w_rest, b_rest, w_out, b_out, ln_s, ln_b,
            tids, sl2, recv_local, mask, ct, cc, flag, g,
            hbm_table=bwd_hbm, dpxj_in_kernel=in_kernel, h0=h0,
            **({"we": we, "be": be} if fold_e else {}))
        if dpxj is None:
            # reduce d_z into sender rows via the transpose blocking.
            # fold-e caveat: d_z there is the projection cotangent
            # d_h = d_e0 @ pinv(we)… not recoverable — so the fold-e
            # variants always need either the in-kernel dpxj or a
            # separate d_h emission; we re-derive d_h = d_e0 via the
            # non-fold relationship only when not folding.
            assert not fold_e, "fold-e requires in-kernel d_pxj or HBM path"
            dz_flat = dz.reshape(T * E, H)
            padded = jnp.concatenate(
                [dz_flat, jnp.zeros((1, H), dz_flat.dtype)], 0)
            ts, ets = snd_local.shape
            gathered = jnp.take(padded, snd_edge_ids.reshape(-1),
                                axis=0).reshape(ts, ets, H)
            smask = (snd_edge_ids < T * E).astype(jnp.float32)
            dpxj = blocked_segment_sum(gathered, snd_local, smask,
                                       128).reshape(-1, H)
            dpxj = jnp.pad(
                dpxj, ((0, pxj.shape[0] - dpxj.shape[0]), (0, 0)))
        return (dz.astype(pe.dtype),
                dwe.astype(we.dtype) if fold_e else None,
                dbe.astype(be.dtype) if fold_e else None,
                dpxj.astype(pxj.dtype),
                dpxi.astype(pxi.dtype), dwr.astype(w_rest.dtype),
                dbr.astype(b_rest.dtype), dwo.astype(w_out.dtype),
                dbo.astype(b_out.dtype), dls.astype(ln_s.dtype),
                dlb.astype(ln_b.dtype)) + idx_nones

    f2r.defvjp(fwd, bwd)
    if fold_e:
        return f2r

    def f2r_nofold(pe, pxj, pxi, w_rest, b_rest, w_out, b_out,
                   ln_s, ln_b, tids, sl2, recv_local, mask,
                   ct, cc, flag, snd_edge_ids, snd_local):
        return f2r(pe, None, None, pxj, pxi, w_rest, b_rest, w_out,
                   b_out, ln_s, ln_b, tids, sl2, recv_local, mask,
                   ct, cc, flag, snd_edge_ids, snd_local)

    return f2r_nofold


#: fused2 math on the ragged flat live-chunk grid (scalar-prefetched
#: visit list from models/common.py:_chunk_list); sender table
#: VMEM-resident.  Returns (T, tile_n, C) float32 masked sums.
fused_edge_tail_agg2r = _make_fused2r(hbm_table=False)

#: same, but the sender table stays in HBM and the kernel DMAs only the
#: K referenced 128-row windows per chunk — in-kernel sender gather at
#: mesh sizes whose projected node table exceeds the VMEM budget (e.g.
#: the 256^2 stretch workload: 65k nodes x 128 x4B = 33 MB).
fused_edge_tail_agg2h = _make_fused2r(hbm_table=True)

#: fold-e variant of the ragged-grid kernel: takes the raw scan-invariant
#: edge latents e0 (T, E, Ce) plus the (Ce, H) first-layer edge projection
#: weight/bias; the projection runs in-kernel so the per-mp-step projected
#: (E, H) array (and its cotangent) never exists in HBM.  Backward
#: requires the in-kernel d_pxj accumulation (VMEM-resident node table) —
#: callers gate on the table budget.
fused_edge_tail_agg2rf = _make_fused2r(hbm_table=False, fold_e=True)


# ---------------------------------------------------------------------------
# Fused MPNN edge pipeline v2r: the Brandstetter message path with BOTH node
# gathers in-kernel on the ragged flat live-chunk grid.
#
# Unlike the InteractionNetwork path, the MPNN message has no per-edge
# feature input: msg = swish(Linear(swish(recv_side[i] + send_side[j]))).
# With the sender gather in-kernel (predicated per-tile one-hot matmuls,
# fused2-style) the ONLY E-sized HBM traffic left is the int32/f32 index
# and mask vectors — no (E, H) array exists in the forward.  The backward
# recomputes in VMEM and scatters d_z1 into BOTH node tables in-kernel
# (d_recv per-tile accumulation; d_send via transposed one-hot matmuls
# into a VMEM-resident (n_pad, H) accumulator), so no (E, H) cotangent
# exists either.  Callers gate on the node-table VMEM budget.
# ---------------------------------------------------------------------------


def _mpnn2r_ref_impl(pxj, pr, w, b, tids, sl2, recv_local, mask):
    """jnp oracle.  pxj (N_pad, H) sender-side table; pr (T, tile_n, H)
    receiver-side table; tids (T, nc, K) int32 (pad -1); sl2 (T, E) =
    slot*128 + local (pad -1); recv_local/mask (T, E) -> (T, tile_n, H)
    f32 masked sums of swish(Linear(swish(send[j] + recv[i])))."""
    T, E = recv_local.shape
    H = pxj.shape[1]
    nc, K = tids.shape[1:]
    chunk = E // nc
    n_pad = pxj.shape[0]
    slot = jnp.where(sl2 >= 0, sl2 // 128, 0)
    local = jnp.where(sl2 >= 0, sl2 % 128, 0)
    tid_per_edge = jnp.take_along_axis(
        jnp.repeat(tids, chunk, axis=1).reshape(T, E, K),
        slot[..., None], axis=2)[..., 0]
    gidx = jnp.clip(tid_per_edge * 128 + local, 0, n_pad - 1)
    g0 = jnp.take(pxj, gidx.reshape(-1), axis=0).reshape(T, E, H)
    g0 = jnp.where((sl2 >= 0)[..., None], g0, 0)
    gath = jnp.take_along_axis(pr, recv_local[..., None], axis=1)
    z1 = g0.astype(jnp.float32) + gath.astype(jnp.float32)
    h1 = _swish(z1)
    z2 = (jnp.einsum("teh,hk->tek", h1.astype(pxj.dtype), w,
                     preferred_element_type=jnp.float32)
          + b.astype(jnp.float32))
    h2 = _swish(z2)
    tile_n = pr.shape[1]
    iota = jnp.arange(tile_n, dtype=recv_local.dtype)
    onehot = (recv_local[:, None, :] == iota[None, :, None]).astype(h2.dtype)
    onehot = onehot * mask[:, None, :].astype(h2.dtype)
    return jnp.einsum("tne,tec->tnc", onehot, h2,
                      preferred_element_type=jnp.float32)


def _mpnn2r_fwd_pallas(pxj, pr, w, b, tids, sl2, recv_local, mask,
                       ct, cc, flag):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, E = recv_local.shape
    H = pxj.shape[1]
    tile_n = pr.shape[1]
    nc, K = tids.shape[1:]
    chunk = E // nc
    ncl = ct.shape[0]
    sl3 = sl2.reshape(T, 1, E)
    recv3 = recv_local.reshape(T, 1, E)
    mask3 = mask.reshape(T, 1, E)
    b2 = b.reshape(1, H)
    dt = pxj.dtype

    def kernel(ct_ref, cc_ref, fl_ref, tid_ref, pxj_ref, pr_ref, w_ref,
               b_ref, sl_ref, recv_ref, mask_ref, out_ref, g0_ref):
        i = pl.program_id(0)
        t = ct_ref[i]
        ec = cc_ref[i]
        new_tile = jnp.logical_or(i == 0, ct_ref[jnp.maximum(i - 1, 0)] != t)

        @pl.when(new_tile)
        def _():
            out_ref[0] = jnp.zeros((tile_n, H), jnp.float32)

        @pl.when(fl_ref[i] == 1)
        def _():
            sl = sl_ref[0, 0]
            g0_ref[...] = jnp.zeros((chunk, H), jnp.float32)
            cols128 = jax.lax.broadcasted_iota(jnp.int32, (chunk, 128), 1)
            for k in range(K):
                tid = tid_ref[(t * nc + ec) * K + k]

                @pl.when(tid >= 0)
                def _(k=k, tid=tid):
                    base = pl.multiple_of(tid * 128, 128)
                    win = pxj_ref[pl.ds(base, 128), :]
                    ohk = (cols128 == (sl - k * 128)[:, None]).astype(dt)
                    g0_ref[...] += _dot(ohk, win.astype(dt))

            recv = recv_ref[0, 0]
            m = mask_ref[0, 0]
            cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, tile_n), 1)
            oh_g = (cols == recv[:, None]).astype(dt)
            gath = _dot(oh_g, pr_ref[0])
            h1 = _swish(g0_ref[...] + gath).astype(dt)
            h2 = _swish(_dot(h1, w_ref[:]) + b_ref[0][None, :])
            rws = jax.lax.broadcasted_iota(jnp.int32, (tile_n, chunk), 0)
            oh_a = (rws == recv[None, :]).astype(dt) * m[None, :].astype(dt)
            out_ref[0] = out_ref[0] + _dot(oh_a, h2.astype(dt))

    full = lambda *shape: pl.BlockSpec(
        shape, lambda i, ct, cc, fl, tid: (0,) * len(shape))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ncl,),
        in_specs=[
            full(pxj.shape[0], H),                           # sender table
            pl.BlockSpec((1, tile_n, H),
                         lambda i, ct, cc, fl, tid: (ct[i], 0, 0)),
            full(H, H),
            full(1, H),
            pl.BlockSpec((1, 1, chunk),
                         lambda i, ct, cc, fl, tid: (ct[i], 0, cc[i])),
            pl.BlockSpec((1, 1, chunk),
                         lambda i, ct, cc, fl, tid: (ct[i], 0, cc[i])),
            pl.BlockSpec((1, 1, chunk),
                         lambda i, ct, cc, fl, tid: (ct[i], 0, cc[i])),
        ],
        out_specs=pl.BlockSpec((1, tile_n, H),
                               lambda i, ct, cc, fl, tid: (ct[i], 0, 0)),
        scratch_shapes=[pltpu.VMEM((chunk, H), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=bool(os.environ.get("MAGNET_TPU_PALLAS_INTERPRET")),
        out_shape=jax.ShapeDtypeStruct((T, tile_n, H), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * E * ((K * 128 + 2 * tile_n + H) * H),
            bytes_accessed=4 * (pxj.shape[0] * H + 2 * T * tile_n * H),
            transcendentals=2 * T * E * H,
        ),
    )(ct, cc, flag, tids.reshape(-1), pxj, pr, w, b2, sl3, recv3, mask3)


def _mpnn2r_bwd_pallas(pxj, pr, w, b, tids, sl2, recv_local, mask,
                       ct, cc, flag, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, E = recv_local.shape
    H = pxj.shape[1]
    tile_n = pr.shape[1]
    nc, K = tids.shape[1:]
    chunk = E // nc
    n_pad = pxj.shape[0]
    ncl = ct.shape[0]
    sl3 = sl2.reshape(T, 1, E)
    recv3 = recv_local.reshape(T, 1, E)
    mask3 = mask.reshape(T, 1, E)
    b2 = b.reshape(1, H)
    dt = pxj.dtype

    def kernel(ct_ref, cc_ref, fl_ref, tid_ref, pxj_ref, pr_ref, w_ref,
               b_ref, sl_ref, recv_ref, mask_ref, g_ref,
               dpxj_ref, dpr_ref, dw_ref, db_ref, g0_ref):
        i = pl.program_id(0)
        t = ct_ref[i]
        ec = cc_ref[i]
        new_tile = jnp.logical_or(i == 0, ct_ref[jnp.maximum(i - 1, 0)] != t)

        @pl.when(i == 0)
        def _():
            dpxj_ref[...] = jnp.zeros_like(dpxj_ref)
            dw_ref[...] = jnp.zeros_like(dw_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        @pl.when(new_tile)
        def _():
            dpr_ref[0] = jnp.zeros((tile_n, H), jnp.float32)

        @pl.when(fl_ref[i] == 1)
        def _():
            sl = sl_ref[0, 0]
            # recompute the sender gather
            g0_ref[...] = jnp.zeros((chunk, H), jnp.float32)
            cols128 = jax.lax.broadcasted_iota(jnp.int32, (chunk, 128), 1)
            for k in range(K):
                tid = tid_ref[(t * nc + ec) * K + k]

                @pl.when(tid >= 0)
                def _(k=k, tid=tid):
                    base = pl.multiple_of(tid * 128, 128)
                    win = pxj_ref[pl.ds(base, 128), :]
                    ohk = (cols128 == (sl - k * 128)[:, None]).astype(dt)
                    g0_ref[...] += _dot(ohk, win.astype(dt))

            recv = recv_ref[0, 0]
            m = mask_ref[0, 0]
            cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, tile_n), 1)
            oh_g = (cols == recv[:, None]).astype(dt)
            gath = _dot(oh_g, pr_ref[0])
            z1 = g0_ref[...] + gath                         # f32
            h1 = _swish(z1)
            z2 = _dot(h1.astype(dt), w_ref[:]) + b_ref[0][None, :]

            d_h2 = _dot(oh_g, g_ref[0].astype(dt)) * m[:, None]
            d_z2 = d_h2 * _dswish(z2)
            dw_ref[...] = dw_ref[...] + _dot_t(h1.astype(dt),
                                               d_z2.astype(dt))
            db_ref[...] = db_ref[...] + jnp.sum(d_z2, axis=0, keepdims=True)
            d_h1 = jax.lax.dot_general(
                d_z2.astype(dt), w_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            d_z1 = d_h1 * _dswish(z1)
            d_z1c = d_z1.astype(dt)
            rws = jax.lax.broadcasted_iota(jnp.int32, (tile_n, chunk), 0)
            oh_a = (rws == recv[None, :]).astype(dt)
            dpr_ref[0] = dpr_ref[0] + _dot(oh_a, d_z1c)
            # d_send: transposed sender one-hots into the resident table
            for k in range(K):
                tid = tid_ref[(t * nc + ec) * K + k]

                @pl.when(tid >= 0)
                def _(k=k, tid=tid):
                    ohk = (cols128 == (sl - k * 128)[:, None]).astype(dt)
                    sli = pl.ds(tid * 128, 128)
                    dpxj_ref[sli, :] = (dpxj_ref[sli, :]
                                        + _dot_t(ohk, d_z1c))

    full = lambda *shape: pl.BlockSpec(
        shape, lambda i, ct, cc, fl, tid: (0,) * len(shape))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ncl,),
        in_specs=[
            full(n_pad, H),
            pl.BlockSpec((1, tile_n, H),
                         lambda i, ct, cc, fl, tid: (ct[i], 0, 0)),
            full(H, H),
            full(1, H),
            pl.BlockSpec((1, 1, chunk),
                         lambda i, ct, cc, fl, tid: (ct[i], 0, cc[i])),
            pl.BlockSpec((1, 1, chunk),
                         lambda i, ct, cc, fl, tid: (ct[i], 0, cc[i])),
            pl.BlockSpec((1, 1, chunk),
                         lambda i, ct, cc, fl, tid: (ct[i], 0, cc[i])),
            pl.BlockSpec((1, tile_n, H),
                         lambda i, ct, cc, fl, tid: (ct[i], 0, 0)),
        ],
        out_specs=(
            full(n_pad, H),
            pl.BlockSpec((1, tile_n, H),
                         lambda i, ct, cc, fl, tid: (ct[i], 0, 0)),
            full(H, H),
            full(1, H),
        ),
        scratch_shapes=[pltpu.VMEM((chunk, H), jnp.float32)],
    )
    dpxj, dpr, dw, db = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=bool(os.environ.get("MAGNET_TPU_PALLAS_INTERPRET")),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, H), jnp.float32),
            jax.ShapeDtypeStruct((T, tile_n, H), jnp.float32),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * T * E * ((2 * K * 128 + 2 * tile_n + 2 * H) * H),
            bytes_accessed=4 * (2 * n_pad * H + 3 * T * tile_n * H),
            transcendentals=4 * T * E * H,
        ),
    )(ct, cc, flag, tids.reshape(-1), pxj, pr, w, b2, sl3, recv3, mask3, g)
    return dpxj, dpr, dw, db.reshape(H)


def _mpnn2r_impl(pxj, pr, w, b, tids, sl2, recv_local, mask, ct, cc, flag):
    if _use_pallas():
        return _mpnn2r_fwd_pallas(pxj, pr, w, b, tids, sl2, recv_local,
                                  mask, ct, cc, flag)
    return _mpnn2r_ref_impl(pxj, pr, w, b, tids, sl2, recv_local, mask)


@jax.custom_vjp
def fused_mpnn_edge_agg2r(pxj, pr, w, b, tids, sl2, recv_local, mask,
                          ct, cc, flag):
    """Fused MPNN message path with BOTH node gathers in-kernel on the
    ragged flat live-chunk grid: masked sums by receiver of
    swish(Linear(swish(send_side[j] + recv_side[i]))).

    Args:
      pxj: (N_pad, H) sender-side node table (VMEM-resident; caller
          guards the budget).
      pr: (T, tile_n, H) receiver-side table per node tile.
      w/b: (H, H)/(H,) the second message Linear.
      tids/sl2: sender-tile metadata as fused_edge_tail_agg2.
      recv_local/mask: (T, E_TILE); ct/cc/flag: flat live-chunk list.
    Returns: (T, tile_n, H) float32 masked sums.  No (E, H) array exists
    in HBM in either direction.
    """
    return _mpnn2r_impl(pxj, pr, w, b, tids, sl2, recv_local, mask,
                        ct, cc, flag)


def _mpnn2r_fwd(pxj, pr, w, b, tids, sl2, recv_local, mask, ct, cc, flag):
    out = _mpnn2r_impl(pxj, pr, w, b, tids, sl2, recv_local, mask,
                       ct, cc, flag)
    return out, (pxj, pr, w, b, tids, sl2, recv_local, mask, ct, cc, flag)


def _mpnn2r_bwd(res, g):
    pxj, pr, w, b, tids, sl2, recv_local, mask, ct, cc, flag = res
    if _use_pallas():
        dpxj, dpr, dw, db = _mpnn2r_bwd_pallas(
            pxj, pr, w, b, tids, sl2, recv_local, mask, ct, cc, flag, g)
    else:
        def f(pxj_, pr_, w_, b_):
            return _mpnn2r_ref_impl(pxj_, pr_, w_, b_, tids, sl2,
                                    recv_local, mask)

        _, vjp = jax.vjp(f, pxj, pr, w, b)
        dpxj, dpr, dw, db = vjp(g)
    return (dpxj.astype(pxj.dtype), dpr.astype(pr.dtype),
            dw.astype(w.dtype), db.astype(b.dtype),
            None, None, None, None, None, None, None)


fused_mpnn_edge_agg2r.defvjp(_mpnn2r_fwd, _mpnn2r_bwd)
