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
