"""Device-side sparse aggregation primitives (gather-formulated, jit-safe).

The reference leans on torch_geometric's CUDA scatter kernels inside
``MessagePassing.propagate`` (reference models/magnet_cnn.py:79,
models/mpnn.py:69).  On TPU, scatter-adds lower poorly; instead we formulate
neighborhood aggregation as a GATHER over a per-receiver edge-id table built
host-side (see magnet_tpu/ops/graph.py), followed by a masked reduction over
the neighbor axis.  Every shape is static.

All functions operate on a single sample; batch via ``jax.vmap`` (the
framework always batches same-resolution samples, so segments are uniform).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_edges(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x: (N, C), idx: (E,) -> (E, C)."""
    return jnp.take(x, idx, axis=0)


def aggregate_mean(
    messages: jnp.ndarray,
    recv_edge_ids: jnp.ndarray,
    edge_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Masked mean of incoming edge messages per node.

    Args:
      messages: (E, C) edge messages (padding rows may hold garbage).
      recv_edge_ids: (N, K) int32, ids into messages; padded slots == E.
      edge_mask: (E,) 1/0 mask of real edges.

    Returns: (N, C) mean over real incoming edges (0 where degree == 0) —
    matching torch_geometric scatter-mean semantics.
    """
    e = messages.shape[0]
    msgs = jnp.concatenate([messages, jnp.zeros_like(messages[:1])], axis=0)
    maskp = jnp.concatenate([edge_mask, jnp.zeros_like(edge_mask[:1])], axis=0)
    g = jnp.take(msgs, recv_edge_ids, axis=0)          # (N, K, C)
    w = jnp.take(maskp, recv_edge_ids, axis=0)         # (N, K)
    total = jnp.einsum("nkc,nk->nc", g, w)
    deg = jnp.sum(w, axis=1, keepdims=True)
    return total / jnp.maximum(deg, 1.0)


def aggregate_sum(messages, recv_edge_ids, edge_mask):
    e = messages.shape[0]
    msgs = jnp.concatenate([messages, jnp.zeros_like(messages[:1])], axis=0)
    maskp = jnp.concatenate([edge_mask, jnp.zeros_like(edge_mask[:1])], axis=0)
    g = jnp.take(msgs, recv_edge_ids, axis=0)
    w = jnp.take(maskp, recv_edge_ids, axis=0)
    return jnp.einsum("nkc,nk->nc", g, w)


def aggregate_max(messages, recv_edge_ids, edge_mask):
    """Masked max; 0 for degree-0 nodes (torch_geometric convention)."""
    neg = jnp.finfo(messages.dtype).min
    msgs = jnp.concatenate([messages, jnp.full_like(messages[:1], neg)], axis=0)
    maskp = jnp.concatenate([edge_mask, jnp.zeros_like(edge_mask[:1])], axis=0)
    g = jnp.take(msgs, recv_edge_ids, axis=0)          # (N, K, C)
    w = jnp.take(maskp, recv_edge_ids, axis=0)[..., None]
    g = jnp.where(w > 0, g, neg)
    out = jnp.max(g, axis=1)
    deg = jnp.sum(w[..., 0], axis=1, keepdims=True)
    return jnp.where(deg > 0, out, 0.0)


def segment_instance_norm(
    x: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """Per-graph, per-channel standardization over the node axis.

    Equivalent to torch_geometric ``InstanceNorm(C)`` with its defaults
    (``affine=False, track_running_stats=False``, biased variance, eps=1e-5)
    applied to a single graph's nodes — reference models/mpnn.py:63,70.
    x: (N, C).
    """
    mean = jnp.mean(x, axis=0, keepdims=True)
    # two-pass variance (torch InstanceNorm semantics; the fast form
    # can cancel negative and NaN the sqrt)
    var = jnp.mean((x - mean) * (x - mean), axis=0, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def aggregate_mean_graph(messages: jnp.ndarray, gs) -> jnp.ndarray:
    """Masked-mean aggregation for a per-sample Graph (either layout).

    messages: (E, C); gs: magnet_tpu.models.common.Graph per-sample slice.
    Returns (N, C) where N = gs.degree.shape[0] (blocked) or
    gs.recv_edge_ids.shape[0] (table).
    """
    if gs.blk_recv_local is not None:
        from magnet_tpu.ops.pallas_kernels import blocked_segment_sum

        t, et = gs.blk_recv_local.shape
        c = messages.shape[-1]
        tile_n = 128
        out = blocked_segment_sum(
            messages.reshape(t, et, c),
            gs.blk_recv_local,
            gs.edge_mask.reshape(t, et),
            tile_n,
        ).reshape(t * tile_n, c)
        n = gs.degree.shape[0]
        out = out[:n] / jnp.maximum(gs.degree, 1.0)
        return out.astype(messages.dtype)
    return aggregate_mean(messages, gs.recv_edge_ids, gs.edge_mask)


def _transpose_sum_by_sender(d_edges: jnp.ndarray, gs) -> jnp.ndarray:
    """Sum per-edge cotangents into sender nodes using the sender-side
    transpose blocking: gather rows by snd_edge_ids, then one MXU one-hot
    matmul per tile (no XLA scatter)."""
    from magnet_tpu.ops.pallas_kernels import blocked_segment_sum

    t, ets = gs.blk_snd_local.shape
    c = d_edges.shape[-1]
    e_flat = d_edges.shape[0]
    padded = jnp.concatenate([d_edges, jnp.zeros_like(d_edges[:1])], axis=0)
    g = jnp.take(padded, gs.blk_snd_edge_ids.reshape(-1), axis=0).reshape(
        t, ets, c
    )
    mask = (gs.blk_snd_edge_ids < e_flat).astype(d_edges.dtype)
    out = blocked_segment_sum(g, gs.blk_snd_local, mask, 128).reshape(-1, c)
    n = gs.degree.shape[0]
    return out[:n].astype(d_edges.dtype)


def _sum_by_receiver(d_edges: jnp.ndarray, gs) -> jnp.ndarray:
    """Sum per-edge cotangents into receiver nodes via the receiver
    blocking (edges are already receiver-tile-packed)."""
    from magnet_tpu.ops.pallas_kernels import blocked_segment_sum

    t, et = gs.blk_recv_local.shape
    c = d_edges.shape[-1]
    out = blocked_segment_sum(
        d_edges.reshape(t, et, c), gs.blk_recv_local,
        gs.edge_mask.reshape(t, et), 128,
    ).reshape(-1, c)
    n = gs.degree.shape[0]
    return out[:n].astype(d_edges.dtype)


@jax.custom_vjp
def gather_receiver(p: jnp.ndarray, gs) -> jnp.ndarray:
    """p[(receivers)] with a scatter-free backward (blocked MXU reduction).
    p: (N, C) -> (E, C).  Requires the blocked layout; callers fall back to
    plain take otherwise."""
    return jnp.take(p, gs.receivers, axis=0)


def _gr_fwd(p, gs):
    return jnp.take(p, gs.receivers, axis=0), gs


def _gr_bwd(gs, g):
    return _sum_by_receiver(g, gs), None


gather_receiver.defvjp(_gr_fwd, _gr_bwd)


@jax.custom_vjp
def gather_sender(p: jnp.ndarray, gs) -> jnp.ndarray:
    """p[(senders)] with a scatter-free backward via the sender-side
    transpose blocking.  p: (N, C) -> (E, C)."""
    return jnp.take(p, gs.senders, axis=0)


def _gs_fwd(p, gs):
    return jnp.take(p, gs.senders, axis=0), gs


def _gs_bwd(gs, g):
    return _transpose_sum_by_sender(g, gs), None


gather_sender.defvjp(_gs_fwd, _gs_bwd)


def gather_nodes(p: jnp.ndarray, gs, side: str) -> jnp.ndarray:
    """Gather node rows per edge; scatter-free VJP when the blocked layout
    is present."""
    if side == "receiver":
        if gs.blk_recv_local is not None:
            return gather_receiver(p, gs)
        return jnp.take(p, gs.receivers, axis=0)
    if gs.blk_snd_edge_ids is not None:
        return gather_sender(p, gs)
    return jnp.take(p, gs.senders, axis=0)
