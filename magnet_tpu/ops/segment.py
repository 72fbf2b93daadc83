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
    var = jnp.mean(x * x, axis=0, keepdims=True) - mean * mean
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
