"""Shared model-layer plumbing: batched graph pytree, vmap helpers, losses.

One GraphNet library + one rollout engine serve all model families
(SURVEY.md §7.1 item 4), instead of the reference's per-model copies.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from magnet_tpu.ops import graph as hostgraph


class Graph(NamedTuple):
    """Batched fixed-shape graph (leading batch dim on every field).

    senders/receivers: (B, E) int32; edge_mask: (B, E) f32;
    recv_edge_ids: (B, N, K) int32 (padded slots == E).
    """

    senders: jnp.ndarray
    receivers: jnp.ndarray
    edge_mask: jnp.ndarray
    recv_edge_ids: jnp.ndarray

    @staticmethod
    def from_padded(g: hostgraph.PaddedGraph) -> "Graph":
        return Graph(
            jnp.asarray(g.senders),
            jnp.asarray(g.receivers),
            jnp.asarray(g.edge_mask),
            jnp.asarray(g.recv_edge_ids),
        )


def batch_vmap(module_cls, in_axes, **module_kwargs):
    """Lift a per-sample flax module over the batch axis with shared params."""
    return fnn.vmap(
        module_cls,
        in_axes=in_axes,
        out_axes=0,
        variable_axes={"params": None},
        split_rngs={"params": False},
    )(**module_kwargs)


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def smooth_l1_loss(pred, target, beta: float = 1.0):
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


LOSSES = {"l1": l1_loss, "l2": l2_loss, "smooth_l1": smooth_l1_loss}


def nrmse(pred, target, eps: float = 1e-12):
    """Normalized RMSE over the full tensor (eval metric for E1/B1 parity)."""
    num = jnp.sqrt(jnp.mean((pred - target) ** 2))
    den = jnp.sqrt(jnp.mean(target**2))
    return num / (den + eps)


def build_radius_graph_batch(
    coords: np.ndarray,
    radius: float,
    loop: bool,
    e_pad: int | None = None,
    k_max: int | None = None,
    max_num_neighbors: int = 32,
) -> Graph:
    """Host-side: build per-sample radius graphs for a batch of coordinate
    sets (B, N, P) and stack into a batched :class:`Graph`.

    If e_pad/k_max are None they are sized to the batch max and bucketed to
    bound recompilation.
    """
    coords = np.asarray(coords)
    bsz = coords.shape[0]
    raw = [
        hostgraph.radius_graph_np(
            coords[b], radius, loop=loop, max_num_neighbors=max_num_neighbors
        )
        for b in range(bsz)
    ]
    if e_pad is None:
        e_pad = hostgraph.bucket_e_pad(max(len(s) for s, _ in raw))
    if k_max is None:
        k_max = max(
            (int(np.bincount(t, minlength=coords.shape[1]).max()) if len(t) else 1)
            for _, t in raw
        )
        k_max = min(max(k_max, 1), max_num_neighbors)
    padded = [
        hostgraph.pad_graph(s, t, coords.shape[1], e_pad=e_pad, k_max=k_max)
        for s, t in raw
    ]
    stacked = hostgraph.stack_graphs(padded)
    return Graph(
        jnp.asarray(stacked.senders),
        jnp.asarray(stacked.receivers),
        jnp.asarray(stacked.edge_mask),
        jnp.asarray(stacked.recv_edge_ids),
    )


def time_windows(t: jnp.ndarray, n_windows: int, slice_len: int) -> jnp.ndarray:
    """Stack overlapping t windows: (B, nt) -> (B, n, 2*slice_len) where
    window i covers [i*ts, (i+2)*ts) (reference magnet_cnn.py:412)."""
    idx = (
        np.arange(n_windows)[:, None] * slice_len + np.arange(2 * slice_len)[None, :]
    )
    return t[:, idx]  # (B, n, 2ts)
