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
    """Batched fixed-shape graph (leading batch dim on every field; also
    used per-sample inside vmapped modules, where the batch dim is absent).

    Two interchangeable aggregation layouts (ops/graph.py):
      * table:   recv_edge_ids (B, N, K) gather table;
      * blocked: blk_recv_local (B, T, E_TILE) + degree (B, N, 1) — edges
        receiver-tile-packed; aggregation is a per-tile one-hot MXU matmul
        (Pallas kernel on TPU, ops/pallas_kernels.py).  E == T*E_TILE.

    senders/receivers are always the flat (B, E) GLOBAL edge list used for
    edge-feature gathers.  Unused layout fields are None.
    """

    senders: jnp.ndarray
    receivers: jnp.ndarray
    edge_mask: jnp.ndarray
    recv_edge_ids: jnp.ndarray | None = None
    blk_recv_local: jnp.ndarray | None = None
    degree: jnp.ndarray | None = None
    blk_snd_edge_ids: jnp.ndarray | None = None   # (B, T, E_TILE_S)
    blk_snd_local: jnp.ndarray | None = None      # (B, T, E_TILE_S)
    # sender-TILE layout for the in-kernel sender gather
    # (ops/pallas_kernels.py:fused_edge_tail_agg2)
    blk_snd2_tids: jnp.ndarray | None = None      # (B, T, nc, K) int32
    blk_snd2_local: jnp.ndarray | None = None     # (B, T, E_TILE) int32
    # flat live-chunk list for the ragged-grid kernel (fused2r): the grid
    # visits only these (tile, chunk) pairs — dead chunks never DMA.
    # flag: 1 = live, 0 = dead-but-included (zero-init of the tile's
    # output / d_z block only), 2 = batch-pad entry (no-op repeat).
    blk_chunk_ct: jnp.ndarray | None = None       # (B, NCL) int32 tile id
    blk_chunk_cc: jnp.ndarray | None = None       # (B, NCL) int32 chunk id
    blk_chunk_flag: jnp.ndarray | None = None     # (B, NCL) int32

    @staticmethod
    def from_padded(g: hostgraph.PaddedGraph) -> "Graph":
        return Graph(
            jnp.asarray(g.senders),
            jnp.asarray(g.receivers),
            jnp.asarray(g.edge_mask),
            jnp.asarray(g.recv_edge_ids),
        )

    @staticmethod
    def from_blocked(g: hostgraph.BlockedGraph) -> "Graph":
        return Graph(
            senders=jnp.asarray(g.senders.reshape(-1)),
            receivers=jnp.asarray(g.receivers),
            edge_mask=jnp.asarray(g.mask.reshape(-1)),
            blk_recv_local=jnp.asarray(g.recv_local),
            degree=jnp.asarray(g.degree),
            blk_snd_edge_ids=jnp.asarray(g.snd_edge_ids),
            blk_snd_local=jnp.asarray(g.snd_local),
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


def parse_dtype(name):
    """Model-config dtype knob -> flax module dtype.  None/f32 keep the
    default f32 path; 'bf16' engages the bf16-native fused kernels
    (ops/pallas_kernels.py: bf16 MXU operands, f32 accumulation)."""
    if name in (None, "none", "float32", "fp32"):
        return None
    if name in ("bf16", "bfloat16"):
        return jnp.bfloat16
    raise ValueError(f"unknown dtype {name!r} (use float32 or bf16)")


def nrmse(pred, target, eps: float = 1e-12):
    """Normalized RMSE over the full tensor (eval metric for E1/B1 parity)."""
    num = jnp.sqrt(jnp.mean((pred - target) ** 2))
    den = jnp.sqrt(jnp.mean(target**2))
    return num / (den + eps)


class HRPointsTarget:
    """rollout_target for the MAgNet families: predict()'s primary output
    is the HR-node rollout; the ground truth is ``hr_points`` shifted by
    ``time_slice`` (the reference validation_step target slicing,
    magnet_cnn.py:438-467, magnet_gnn.py:441-475).  The eval harness
    consumes this instead of keying on model names."""

    def rollout_target(self, batch, horizon: int):
        ts = self.time_slice
        return jnp.asarray(batch["hr_points"])[:, ts : ts + horizon]


_E_TILE_CACHE: dict = {}
_GRAPH_CACHE: dict = {}
_GRAPH_CACHE_MAX = 8


def build_radius_graph_batch(
    coords: np.ndarray,
    radius: float,
    loop: bool,
    max_num_neighbors: int = 32,
    tile_n: int = 128,
) -> Graph:
    """Host-side: build per-sample radius graphs for a batch of coordinate
    sets (B, N, P), pack into the blocked layout, stack into a batched
    :class:`Graph`.  Per-tile bucket sizes are batch-maxed and rounded to
    128 to bound recompilation.
    """
    import hashlib

    coords = np.asarray(coords)
    bsz, n_node = coords.shape[:2]
    # identical coordinate batches (regular grids, fixed meshes) rebuild the
    # same graph every step — cache the finished device Graph
    digest = hashlib.blake2b(
        np.ascontiguousarray(coords).tobytes(), digest_size=16
    ).hexdigest()
    ckey = (digest, round(float(radius), 9), bool(loop), max_num_neighbors,
            tile_n)
    if ckey in _GRAPH_CACHE:
        return _GRAPH_CACHE[ckey]
    raw = [
        hostgraph.radius_graph_np(
            coords[b], radius, loop=loop, max_num_neighbors=max_num_neighbors
        )
        for b in range(bsz)
    ]
    # shared e_tile across the batch (static shape), STICKY across batches:
    # per-batch maxima vary slightly between batches of irregular meshes,
    # which would retrigger jit each batch — remember the largest bucket
    # seen for this (n_node, radius, loop, tile_n) workload and reuse it.
    n_pad = ((n_node + tile_n - 1) // tile_n) * tile_n
    e_tile = 128
    for s, t in raw:
        if len(t):
            counts = np.bincount(t // tile_n, minlength=n_pad // tile_n)
            e_tile = max(e_tile, ((int(counts.max()) + 127) // 128) * 128)
    e_tile = hostgraph._chunkable_e_tile(e_tile)
    key = (n_node, round(float(radius), 9), bool(loop), tile_n)
    e_tile = max(e_tile, _E_TILE_CACHE.get(key, 0))
    _E_TILE_CACHE[key] = e_tile
    # sender-side bucket: batch max, sticky, x128
    e_tile_s = 128
    for s, t in raw:
        if len(s):
            counts = np.bincount(s // tile_n, minlength=n_pad // tile_n)
            e_tile_s = max(e_tile_s, ((int(counts.max()) + 127) // 128) * 128)
    e_tile_s = hostgraph._chunkable_e_tile(e_tile_s)
    skey = key + ("snd",)
    e_tile_s = max(e_tile_s, _E_TILE_CACHE.get(skey, 0))
    _E_TILE_CACHE[skey] = e_tile_s
    # extreme out-degree skew (torch_cluster's lowest-index neighbor cap on
    # regular grids) makes transpose buckets mostly padding — skip them and
    # let gather VJPs fall back to plain take
    build_snd = e_tile_s <= max(4 * e_tile, 4096)
    blocked = [
        hostgraph.block_graph(
            s, t, n_node, tile_n=tile_n, e_tile=e_tile, e_tile_s=e_tile_s,
            build_snd=build_snd,
        )
        for s, t in raw
    ]
    has_snd = all(g.snd_edge_ids is not None for g in blocked)
    out = Graph(
        senders=jnp.asarray(np.stack([g.senders.reshape(-1) for g in blocked])),
        receivers=jnp.asarray(np.stack([g.receivers for g in blocked])),
        edge_mask=jnp.asarray(np.stack([g.mask.reshape(-1) for g in blocked])),
        blk_recv_local=jnp.asarray(np.stack([g.recv_local for g in blocked])),
        degree=jnp.asarray(np.stack([g.degree for g in blocked])),
        blk_snd_edge_ids=(
            jnp.asarray(np.stack([g.snd_edge_ids for g in blocked]))
            if has_snd else None
        ),
        blk_snd_local=(
            jnp.asarray(np.stack([g.snd_local for g in blocked]))
            if has_snd else None
        ),
        **_snd2_fields(blocked, key),
    )
    if len(_GRAPH_CACHE) >= _GRAPH_CACHE_MAX:
        _GRAPH_CACHE.pop(next(iter(_GRAPH_CACHE)))
    _GRAPH_CACHE[ckey] = out
    return out


def _snd2_fields(blocked, key):
    """Batch the sender-tile layout (in-kernel sender gather); K is the
    sticky batch max so the compiled kernel is stable across batches.
    The transpose layout (snd_edge_ids) is NOT required: without it the
    fused2 backward must use the in-kernel d_pxj accumulator
    (graphnet._fused2_mode enforces that pairing), which is exactly the
    large-mesh case — extreme out-degree skew kills the transpose
    blocking (256² regular grids) while the snd2 chunk spread stays ≤K."""
    if not all(g.snd2_tids is not None for g in blocked):
        return {}
    kmax = max(g.snd2_k for g in blocked)
    rkey = key + ("snd2",)
    kmax = max(kmax, _E_TILE_CACHE.get(rkey, 0))
    _E_TILE_CACHE[rkey] = kmax

    def padk(t):
        return np.pad(t, ((0, 0), (0, 0), (0, kmax - t.shape[2])),
                      constant_values=-1)

    # flat live-chunk lists (ragged-grid kernel); NCL is the sticky batch
    # max, padded with flag=2 repeats of the last entry (no-op: same tile
    # as the preceding entry, so output-block revisiting stays consecutive)
    lists = [_chunk_list(g.snd2_tids) for g in blocked]
    ncl = max(len(ct) for ct, _, _ in lists)
    lkey = key + ("snd2_ncl",)
    ncl = max(ncl, _E_TILE_CACHE.get(lkey, 0))
    _E_TILE_CACHE[lkey] = ncl

    def padl(a, fill_last):
        pad = ncl - len(a)
        tail = np.full(pad, a[-1] if fill_last else 2, a.dtype)
        return np.concatenate([a, tail])

    return dict(
        blk_snd2_tids=jnp.asarray(
            np.stack([padk(g.snd2_tids) for g in blocked])),
        blk_snd2_local=jnp.asarray(
            np.stack([g.snd2_local for g in blocked])),
        blk_chunk_ct=jnp.asarray(
            np.stack([padl(ct, True) for ct, _, _ in lists])),
        blk_chunk_cc=jnp.asarray(
            np.stack([padl(cc, True) for _, cc, _ in lists])),
        blk_chunk_flag=jnp.asarray(
            np.stack([padl(fl, False) for _, _, fl in lists])),
    )


def _chunk_list(tids: np.ndarray):
    """Flat (tile, chunk) visit list from the sender-tile metadata:
    every live chunk (tids[t,c,0] >= 0), plus chunk 0 of every tile so
    each tile's output block gets zero-initialized exactly once."""
    T, nc, _ = tids.shape
    live = tids[:, :, 0] >= 0
    ct, cc, fl = [], [], []
    for t in range(T):
        for c in range(nc):
            if c == 0 or live[t, c]:
                ct.append(t)
                cc.append(c)
                fl.append(1 if live[t, c] else 0)
    return (np.asarray(ct, np.int32), np.asarray(cc, np.int32),
            np.asarray(fl, np.int32))


def time_windows(t: jnp.ndarray, n_windows: int, slice_len: int) -> jnp.ndarray:
    """Stack overlapping t windows: (B, nt) -> (B, n, 2*slice_len) where
    window i covers [i*ts, (i+2)*ts) (reference magnet_cnn.py:412)."""
    idx = (
        np.arange(n_windows)[:, None] * slice_len + np.arange(2 * slice_len)[None, :]
    )
    return t[:, idx]  # (B, n, 2ts)
