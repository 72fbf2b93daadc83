"""Edge-partitioned graph parallelism over the ``graph`` mesh axis.

The spatial analog of sequence parallelism for mesh graphs (SURVEY.md §5):
nodes are block-partitioned across chips; every edge lives on the shard of
its RECEIVER, so aggregation is purely local; sender features that live on
other shards are obtained by an all-gather of node features over ICI each
message-passing step.  This slots exactly where ``propagate`` sits in the
reference call stack (reference magnet_cnn.py:359-360) and scales the mesh
dimension the reference caps at a single GPU (256² nodes,
SURVEY.md §2.3).

Host side: :func:`partition_graph` produces per-shard fixed-shape edge
buffers (global senders, LOCAL receivers, per-shard recv tables).
Device side: :func:`partitioned_processor` runs the InteractionNetwork
stack under ``shard_map`` with specs (dp, graph) — batch over dp, nodes and
edges over graph; parameters replicated.

Communication per mp step: one tiled all_gather of (N/G, C) node blocks —
the upper bound of a halo exchange; a ppermute halo-overlap variant is the
planned optimization once profiling justifies it.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from magnet_tpu.utils import round_up


@dataclasses.dataclass
class ShardedGraph:
    """Per-shard fixed-shape graph buffers, stacked over shards (axis 0).

    senders:        (G, E_s) int32 — GLOBAL node index of each edge source.
    receivers_loc:  (G, E_s) int32 — LOCAL (within-shard) receiver index.
    edge_mask:      (G, E_s) float32.
    recv_edge_ids:  (G, N_s, K) int32 — local edge ids per local node.
    n_node_pad:     int — padded global node count (G * N_s).
    n_node:         int — true node count.
    """

    senders: np.ndarray
    receivers_loc: np.ndarray
    edge_mask: np.ndarray
    recv_edge_ids: np.ndarray
    n_node_pad: int
    n_node: int

    @property
    def n_shards(self) -> int:
        return self.senders.shape[0]


def partition_graph(
    senders: np.ndarray,
    receivers: np.ndarray,
    n_node: int,
    n_shards: int,
    e_shard: int | None = None,
    k_max: int | None = None,
) -> ShardedGraph:
    """Partition an edge list by receiver block.  Nodes are padded to a
    multiple of n_shards; contiguous blocks per shard."""
    n_pad = round_up(n_node, n_shards)
    ns = n_pad // n_shards
    shard_of = receivers // ns

    per_s, per_r, per_m = [], [], []
    for g in range(n_shards):
        sel = np.nonzero(shard_of == g)[0]
        per_s.append(senders[sel])
        per_r.append(receivers[sel] - g * ns)
        per_m.append(np.ones(len(sel), np.float32))
    if e_shard is None:
        e_shard = max(1, max(len(s) for s in per_s))
    if k_max is None:
        k_req = 1
        for g in range(n_shards):
            if len(per_r[g]):
                k_req = max(k_req, int(np.bincount(per_r[g]).max()))
        k_max = k_req

    S = np.zeros((n_shards, e_shard), np.int32)
    R = np.zeros((n_shards, e_shard), np.int32)
    M = np.zeros((n_shards, e_shard), np.float32)
    T = np.full((n_shards, ns, k_max), e_shard, np.int32)
    for g in range(n_shards):
        e = len(per_s[g])
        assert e <= e_shard
        S[g, :e] = per_s[g]
        R[g, :e] = per_r[g]
        M[g, :e] = 1.0
        slot = np.zeros(ns, np.int64)
        for eid in range(e):
            i = per_r[g][eid]
            T[g, i, slot[i]] = eid
            slot[i] += 1
    return ShardedGraph(S, R, M, T, n_pad, n_node)


def _in_step(x_full, e, senders, recv_loc, mask, table, apply_one, params_i):
    """One InteractionNetwork step on one shard: x_full (N, C) gathered,
    e (E_s, C) local edge latents.  Returns (x_local_new, e_new)."""
    return apply_one(params_i, x_full, e, senders, recv_loc, mask, table)


def make_partitioned_processor(
    interaction_apply,
    num_steps: int,
    mesh: Mesh,
):
    """Build a dp×graph-sharded processor.

    Args:
      interaction_apply: fn(params_i, x_full (N,C), e (E,C), senders,
        recv_loc, mask, table) -> (x_local_new (Ns,C), e_new (E,C)) — one
        InteractionNetwork step evaluated for ONE shard of ONE sample.
      num_steps: number of stacked InteractionNetworks.
      mesh: Mesh with ('dp', 'graph') axes.

    Returns fn(params_list, x (B, N_pad, C), e (B, G, E_s, C), sg arrays...)
    -> x (B, N_pad, C) with x sharded P('dp', 'graph') over (B, N_pad).
    """

    def run(params_list, x, e, senders, recv_loc, mask, table):
        # shapes inside shard_map (per device):
        #   x: (b, ns, C); e: (b, 1, E_s, C); senders/...: (b, 1, E_s)
        def body(params_list, x, e, senders, recv_loc, mask, table):
            e = e[:, 0]
            senders = senders[:, 0]
            recv_loc = recv_loc[:, 0]
            mask = mask[:, 0]
            table = table[:, 0]
            for step in range(num_steps):
                x_full = jax.lax.all_gather(
                    x, "graph", axis=1, tiled=True
                )                                              # (b, N_pad, C)
                x_new, e = jax.vmap(
                    partial(interaction_apply, params_list[step])
                )(x_full, e, senders, recv_loc, mask, table)
                x = x_new
            return x, e[:, None]

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(
                P(),                       # params replicated
                P("dp", "graph"),          # x: (B, N_pad, C)
                P("dp", "graph"),          # e: (B, G, E_s, C)
                P("dp", "graph"),
                P("dp", "graph"),
                P("dp", "graph"),
                P("dp", "graph"),
            ),
            out_specs=(P("dp", "graph"), P("dp", "graph")),
        )(params_list, x, e, senders, recv_loc, mask, table)

    return run


def interaction_step_local(module, params, x_full, e, senders, recv_loc,
                           mask, table):
    """One InteractionNetwork step for one shard, matching
    magnet_tpu.nn.graphnet.InteractionNetwork math (incl. the e+e edge
    residual quirk) but with global sender gathers and local aggregation.

    module: an InteractionNetwork flax module instance (unbound), params its
    variables.  x_full: (N_pad, C); local receivers own rows
    x_full[g*ns:(g+1)*ns] — the caller arranges that recv table/receivers
    are local while senders index x_full globally.
    """
    from magnet_tpu.ops.segment import aggregate_mean

    ns = table.shape[0]
    # local node block: recover from the gathered full array using the
    # shard's position — receivers_loc are local, so local x rows are the
    # ones this shard owns.  We pass them via closure-free recompute:
    idx = jax.lax.axis_index("graph")
    x_local = jax.lax.dynamic_slice_in_dim(x_full, idx * ns, ns, axis=0)

    x_i = jnp.take(x_full, recv_loc + idx * ns, axis=0)
    x_j = jnp.take(x_full, senders, axis=0)
    msg_in = jnp.concatenate([x_i, x_j, e], axis=-1)
    msg = module.apply(params, msg_in, method="edge_mlp")
    agg = aggregate_mean(msg, table, mask)
    upd_in = jnp.concatenate([agg, x_local], axis=-1)
    upd = module.apply(params, upd_in, method="node_mlp")
    return x_local + upd, e + e
