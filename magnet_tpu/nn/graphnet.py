"""GraphNet Encoder / InteractionNetwork / Processor / Decoder.

The reference duplicates these verbatim across three model files
(magnet_cnn.py:13-140 ≡ magnet_cnn_2d.py:13-140 ≈ magnet_gnn.py:11-137);
here they live once.  Message passing is realized as gather -> edge MLP ->
gather-table masked-mean (see magnet_tpu/ops/segment.py) instead of
torch_geometric scatter kernels.

PyG semantics quirk replicated deliberately: ``InteractionNetwork.update``
receives the *original* edge features (PyG collects update args before
``message`` runs), so each layer returns ``e_in + e_in`` — edge features
double every step while the freshly computed edge messages are only used for
node aggregation (reference magnet_cnn.py:73-93).  We reproduce this exactly
for parity.

All modules operate on a single graph sample; vmap over batch.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as fnn

from magnet_tpu.nn.core import MLP, LayerNorm
from magnet_tpu.ops.segment import aggregate_mean


class GraphEncoder(fnn.Module):
    """Independent node/edge embedders (reference magnet_cnn.py:13-44)."""

    node_out: int
    edge_out: int
    mlp_layers: int
    mlp_hidden: int

    @fnn.compact
    def __call__(self, node_feats, edge_feats):
        n = MLP([self.mlp_hidden] * self.mlp_layers, self.node_out)(node_feats)
        n = LayerNorm()(n)
        e = MLP([self.mlp_hidden] * self.mlp_layers, self.edge_out)(edge_feats)
        e = LayerNorm()(e)
        return n, e


class InteractionNetwork(fnn.Module):
    """One message-passing step (reference magnet_cnn.py:46-93).

    x: (N, C), e: (E, C); returns (x', e') with residuals.
    """

    node_out: int
    edge_out: int
    mlp_layers: int
    mlp_hidden: int

    @fnn.compact
    def __call__(self, x, e, senders, receivers, edge_mask, recv_edge_ids):
        x_i = jnp.take(x, receivers, axis=0)
        x_j = jnp.take(x, senders, axis=0)
        msg = jnp.concatenate([x_i, x_j, e], axis=-1)
        msg = MLP([self.mlp_hidden] * self.mlp_layers, self.edge_out)(msg)
        msg = LayerNorm()(msg)
        agg = aggregate_mean(msg, recv_edge_ids, edge_mask)      # (N, C)
        upd = jnp.concatenate([agg, x], axis=-1)
        upd = MLP([self.mlp_hidden] * self.mlp_layers, self.node_out)(upd)
        upd = LayerNorm()(upd)
        # residuals; the edge return is e + e (PyG update-arg quirk, see
        # module docstring) — NOT msg + e.
        return x + upd, e + e


class GraphProcessor(fnn.Module):
    """Stack of InteractionNetworks (reference magnet_cnn.py:95-120)."""

    latent_dim: int
    num_steps: int
    mlp_layers: int
    mlp_hidden: int

    @fnn.compact
    def __call__(self, x, e, senders, receivers, edge_mask, recv_edge_ids):
        for _ in range(self.num_steps):
            x, e = InteractionNetwork(
                node_out=self.latent_dim,
                edge_out=self.latent_dim,
                mlp_layers=self.mlp_layers,
                mlp_hidden=self.mlp_hidden,
            )(x, e, senders, receivers, edge_mask, recv_edge_ids)
        return x, e


class GraphDecoder(fnn.Module):
    """Node MLP head (reference magnet_cnn.py:122-140)."""

    node_out: int
    mlp_layers: int
    mlp_hidden: int

    @fnn.compact
    def __call__(self, x):
        return MLP([self.mlp_hidden] * self.mlp_layers, self.node_out)(x)
