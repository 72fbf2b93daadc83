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
from magnet_tpu.ops.segment import aggregate_mean_graph


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

    x: (N, C), e: (E, C); returns (x', e') with residuals.  The edge and
    node MLPs are exposed as methods so the edge-partitioned parallel
    processor (magnet_tpu/parallel/graph_partition.py) can drive them
    directly inside shard_map.
    """

    node_out: int
    edge_out: int
    mlp_layers: int
    mlp_hidden: int

    def setup(self):
        self.edge_fn = fnn.Sequential(
            [MLP([self.mlp_hidden] * self.mlp_layers, self.edge_out), LayerNorm()]
        )
        self.node_fn = fnn.Sequential(
            [MLP([self.mlp_hidden] * self.mlp_layers, self.node_out), LayerNorm()]
        )

    def edge_mlp(self, msg_in):
        return self.edge_fn(msg_in)

    def node_mlp(self, upd_in):
        return self.node_fn(upd_in)

    def __call__(self, x, e, gs):
        x_i = jnp.take(x, gs.receivers, axis=0)
        x_j = jnp.take(x, gs.senders, axis=0)
        msg = self.edge_fn(jnp.concatenate([x_i, x_j, e], axis=-1))
        agg = aggregate_mean_graph(msg, gs)                      # (N, C)
        upd = self.node_fn(jnp.concatenate([agg, x], axis=-1))
        # residuals; the edge return is e + e (PyG update-arg quirk, see
        # module docstring) — NOT msg + e.
        return x + upd, e + e


class _ProcStep(fnn.Module):
    latent_dim: int
    mlp_layers: int
    mlp_hidden: int

    @fnn.compact
    def __call__(self, carry, _):
        x, e, gs = carry
        x, e = InteractionNetwork(
            node_out=self.latent_dim,
            edge_out=self.latent_dim,
            mlp_layers=self.mlp_layers,
            mlp_hidden=self.mlp_hidden,
            name="step",
        )(x, e, gs)
        return (x, e, gs), None


class GraphProcessor(fnn.Module):
    """Stack of InteractionNetworks (reference magnet_cnn.py:95-120).

    Realized as a ``lax.scan`` over stacked per-step parameters
    (variable_axes={'params': 0}) — same math as the reference's
    ModuleList loop, but the trace/compile cost is one step instead of
    ``num_steps`` (the reference stacks up to 10, magnet_cnn.yaml)."""

    latent_dim: int
    num_steps: int
    mlp_layers: int
    mlp_hidden: int

    @fnn.compact
    def __call__(self, x, e, gs):
        scan = fnn.scan(
            _ProcStep,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.num_steps,
        )(self.latent_dim, self.mlp_layers, self.mlp_hidden, name="steps")
        (x, e, _), _ = scan((x, e, gs), None)
        return x, e


class GraphDecoder(fnn.Module):
    """Node MLP head (reference magnet_cnn.py:122-140)."""

    node_out: int
    mlp_layers: int
    mlp_hidden: int

    @fnn.compact
    def __call__(self, x):
        return MLP([self.mlp_hidden] * self.mlp_layers, self.node_out)(x)
