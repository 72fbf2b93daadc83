"""Run the reference code at /root/reference unmodified, without
pytorch_lightning / torch_geometric installed.

This module installs minimal stand-ins for the two missing libraries into
``sys.modules`` and puts /root/reference on ``sys.path`` so its modules
import under their own names (``models.magnet_cnn``, ``utils``, ...).

The stand-ins implement the PUBLIC API contracts the reference relies on
(PyG's MessagePassing argument-resolution rules, torch_cluster's
radius_graph/knn conventions, Lightning's LightningModule surface) using
torch-native ops (index_select, index_reduce_, F.instance_norm, cdist) —
an independent torch oracle, not a re-export of this repo's numpy/jax code.

PyG semantics replicated (torch_geometric 2.0, per reference
requirements.txt):
  * ``propagate(edge_index, **kw)`` with flow='source_to_target':
    edge_index[0] = source j, edge_index[1] = target i; ``foo_i``/``foo_j``
    message params index-select ``kw['foo']`` along ``node_dim``; plain
    names pass through unchanged.
  * ``update(agg, ...)``'s extra params resolve from the ORIGINAL
    propagate kwargs — NOT the message output.  For the reference
    InteractionNetwork this means the edge output returned by propagate is
    the *untransformed* input e_features, so forward's residual add
    doubles the edge features each step (the 2^k scaling quirk this repo
    replicates, magnet_tpu/nn/graphnet.py).
  * aggr='mean' divides by per-target counts clamped to >= 1.
  * InstanceNorm(x, batch) == torch.nn.functional.instance_norm applied
    per graph segment (PyG's documented equivalence; affine=False,
    track_running_stats=False defaults).
  * radius_graph / knn: brute-force cdist with torch_cluster's index
    conventions (radius_graph caps neighbors per target — tests keep
    degrees below the cap so selection order never matters; knn returns
    (2, Ny*k) with row0 = query/y indices, row1 = source/x indices).
"""
from __future__ import annotations

import importlib
import inspect
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _build_pl(torch):
    pl = types.ModuleType("pytorch_lightning")

    class LightningModule(torch.nn.Module):
        def save_hyperparameters(self, *a, **k):
            pass

        def log(self, name, value, **k):
            # record logged scalars so tests can read e.g. val_mae_loss
            if not hasattr(self, "_logged"):
                self._logged = {}
            self._logged[name] = (
                float(value.detach()) if hasattr(value, "detach") else value
            )

        @property
        def device(self):
            try:
                return next(self.parameters()).device
            except StopIteration:
                return torch.device("cpu")

    pl.LightningModule = LightningModule
    util = types.ModuleType("pytorch_lightning.utilities")

    def rank_zero_only(fn):
        return fn

    rank_zero_only.rank = 0
    util.rank_zero_only = rank_zero_only
    pl.utilities = util
    return pl, util


def _build_pyg(torch):
    F = torch.nn.functional
    tg = types.ModuleType("torch_geometric")
    tg_nn = types.ModuleType("torch_geometric.nn")
    tg_data = types.ModuleType("torch_geometric.data")

    def _scatter_mean(src, index, dim, dim_size):
        shape = list(src.shape)
        shape[dim] = dim_size
        out = torch.zeros(shape, dtype=src.dtype, device=src.device)
        out.index_add_(dim, index, src)
        cnt = torch.zeros(dim_size, dtype=src.dtype, device=src.device)
        cnt.index_add_(0, index, torch.ones_like(index, dtype=src.dtype))
        cnt = cnt.clamp(min=1)
        view = [1] * src.dim()
        view[dim] = dim_size
        return out / cnt.view(view)

    class MessagePassing(torch.nn.Module):
        def __init__(self, aggr="add", node_dim=-2, flow="source_to_target",
                     **kwargs):
            super().__init__()
            self.aggr = aggr
            self.node_dim = node_dim
            assert flow == "source_to_target"

        def _dim(self, t):
            return t.dim() + self.node_dim if self.node_dim < 0 else self.node_dim

        def propagate(self, edge_index, **kwargs):
            j, i = edge_index[0], edge_index[1]

            def resolve(name):
                if name == "edge_index":
                    return edge_index
                if name.endswith("_i") or name.endswith("_j"):
                    base = name[:-2]
                    idx = i if name.endswith("_i") else j
                    val = kwargs[base]
                    return val.index_select(self._dim(val), idx)
                return kwargs[name]

            msg_params = list(inspect.signature(self.message).parameters)
            msgs = self.message(**{p: resolve(p) for p in msg_params})

            ref = kwargs["x"]
            dim = self._dim(ref)
            n = ref.shape[dim]
            assert self.aggr == "mean", self.aggr
            agg = _scatter_mean(msgs, i, self._dim(msgs), n)

            upd = getattr(type(self), "update", None)
            if upd is None or upd is MessagePassing.update:
                return agg
            upd_params = list(inspect.signature(self.update).parameters)
            return self.update(agg, **{p: resolve(p) for p in upd_params[1:]})

        def update(self, inputs):  # default: identity (overridden or skipped)
            return inputs

        def message(self, x_j):  # default PyG message
            return x_j

    class InstanceNorm(torch.nn.Module):
        def __init__(self, in_channels, eps=1e-5, **kwargs):
            super().__init__()
            self.eps = eps

        def forward(self, x, batch):
            out = torch.empty_like(x)
            for g in batch.unique():
                m = batch == g
                seg = x[m]  # (n, C) -> instance_norm over n per channel
                out[m] = F.instance_norm(
                    seg.t().unsqueeze(0), eps=self.eps
                ).squeeze(0).t()
            return out

    def radius_graph(x, r, batch=None, loop=False, max_num_neighbors=32,
                     flow="source_to_target"):
        if x.dim() == 1:
            x = x.unsqueeze(-1)
        n = x.shape[0]
        d = torch.cdist(x.double(), x.double())
        adj = d <= float(r)
        if batch is not None:
            adj &= batch.view(-1, 1) == batch.view(1, -1)
        if not loop:
            adj.fill_diagonal_(False)
        deg = adj.sum(1)
        if int(deg.max()) <= max_num_neighbors:
            # cap never binds -> vectorized (row-major nonzero groups by
            # target, same as the loop; edge order within a target is
            # irrelevant to mean aggregation)
            dst, src = adj.nonzero(as_tuple=True)
            return torch.stack([src, dst])
        srcs, dsts = [], []
        for i in range(n):
            js = adj[i].nonzero(as_tuple=True)[0][:max_num_neighbors]
            srcs.append(js)
            dsts.append(torch.full_like(js, i))
        return torch.stack([torch.cat(srcs), torch.cat(dsts)])

    def knn(x, y, k, batch_x=None, batch_y=None):
        d = torch.cdist(y.double(), x.double())
        if batch_x is not None:
            d = d + torch.where(
                batch_y.view(-1, 1) == batch_x.view(1, -1), 0.0, float("inf")
            )
        k = min(k, x.shape[0])
        idx = d.topk(k, largest=False).indices  # (Ny, k), nearest first
        row = torch.arange(y.shape[0]).repeat_interleave(k)
        return torch.stack([row, idx.reshape(-1)])

    class Data:
        def __init__(self, **kwargs):
            for key, val in kwargs.items():
                setattr(self, key, val)

    tg_nn.MessagePassing = MessagePassing
    tg_nn.InstanceNorm = InstanceNorm
    tg_nn.radius_graph = radius_graph
    tg_nn.knn = knn
    tg_data.Data = Data
    tg.nn = tg_nn
    tg.data = tg_data
    return tg, tg_nn, tg_data


_installed = False


def install():
    """Install the stubs and the reference root; idempotent."""
    global _installed
    if _installed:
        return
    import torch

    pl, pl_util = _build_pl(torch)
    tg, tg_nn, tg_data = _build_pyg(torch)
    sys.modules.setdefault("pytorch_lightning", pl)
    sys.modules.setdefault("pytorch_lightning.utilities", pl_util)
    sys.modules.setdefault("torch_geometric", tg)
    sys.modules.setdefault("torch_geometric.nn", tg_nn)
    sys.modules.setdefault("torch_geometric.data", tg_data)
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _installed = True


def load(module_name: str):
    """Import a reference module (e.g. 'models.magnet_cnn') with stubs up."""
    install()
    return importlib.import_module(module_name)
