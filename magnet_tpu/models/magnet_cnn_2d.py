"""MAgNet[CNN] 2D (reference models/magnet_cnn_2d.py).

Same architecture as the 1D flagship with a 2D EDSR encoder and the
four-corner INR decoder (including the diagonal area swap,
magnet_cnn_2d.py:286-287).  Graph over the W*W grid nodes ∪ N query nodes,
built once per batch on the host.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from magnet_tpu.models.common import (
    Graph,
    HRPointsTarget,
    LOSSES,
    batch_vmap,
    build_radius_graph_batch,
    l1_loss,
    parse_dtype,
    time_windows,
)
from magnet_tpu.nn.core import MLP
from magnet_tpu.nn.edsr import EDSR
from magnet_tpu.nn.graphnet import GraphDecoder, GraphEncoder, GraphProcessor
from magnet_tpu.nn.inr import INRDecoder2D
from magnet_tpu.models.partitioned_mixin import PartitionedGraphMixin
from magnet_tpu.ops.interp import interpolate_bilinear_2d
from magnet_tpu.utils import make_coord, make_coord_np


class MAgNetCNN2DCore(fnn.Module):
    time_slice: int = 16
    latent_dim: int = 32
    num_message_passing_steps: int = 10
    mlp_layers: int = 4
    mlp_hidden: int = 64
    n_chan: int = 128
    kernel_size: int = 3
    res_scale: float = 1.0
    res_layers: int = 16

    remat: bool = False
    graph_dtype: Any = None  # GraphNet-stage dtype (see magnet_cnn_1d.py)

    def setup(self):
        self.encoder = EDSR(
            n_chan=self.n_chan, res_layers=self.res_layers,
            kernel_size=self.kernel_size, res_scale=self.res_scale, ndim=2,
        )
        self.continuous_decoder = batch_vmap(
            INRDecoder2D, in_axes=(0, 0, 0, 0, 0),
            n_chan=self.n_chan, mlp_layers=self.mlp_layers,
            mlp_hidden=self.mlp_hidden,
        )
        self.projector = MLP([self.mlp_hidden] * self.mlp_layers, 1)
        self._encoder = batch_vmap(
            GraphEncoder, in_axes=(0, 0),
            node_out=self.latent_dim, edge_out=self.latent_dim,
            mlp_layers=self.mlp_layers, mlp_hidden=self.mlp_hidden,
            dtype=self.graph_dtype,
        )
        self._processor = batch_vmap(
            GraphProcessor, in_axes=(0, 0, 0),
            latent_dim=self.latent_dim,
            num_steps=self.num_message_passing_steps, remat=self.remat,
            mlp_layers=self.mlp_layers, mlp_hidden=self.mlp_hidden,
            dtype=self.graph_dtype,
        )
        self._decoder = batch_vmap(
            GraphDecoder, in_axes=(0,),
            node_out=self.time_slice, mlp_layers=self.mlp_layers,
            mlp_hidden=self.mlp_hidden, dtype=self.graph_dtype,
        )

    def graph_pre(self, x_t, coords, cell, t):
        """EDSR + INR + projector + node/edge feature assembly (2D)."""
        B, T, C, W, _ = x_t.shape
        N = coords.shape[1]
        WW = W * W
        xx = x_t.reshape(B, T * C, W, W).transpose(0, 2, 3, 1)     # (B, W, W, TC)
        feat = self.encoder(xx)                                    # (B, W, W, Cf)
        feat_cl = feat.transpose(0, 3, 1, 2)                       # (B, Cf, W, W)
        z = self.continuous_decoder(x_t, feat_cl, cell, coords, t)  # (B, N, T, nc)
        hr_points = self.projector(z)                              # (B, N, T, 1)

        hr_flat = hr_points.reshape(B, N, T * C)
        lr_flat = x_t.transpose(0, 3, 4, 1, 2).reshape(B, WW, T * C)
        lr_coords = jnp.broadcast_to(make_coord([W, W])[None], (B, WW, 2))
        all_coords = jnp.concatenate([lr_coords, coords], axis=1)  # (B, WW+N, 2)
        all_feats = jnp.concatenate([lr_flat, hr_flat], axis=1)

        t_last = t[:, T - 1 : T]
        node_feats = jnp.concatenate(
            [
                all_feats,
                all_coords,
                jnp.broadcast_to(t_last[:, None, :], (B, WW + N, 1)),
            ],
            axis=-1,
        )                                                          # (B, WW+N, T+3)
        return node_feats, hr_points, all_feats, all_coords

    @staticmethod
    def edge_features(all_feats, all_coords, senders, receivers):
        def ef(u, x, s, r):
            du = jnp.take(u, s, axis=0) - jnp.take(u, r, axis=0)
            dx = jnp.take(x, s, axis=0) - jnp.take(x, r, axis=0)
            return jnp.concatenate([du, dx], axis=-1)

        return jax.vmap(ef)(all_feats, all_coords, senders, receivers)

    def graph_encode(self, node_feats, edge_feats):
        return self._encoder(node_feats, edge_feats)

    def graph_decode(self, nf):
        return self._decoder(nf)

    @staticmethod
    def assemble_outputs(ret, x_t, hr_points, hr_last, t):
        B, T, C, W, _ = x_t.shape
        WW = W * W
        T_out = t.shape[-1] - T
        last_values = jnp.concatenate(
            [x_t[:, -1].transpose(0, 2, 3, 1).reshape(B, WW, C), hr_last],
            axis=1,
        )                                                          # (B, WW+N, 1)
        dt = t[:, T:] - t[:, T - 1 : T]                            # (B, T_out)
        outputs = (
            last_values[:, None]
            + dt[:, :, None, None] * ret.transpose(0, 2, 1)[..., None]
        )                                                          # (B, T_out, WW+N, 1)
        out_lr = outputs[:, :, :WW].transpose(0, 1, 3, 2).reshape(
            B, T_out, C, W, W
        )
        out_hr = outputs[:, :, WW:]
        return out_hr, out_lr, hr_points.transpose(0, 2, 1, 3)

    def __call__(self, x_t, coords, cell, t, hr_last, graph: Graph):
        """
        Args:
          x_t: (B, T, C, W, W) LR frames; coords/cell: (B, N, 2);
          t: (B, 2T); hr_last: (B, N, 1).
        Returns (out_hr (B,T,N,1), out_lr (B,T,C,W,W), hr_points (B,T,N,1)).
        """
        node_feats, hr_points, all_feats, all_coords = self.graph_pre(
            x_t, coords, cell, t
        )
        edge_feats = self.edge_features(
            all_feats, all_coords, graph.senders, graph.receivers
        )
        nf, ef = self.graph_encode(node_feats, edge_feats)
        nf, _ = self._processor(nf, ef, graph)
        ret = self.graph_decode(nf)                                # (B, WW+N, T_out)
        return self.assemble_outputs(ret, x_t, hr_points, hr_last, t)


class MAgNetCNN2D(PartitionedGraphMixin, HRPointsTarget):
    """Task wrapper.  Batch (DatasetImplicit2D): t (B, nt),
    lr_frames (B, nt, 1, W, W), hr_points (B, nt, N, 1), coords (B, N, 2),
    cells (B, N, 2)."""

    name = "magnet_cnn_2d"
    is_2d = True

    def __init__(self, hparams: dict[str, Any]):
        self.hp = dict(hparams)
        self.time_slice = int(self.hp.get("time_slice", 16))
        self.radius = float(self.hp.get("radius", 0.1))
        self.teacher_forcing = bool(self.hp.get("teacher_forcing", True))
        self.criterion = LOSSES[self.hp.get("loss", "l1")]
        self.core = MAgNetCNN2DCore(
            time_slice=self.time_slice,
            latent_dim=int(self.hp.get("latent_dim", 32)),
            num_message_passing_steps=int(self.hp.get("num_message_passing_steps", 10)),
            mlp_layers=int(self.hp.get("mlp_layers", 4)),
            mlp_hidden=int(self.hp.get("mlp_hidden", 64)),
            n_chan=int(self.hp.get("n_chan", 128)),
            kernel_size=int(self.hp.get("kernel_size", 3)),
            res_scale=float(self.hp.get("res_scale", 1.0)),
            res_layers=int(self.hp.get("res_layers", 16)),
            remat=bool(self.hp.get("remat", False)),
            graph_dtype=parse_dtype(self.hp.get("graph_dtype")),
        )

    # ---------- graph-parallel hooks (PartitionedGraphMixin) -------------
    def _pp_lr_coords(self, batch):
        W = batch["lr_frames"].shape[-1]
        return make_coord_np([W, W])

    def _pp_feedback(self, out_lr):
        return out_lr

    def _pp_val_feedback(self, batch, out_hr):
        B, T, N = out_hr.shape[:3]
        W = batch["lr_frames"].shape[-1]
        w_in = int(round(np.sqrt(N)))
        sig = out_hr[..., 0].reshape(B, T, w_in, w_in)
        return interpolate_bilinear_2d(sig, (W, W))[:, :, None]

    def _pp_lr_nodes(self, lr_hat):
        b, tt, c = lr_hat.shape[:3]
        return lr_hat.reshape(b, tt, c, -1).transpose(0, 1, 3, 2)

    def _pp_u_nodes(self, u, ts, used):
        b, _, c = u.shape[:3]
        return u[:, ts:used].reshape(b, used - ts, c, -1).transpose(0, 1, 3, 2)

    def build_graph(self, batch) -> Graph:
        coords = np.asarray(batch["coords"])                       # (B, N, 2)
        W = batch["lr_frames"].shape[-1]
        lr = make_coord_np([W, W])
        allc = np.concatenate(
            [np.broadcast_to(lr[None], (coords.shape[0],) + lr.shape), coords],
            axis=1,
        )
        return build_radius_graph_batch(allc, self.radius, loop=True)

    def init(self, rng, batch, graph: Graph):
        ts = self.time_slice
        return self.core.init(
            rng,
            batch["lr_frames"][:, :ts],
            batch["coords"],
            batch["cells"],
            batch["t"][:, : 2 * ts],
            batch["hr_points"][:, ts - 1],
            graph,
        )

    def _rollout(self, params, batch, graph: Graph, teacher_forcing: bool,
                 val_feedback: bool):
        ts = self.time_slice
        u = batch["lr_frames"]                                     # (B, nt, C, W, W)
        uv = batch["hr_points"]
        t = batch["t"]
        B, nt, C, W, _ = u.shape
        n_win = (nt - ts) // ts

        u_win = u[:, : (n_win + 1) * ts].reshape(B, n_win + 1, ts, C, W, W)
        uv_win = uv[:, : (n_win + 1) * ts].reshape(B, n_win + 1, ts, *uv.shape[2:])
        t_win = time_windows(t, n_win, ts)

        def step(carry, xs):
            inp, hr_last = carry
            tf_inp, tf_uv_last, tw = xs
            out_hr, out_lr, hr_pts = self.core.apply(
                params, inp, batch["coords"], batch["cells"], tw, hr_last, graph
            )
            if teacher_forcing:
                nxt_inp, nxt_hr = tf_inp, tf_uv_last
            elif val_feedback:
                # reference magnet_cnn_2d.py:466-471: reshape the HR
                # prediction to its sqrt(N) grid and bilinear-resize to W
                N = out_hr.shape[2]
                w_in = int(round(np.sqrt(N)))
                sig = out_hr[..., 0].reshape(B, ts, w_in, w_in)
                nxt_inp = interpolate_bilinear_2d(sig, (W, W))[:, :, None]
                nxt_hr = out_hr[:, -1]
            else:
                nxt_inp = out_lr
                nxt_hr = out_hr[:, -1]
            return (nxt_inp, nxt_hr), (out_hr, out_lr, hr_pts)

        xs = (
            jnp.moveaxis(u_win[:, 1:], 1, 0),
            jnp.moveaxis(uv_win[:, 1:, -1], 1, 0),
            jnp.moveaxis(t_win, 1, 0),
        )
        init = (u_win[:, 0], uv_win[:, 0, -1])
        _, (hr_seq, lr_seq, pts_seq) = jax.lax.scan(step, init, xs)

        def flat(x):
            return jnp.moveaxis(x, 0, 1).reshape(B, n_win * ts, *x.shape[3:])

        return flat(hr_seq), flat(lr_seq), flat(pts_seq), n_win

    def loss(self, params, batch, graph: Graph, rng=None, train: bool = True):
        ts = self.time_slice
        u, uv = batch["lr_frames"], batch["hr_points"]
        B, nt, C = u.shape[:3]
        n_win = (nt - ts) // ts
        used = (n_win + 1) * ts

        if train:
            hr_hat, lr_hat, pts_hat, _ = self._rollout(
                params, batch, graph, self.teacher_forcing, val_feedback=False
            )
            lr_nodes = lr_hat.reshape(*lr_hat.shape[:3], -1).transpose(0, 1, 3, 2)
            y_hat = jnp.concatenate([hr_hat, lr_nodes], axis=2)
            u_nodes = (
                u[:, ts:used].reshape(B, used - ts, C, -1).transpose(0, 1, 3, 2)
            )
            target = jnp.concatenate([uv[:, ts:used], u_nodes], axis=2)
            interp_target = uv[:, : used - ts]
            loss = self.criterion(y_hat, target) + self.criterion(
                pts_hat, interp_target
            )
            return loss, {
                "loss": loss,
                "mae_loss": l1_loss(y_hat, target),
                "interp_loss": l1_loss(pts_hat, interp_target),
            }
        else:
            hr_hat, _, _, _ = self._rollout(
                params, batch, graph, teacher_forcing=False, val_feedback=True
            )
            target = uv[:, ts:used]
            loss = self.criterion(hr_hat, target)
            return loss, {"loss": loss, "mae_loss": l1_loss(hr_hat, target)}

    def predict(self, params, batch, graph: Graph):
        hr_hat, lr_hat, _, _ = self._rollout(
            params, batch, graph, teacher_forcing=False, val_feedback=True
        )
        return hr_hat, lr_hat
