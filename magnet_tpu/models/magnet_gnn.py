"""MAgNet[GNN] — fully graph-based flavor for irregular meshes (reference
models/magnet_gnn.py).

Per window (reference magnet_gnn.py:312-376): first GraphNet pass over the
LR nodes -> k-NN INR decoder interpolates latents to HR query coords ->
projector seeds HR values -> second GraphNet pass over LR ∪ HR -> Euler.

TPU-first: both radius graphs and the k-NN table are built once per batch on
the host (coordinates are rollout-invariant; the reference recomputes
``radius_graph``/``knn`` inside every forward, magnet_gnn.py:247,293).
Training noise (magnet_gnn.py:401-426) uses explicit PRNG keys.
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
from magnet_tpu.nn.graphnet import GraphDecoder, GraphEncoder, GraphProcessor
from magnet_tpu.nn.inr import KNNDecoder
from magnet_tpu.ops.graph import knn_np


class MAgNetGNNCore(fnn.Module):
    """Setup-style core: staged methods (``nf1``/``graph_encode1``/``inr``/
    ``nf2``/``graph_encode2``/``graph_decode``) are shared between the
    standard ``__call__`` path and the graph-parallel execution path
    (``MAgNetGNN.forward_partitioned``)."""

    time_slice: int = 25
    latent_dim: int = 128
    num_message_passing_steps: int = 5
    mlp_layers: int = 4
    mlp_hidden: int = 128
    n_chan: int = 128
    codec_neighbors: int = 4
    interpolation: str = "area"
    remat: bool = False
    graph_dtype: Any = None  # GraphNet-stage dtype (see magnet_cnn_1d.py)

    def setup(self):
        gk = dict(
            node_out=self.latent_dim, edge_out=self.latent_dim,
            mlp_layers=self.mlp_layers, mlp_hidden=self.mlp_hidden,
            dtype=self.graph_dtype,
        )
        pk = dict(
            latent_dim=self.latent_dim,
            num_steps=self.num_message_passing_steps, remat=self.remat,
            mlp_layers=self.mlp_layers, mlp_hidden=self.mlp_hidden,
            dtype=self.graph_dtype,
        )
        self.encoder = batch_vmap(GraphEncoder, in_axes=(0, 0), **gk)
        self.processor = batch_vmap(GraphProcessor, in_axes=(0, 0, 0), **pk)
        self.continuous_decoder = batch_vmap(
            KNNDecoder, in_axes=(0, 0, 0, 0, 0, 0),
            n_chan=self.n_chan, codec_neighbors=self.codec_neighbors,
            interpolation=self.interpolation,
        )
        self.projector = MLP([self.mlp_hidden] * self.mlp_layers, 1)
        self._encoder = batch_vmap(GraphEncoder, in_axes=(0, 0), **gk)
        self._processor = batch_vmap(GraphProcessor, in_axes=(0, 0, 0), **pk)
        self._decoder = batch_vmap(
            GraphDecoder, in_axes=(0,),
            node_out=self.time_slice, mlp_layers=self.mlp_layers,
            mlp_hidden=self.mlp_hidden, dtype=self.graph_dtype,
        )

    # ---- staged pieces (reused by the graph-parallel execution path) -----
    @staticmethod
    def node_feats(u, x, t_last):
        B = u.shape[0]
        return jnp.concatenate(
            [u, x, jnp.broadcast_to(t_last[:, None, :], (B, u.shape[1], 1))],
            axis=-1,
        )

    @staticmethod
    def edge_features(u, x, senders, receivers):
        def ef(u1, x1, s, r):
            du = jnp.take(u1, s, axis=0) - jnp.take(u1, r, axis=0)
            dx = jnp.take(x1, s, axis=0) - jnp.take(x1, r, axis=0)
            return jnp.concatenate([du, dx], axis=-1)

        return jax.vmap(ef)(u, x, senders, receivers)

    def graph_encode1(self, nf, ef):
        return self.encoder(nf, ef)

    def graph_encode2(self, nf, ef):
        return self._encoder(nf, ef)

    def inr(self, x_lr, lr_encoded, lr_coords, hr_coords, t, nbr_idx):
        """k-NN INR decode + projector -> hr_points (B, N, T, 1)."""
        z = self.continuous_decoder(
            x_lr, lr_encoded, lr_coords, hr_coords, t, nbr_idx
        )
        return self.projector(z)

    def graph_decode(self, nf):
        return self._decoder(nf)

    @staticmethod
    def assemble_outputs(ret, x_lr, hr_points, hr_last, t):
        """Euler updates (reference magnet_gnn.py:359-369)."""
        B, T, C, L = x_lr.shape
        last_values = jnp.concatenate(
            [x_lr[:, -1].transpose(0, 2, 1), hr_last], axis=1
        )                                                     # (B, L+N, 1)
        dt = t[:, T:] - t[:, T - 1 : T]                       # (B, T_out)
        outputs = (
            last_values[:, None]
            + dt[:, :, None, None] * ret.transpose(0, 2, 1)[..., None]
        )                                                     # (B, T_out, L+N, 1)
        out_lr = outputs[:, :, :L]
        out_hr = outputs[:, :, L:]
        return out_hr, out_lr, hr_points.transpose(0, 2, 1, 3)

    def __call__(self, x_lr, lr_coords, hr_coords, t, hr_last,
                 graph_lr: Graph, graph_all: Graph, nbr_idx):
        """
        Args:
          x_lr: (B, T, C, L) LR frames.
          lr_coords: (B, L, P); hr_coords: (B, N, P).
          t: (B, 2T); hr_last: (B, N, 1).
          graph_lr: radius graph over the L LR nodes.
          graph_all: radius graph over the L+N combined nodes.
          nbr_idx: (B, N, k) k-NN of each HR coord among LR coords.
        Returns (out_hr (B,T,N,1), out_lr (B,T,L,1), hr_points (B,T,N,1)).
        """
        B, T, C, L = x_lr.shape
        N = hr_coords.shape[1]
        t_last = t[:, T - 1 : T]

        # ---- first pass over LR nodes (magnet_gnn.py:330-335)
        u_lr = x_lr.transpose(0, 3, 1, 2).reshape(B, L, T * C)
        nf = self.node_feats(u_lr, lr_coords, t_last)
        ef = self.edge_features(
            u_lr, lr_coords, graph_lr.senders, graph_lr.receivers
        )
        nf, ef = self.graph_encode1(nf, ef)
        lr_encoded, _ = self.processor(nf, ef, graph_lr)      # (B, L, latent)

        # ---- k-NN INR decode (magnet_gnn.py:224-283)
        hr_points = self.inr(
            x_lr, lr_encoded, lr_coords, hr_coords, t, nbr_idx
        )                                                     # (B, N, T, 1)

        # ---- second pass over LR ∪ HR (magnet_gnn.py:341-356)
        hr_flat = hr_points.reshape(B, N, T * C)
        all_coords = jnp.concatenate([lr_coords, hr_coords], axis=1)
        all_feats = jnp.concatenate([u_lr, hr_flat], axis=1)
        nf = self.node_feats(all_feats, all_coords, t_last)
        ef = self.edge_features(
            all_feats, all_coords, graph_all.senders, graph_all.receivers
        )
        nf, ef = self.graph_encode2(nf, ef)
        nf, _ = self._processor(nf, ef, graph_all)
        ret = self.graph_decode(nf)                           # (B, L+N, T_out)
        return self.assemble_outputs(ret, x_lr, hr_points, hr_last, t)


class MAgNetGNN(HRPointsTarget):
    """Task wrapper.  Batch (DatasetImplicitGNN*): t (B, nt),
    lr_frames (B, nt, 1, L), hr_points (B, nt, N, 1), coords_hr (B, N, P),
    coords_lr (B, L, P)."""

    name = "magnet_gnn"
    is_2d = False  # works for both; P inferred from coords

    def __init__(self, hparams: dict[str, Any]):
        self.hp = dict(hparams)
        self.time_slice = int(self.hp.get("time_slice", 25))
        self.radius = float(self.hp.get("radius", 0.08))
        self.teacher_forcing = bool(self.hp.get("teacher_forcing", True))
        self.noise = float(self.hp.get("noise", 0.0))
        self.criterion = LOSSES[self.hp.get("loss", "l1")]
        self.codec_neighbors = int(self.hp.get("codec_neighbors", 4))
        self.core = MAgNetGNNCore(
            time_slice=self.time_slice,
            latent_dim=int(self.hp.get("latent_dim", 128)),
            num_message_passing_steps=int(self.hp.get("num_message_passing_steps", 5)),
            mlp_layers=int(self.hp.get("mlp_layers", 4)),
            mlp_hidden=int(self.hp.get("mlp_hidden", 128)),
            n_chan=int(self.hp.get("n_chan", 128)),
            codec_neighbors=self.codec_neighbors,
            interpolation=self.hp.get("interpolation", "area"),
            remat=bool(self.hp.get("remat", False)),
            graph_dtype=parse_dtype(self.hp.get("graph_dtype")),
        )

    # ---------- host-side ----------
    def build_graph(self, batch):
        lr = np.asarray(batch["coords_lr"])                   # (B, L, P)
        hr = np.asarray(batch["coords_hr"])                   # (B, N, P)
        graph_lr = build_radius_graph_batch(lr, self.radius, loop=True)
        allc = np.concatenate([lr, hr], axis=1)
        graph_all = build_radius_graph_batch(allc, self.radius, loop=True)
        nbr = np.stack(
            [knn_np(lr[b], hr[b], self.codec_neighbors) for b in range(lr.shape[0])]
        )
        return (graph_lr, graph_all, jnp.asarray(nbr))

    def init(self, rng, batch, graph):
        g_lr, g_all, nbr = graph
        ts = self.time_slice
        return self.core.init(
            rng,
            batch["lr_frames"][:, :ts],
            batch["coords_lr"],
            batch["coords_hr"],
            batch["t"][:, : 2 * ts],
            batch["hr_points"][:, ts - 1],
            g_lr, g_all, nbr,
        )

    # ---------- device-side ----------
    def _rollout(self, params, batch, graph, teacher_forcing: bool, rng):
        g_lr, g_all, nbr = graph
        ts = self.time_slice
        u = batch["lr_frames"]                                # (B, nt, C, L)
        uv = batch["hr_points"]                               # (B, nt, N, 1)
        t = batch["t"]
        B, nt, C, L = u.shape
        n_win = (nt - ts) // ts

        u_win = u[:, : (n_win + 1) * ts].reshape(B, n_win + 1, ts, C, L)
        uv_win = uv[:, : (n_win + 1) * ts].reshape(B, n_win + 1, ts, *uv.shape[2:])
        t_win = time_windows(t, n_win, ts)

        use_noise = self.noise > 0 and rng is not None
        if rng is None:
            rng = jax.random.PRNGKey(0)

        def add_noise(key, x):
            return x + self.noise * jax.random.normal(key, x.shape)

        def step(carry, xs):
            inp, hr_last, key = carry
            tf_inp, tf_uv_last, tw = xs
            if use_noise:
                key, k1, k2 = jax.random.split(key, 3)
                inp = add_noise(k1, inp)
                hr_last = add_noise(k2, hr_last)
            out_hr, out_lr, hr_pts = self.core.apply(
                params, inp, batch["coords_lr"], batch["coords_hr"], tw,
                hr_last, g_lr, g_all, nbr,
            )
            if teacher_forcing:
                nxt_inp, nxt_hr = tf_inp, tf_uv_last
            else:
                nxt_inp = out_lr.transpose(0, 1, 3, 2)
                nxt_hr = out_hr[:, -1]
            return (nxt_inp, nxt_hr, key), (out_hr, out_lr, hr_pts)

        xs = (
            jnp.moveaxis(u_win[:, 1:], 1, 0),
            jnp.moveaxis(uv_win[:, 1:, -1], 1, 0),
            jnp.moveaxis(t_win, 1, 0),
        )
        init = (u_win[:, 0], uv_win[:, 0, -1], rng)
        _, (hr_seq, lr_seq, pts_seq) = jax.lax.scan(step, init, xs)

        def flat(x):
            return jnp.moveaxis(x, 0, 1).reshape(B, n_win * ts, *x.shape[3:])

        return flat(hr_seq), flat(lr_seq), flat(pts_seq), n_win

    def loss(self, params, batch, graph, rng=None, train: bool = True):
        ts = self.time_slice
        u, uv = batch["lr_frames"], batch["hr_points"]
        nt = u.shape[1]
        n_win = (nt - ts) // ts
        used = (n_win + 1) * ts

        tf_flag = self.teacher_forcing if train else False
        hr_hat, lr_hat, pts_hat, _ = self._rollout(
            params, batch, graph, tf_flag, rng if train else None
        )
        y_hat = jnp.concatenate([hr_hat, lr_hat], axis=2)
        target = jnp.concatenate(
            [uv[:, ts:used], u[:, ts:used].transpose(0, 1, 3, 2)], axis=2
        )
        loss = self.criterion(y_hat, target)
        metrics = {"loss": loss, "mae_loss": l1_loss(y_hat, target)}
        if train:
            interp_target = uv[:, : used - ts]
            interp = self.criterion(pts_hat, interp_target)
            loss = loss + interp
            metrics["loss"] = loss
            metrics["interp_loss"] = l1_loss(pts_hat, interp_target)
        return loss, metrics

    def predict(self, params, batch, graph):
        hr_hat, lr_hat, _, _ = self._rollout(
            params, batch, graph, teacher_forcing=False, rng=None
        )
        return hr_hat, lr_hat

    # ---------- graph-parallel execution path -------------------------
    def build_graph_partitioned(self, batch, n_shards: int, halo=False):
        """Partition BOTH radius graphs (LR and LR∪HR) over the 'graph'
        mesh axis; the k-NN table stays replicated (the INR decode is
        node-local)."""
        from magnet_tpu.ops.graph import radius_graph_np
        from magnet_tpu.parallel.graph_partition import (
            build_partition_buffers,
        )

        lr = np.asarray(batch["coords_lr"])                   # (B, L, P)
        hr = np.asarray(batch["coords_hr"])                   # (B, N, P)
        bsz, L = lr.shape[:2]
        allc = np.concatenate([lr, hr], axis=1)
        raw_lr = [
            radius_graph_np(lr[b], self.radius, loop=True) for b in range(bsz)
        ]
        raw_all = [
            radius_graph_np(allc[b], self.radius, loop=True)
            for b in range(bsz)
        ]
        nbr = np.stack(
            [knn_np(lr[b], hr[b], self.codec_neighbors) for b in range(bsz)]
        )
        return {
            "lr": build_partition_buffers(raw_lr, L, n_shards, halo=halo),
            "all": build_partition_buffers(
                raw_all, allc.shape[1], n_shards, halo=halo
            ),
            "nbr": jnp.asarray(nbr),
        }

    def forward_partitioned(self, params, x_lr, lr_coords, hr_coords, t,
                            hr_last, pg, mesh):
        from magnet_tpu.models.partitioned_mixin import (
            partitioned_edge_feats,
            run_partitioned_processor,
        )

        core = self.core
        core_cls = type(core)
        apply = lambda method, *a: core.apply(params, *a, method=method)
        B, T, C, L = x_lr.shape
        N = hr_coords.shape[1]
        t_last = t[:, T - 1 : T]
        mp = core.num_message_passing_steps
        ml, mh = core.mlp_layers, core.mlp_hidden

        # first pass over LR nodes, partitioned
        u_lr = x_lr.transpose(0, 3, 1, 2).reshape(B, L, T * C)
        nf = core_cls.node_feats(u_lr, lr_coords, t_last)
        ef = partitioned_edge_feats(core_cls, u_lr, lr_coords, pg["lr"])
        nf, ef = apply("graph_encode1", nf, ef)
        lr_encoded = run_partitioned_processor(
            nf, ef, pg["lr"], mesh,
            params["params"]["processor"]["steps"]["step"], mp, ml, mh,
        )

        # node-local INR decode + projector
        hr_points = apply(
            "inr", x_lr, lr_encoded, lr_coords, hr_coords, t, pg["nbr"]
        )

        # second pass over LR ∪ HR, partitioned
        hr_flat = hr_points.reshape(B, N, T * C)
        all_coords = jnp.concatenate([lr_coords, hr_coords], axis=1)
        all_feats = jnp.concatenate([u_lr, hr_flat], axis=1)
        nf = core_cls.node_feats(all_feats, all_coords, t_last)
        ef = partitioned_edge_feats(core_cls, all_feats, all_coords, pg["all"])
        nf, ef = apply("graph_encode2", nf, ef)
        nf_out = run_partitioned_processor(
            nf, ef, pg["all"], mesh,
            params["params"]["_processor"]["steps"]["step"], mp, ml, mh,
        )
        ret = apply("graph_decode", nf_out)
        return core_cls.assemble_outputs(ret, x_lr, hr_points, hr_last, t)

    def loss_partitioned(self, params, batch, pg, mesh, rng=None,
                         train: bool = True, unroll: bool = False):
        """Same semantics as ``loss``: train = optional TF + noise + interp
        term; val = no TF, plain LR feedback, hr+lr criterion (matching the
        standard MAgNetGNN path, which has no val-feedback branch).
        Scans the rollout by default (one trace of the sharded model per
        horizon); ``unroll=True`` keeps the old per-window Python loop for
        the scan-vs-unroll parity test — both thread the SAME key sequence
        as the standard ``_rollout``, so noise is bit-identical."""
        ts = self.time_slice
        u, uv = batch["lr_frames"], batch["hr_points"]
        t = batch["t"]
        B, nt = u.shape[:2]
        n_win = (nt - ts) // ts
        used = (n_win + 1) * ts
        tf_flag = self.teacher_forcing and train
        use_noise = train and self.noise > 0 and rng is not None
        key = rng if rng is not None else jax.random.PRNGKey(0)

        if unroll:
            inp = u[:, :ts]
            hr_last = uv[:, ts - 1]
            hr_hat, lr_hat, pts = [], [], []
            for i in range(n_win):
                tw = t[:, i * ts : (i + 2) * ts]
                if use_noise:
                    key, k1, k2 = jax.random.split(key, 3)
                    inp = inp + self.noise * jax.random.normal(k1, inp.shape)
                    hr_last = hr_last + self.noise * jax.random.normal(
                        k2, hr_last.shape
                    )
                out_hr, out_lr, hr_pts = self.forward_partitioned(
                    params, inp, batch["coords_lr"], batch["coords_hr"], tw,
                    hr_last, pg, mesh,
                )
                hr_hat.append(out_hr)
                lr_hat.append(out_lr)
                pts.append(hr_pts)
                if tf_flag:
                    inp = u[:, (i + 1) * ts : (i + 2) * ts]
                    hr_last = uv[:, (i + 2) * ts - 1]
                else:
                    inp = out_lr.transpose(0, 1, 3, 2)
                    hr_last = out_hr[:, -1]
            hr_hat = jnp.concatenate(hr_hat, axis=1)
            lr_hat = jnp.concatenate(lr_hat, axis=1)
            pts = jnp.concatenate(pts, axis=1)
        else:
            u_win = u[:, :used].reshape(B, n_win + 1, ts, *u.shape[2:])
            uv_win = uv[:, :used].reshape(B, n_win + 1, ts, *uv.shape[2:])
            t_win = time_windows(t, n_win, ts)

            def step(carry, xs):
                inp, hr_last, k = carry
                tf_inp, tf_uv_last, tw = xs
                if use_noise:
                    k, k1, k2 = jax.random.split(k, 3)
                    inp = inp + self.noise * jax.random.normal(k1, inp.shape)
                    hr_last = hr_last + self.noise * jax.random.normal(
                        k2, hr_last.shape
                    )
                out_hr, out_lr, hr_pts = self.forward_partitioned(
                    params, inp, batch["coords_lr"], batch["coords_hr"], tw,
                    hr_last, pg, mesh,
                )
                if tf_flag:
                    nxt = (tf_inp, tf_uv_last, k)
                else:
                    nxt = (out_lr.transpose(0, 1, 3, 2), out_hr[:, -1], k)
                return nxt, (out_hr, out_lr, hr_pts)

            xs = (
                jnp.moveaxis(u_win[:, 1:], 1, 0),
                jnp.moveaxis(uv_win[:, 1:, -1], 1, 0),
                jnp.moveaxis(t_win, 1, 0),
            )
            init = (u_win[:, 0], uv_win[:, 0, -1], key)
            _, (hr_seq, lr_seq, pts_seq) = jax.lax.scan(step, init, xs)

            def flat(x):
                return jnp.moveaxis(x, 0, 1).reshape(
                    B, n_win * ts, *x.shape[3:]
                )

            hr_hat, lr_hat, pts = flat(hr_seq), flat(lr_seq), flat(pts_seq)

        y_hat = jnp.concatenate([hr_hat, lr_hat], axis=2)
        target = jnp.concatenate(
            [uv[:, ts:used], u[:, ts:used].transpose(0, 1, 3, 2)], axis=2
        )
        loss = self.criterion(y_hat, target)
        metrics = {"loss": loss, "mae_loss": l1_loss(y_hat, target)}
        if train:
            interp_target = uv[:, : used - ts]
            loss = loss + self.criterion(pts, interp_target)
            metrics["loss"] = loss
            metrics["interp_loss"] = l1_loss(pts, interp_target)
        return loss, metrics
