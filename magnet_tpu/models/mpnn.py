"""MPNN 1D/2D baselines (reference models/mpnn.py, models/mpnn_2d.py).

Pure message-passing PDE solver: embedding MLP on (u, x/L, t/tmax), five
stacked MPNN layers with InstanceNorm, temporal-bundling CNN decoder, Euler
update ``u_last + cumsum(dt) * diff``.

Reference quirks replicated:
  * 1D uses steps=[0]*B always (time variable frozen at t[b,0],
    mpnn.py:265), 2D advances steps per rollout window (mpnn_2d.py:265,281);
  * 1D time_window==10 decoder lacks the mid Swish (mpnn.py:141-143), 2D has
    it (mpnn_2d.py:139-142);
  * radius: 1D r = n*dx + 1e-4 (mpnn.py:243-244); 2D r = n*||dx-dy|| + 1e-4
    (mpnn_2d.py:241-243), where dy is x[0][W]-x[0][0] on the flattened grid.

TPU-first: the radius graph is built once per batch on the host (topology
is time-independent; the reference rebuilds the identical graph every
window, mpnn.py:276-287) and the rollout is a ``lax.scan``.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from magnet_tpu.models.common import (
    Graph,
    LOSSES,
    batch_vmap,
    build_radius_graph_batch,
    l1_loss,
)
from magnet_tpu.nn.core import Linear, swish
from magnet_tpu.nn.gnn_layer import MPNNLayer, TemporalBundlingDecoder


class _MPNNStep(fnn.Module):
    """One (batched) GNN_Layer, scanned over stacked per-layer params."""

    hidden_features: int
    pos_dim: int
    time_window: int

    @fnn.compact
    def __call__(self, carry, _):
        h, u, pos, variables, gs = carry
        layer = batch_vmap(
            MPNNLayer,
            in_axes=(0, 0, 0, 0, 0),
            hidden_features=self.hidden_features,
            out_features=self.hidden_features,
            pos_dim=self.pos_dim,
            time_window=self.time_window,
            name="layer",
        )
        h = layer(h, u, pos, variables, gs)
        return (h, u, pos, variables, gs), None


class MPNNCore(fnn.Module):
    """Per-window forward over a batch of same-mesh graphs.

    Setup-style: ``embed`` and ``decode`` are node-local stages reused by
    the edge-partitioned execution path (MPNN.loss_partitioned)."""

    hidden_features: int = 128
    hidden_layer: int = 5
    time_window: int = 16
    pos_dim: int = 1
    with_mid_swish: bool = True

    def setup(self):
        self.embed_0 = Linear(self.hidden_features)
        self.embed_1 = Linear(self.hidden_features)
        self.gnn_layers = fnn.scan(
            _MPNNStep,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.hidden_layer,
        )(self.hidden_features, self.pos_dim, self.time_window)
        self.output_mlp = TemporalBundlingDecoder(
            time_window=self.time_window,
            with_mid_swish=self.with_mid_swish,
        )

    # ---- staged pieces (reused by the partitioned execution path) -------
    def embed(self, u, pos_x, variables):
        node_in = jnp.concatenate([u, pos_x, variables], axis=-1)
        h = swish(self.embed_0(node_in))
        return swish(self.embed_1(h))

    def decode(self, h, u, dt):
        """Temporal-bundling decode + Euler: h (B, N, H), u (B, N, tw)."""
        B, N, H = h.shape
        diff = self.output_mlp(h.reshape(B * N, H)).reshape(
            B, N, self.time_window
        )
        dt_row = jnp.cumsum(jnp.full((self.time_window,), dt), axis=0)  # (tw,)
        return u[..., -1:] + dt_row[None, None, :] * diff

    def __call__(self, u, pos_x, variables, dt, graph: Graph):
        """
        Args:
          u: (B, N, tw) node time histories.
          pos_x: (B, N, P) normalized positions (x / L).
          variables: (B, N, 1) normalized time (t / tmax).
          dt: scalar timestep.
        Returns (B, N, tw) bundled predictions.
        """
        h = self.embed(u, pos_x, variables)
        (h, *_), _ = self.gnn_layers((h, u, pos_x, variables, graph), None)
        return self.decode(h, u, dt)


class MPNN:
    """1D task wrapper.  Batch: u (B, N, nt) [reference layout], x (B, N, 1),
    t (B, nt)."""

    name = "mpnn"
    is_2d = False

    def __init__(self, hparams: dict[str, Any]):
        self.hp = dict(hparams)
        self.time_window = int(self.hp.get("time_window", 16))
        self.teacher_forcing = bool(self.hp.get("teacher_forcing", False))
        self.neighbors = int(self.hp.get("neighbors", 3))
        self.criterion = LOSSES[self.hp.get("loss", "l1")]
        self.core = MPNNCore(
            hidden_features=int(self.hp.get("hidden_features", 128)),
            hidden_layer=int(self.hp.get("hidden_layer", 5)),
            time_window=self.time_window,
            pos_dim=1,
            with_mid_swish=self.time_window != 10,
        )

    def _radius(self, x: np.ndarray) -> float:
        dx = float(x[0, 1, 0] - x[0, 0, 0])
        return self.neighbors * dx + 1e-4

    def build_graph(self, batch) -> Graph:
        x = np.asarray(batch["x"])                        # (B, N, 1)
        return build_radius_graph_batch(x, self._radius(x), loop=False)

    def _prep(self, batch):
        u = batch["u"].transpose(0, 2, 1)                 # (B, nt, N)
        x = batch["x"]                                    # (B, N, 1)
        t = batch["t"]                                    # (B, nt)
        L = x[0, -1, 0]
        tmax = t[0, -1]
        dt = t[0, 1] - t[0, 0]
        return u, x, t, L, tmax, dt

    def _variables(self, t, step_idx, n_nodes):
        """(B, N, 1) node time variable: t[b, step]/tmax; 1D always step=0."""
        B = t.shape[0]
        tv = t[:, 0] / t[0, -1]
        return jnp.broadcast_to(tv[:, None, None], (B, n_nodes, 1))

    def init(self, rng, batch, graph: Graph):
        u, x, t, L, tmax, dt = self._prep(batch)
        B, nt, N = u.shape
        tw = self.time_window
        u0 = u[:, :tw].transpose(0, 2, 1)                 # (B, N, tw)
        return self.core.init(
            rng, u0, x / L, self._variables(t, 0, N), dt, graph
        )

    def _rollout(self, params, batch, graph: Graph, teacher_forcing: bool):
        u, x, t, L, tmax, dt = self._prep(batch)
        B, nt, N = u.shape
        tw = self.time_window
        n_win = (nt - tw) // tw
        pos = x / L
        variables = self._variables(t, 0, N)

        fut = u[:, tw : tw + n_win * tw].reshape(B, n_win, tw, N)

        def step(inp, fut_win):
            # inp: (B, N, tw)
            y = self.core.apply(params, inp, pos, variables, dt, graph)
            nxt = fut_win.transpose(0, 2, 1) if teacher_forcing else y
            return nxt, y

        _, ys = jax.lax.scan(
            step, u[:, :tw].transpose(0, 2, 1), jnp.moveaxis(fut, 1, 0)
        )                                                  # (n, B, N, tw)
        u_hat = jnp.moveaxis(ys, 0, 1)                     # (B, n, N, tw)
        u_hat = u_hat.transpose(0, 1, 3, 2).reshape(B, n_win * tw, N)
        return u_hat, n_win

    def loss(self, params, batch, graph: Graph, rng=None, train: bool = True):
        u = batch["u"].transpose(0, 2, 1)
        tw = self.time_window
        nt = u.shape[1]
        n_win = (nt - tw) // tw
        tf_flag = self.teacher_forcing if train else False
        u_hat, _ = self._rollout(params, batch, graph, tf_flag)
        target = u[:, tw : tw + n_win * tw]
        loss = self.criterion(u_hat, target)
        return loss, {"loss": loss, "mae_loss": l1_loss(u_hat, target)}

    def predict(self, params, batch, graph: Graph):
        u_hat, _ = self._rollout(params, batch, graph, teacher_forcing=False)
        return u_hat

    def rollout_target(self, batch, horizon: int):
        """Ground truth aligned with predict(): u is stored (B, N, nt)
        (reference datamodule/dataset.py:12-51); time-major slice shifted
        by time_window (reference mpnn.py:271-287 rollout)."""
        tw = self.time_window
        u = jnp.asarray(batch["u"]).transpose(0, 2, 1)
        return u[:, tw : tw + horizon]

    # ---------- graph-parallel execution path -------------------------
    def build_graph_partitioned(self, batch, n_shards: int, halo=False):
        """Edge-partition the (time-invariant) radius graph; the MPNN step
        needs only the all-gather layout (sender-side projections are
        exchanged, not raw node features), so halo variants are not used."""
        from magnet_tpu.ops.graph import radius_graph_np
        from magnet_tpu.parallel.graph_partition import (
            build_partition_buffers,
        )

        x = np.asarray(batch["x"])                        # (B, N, P)
        bsz, n_node = x.shape[:2]
        r = self._radius(x)
        raw = [
            radius_graph_np(x[b], r, loop=False) for b in range(bsz)
        ]
        return build_partition_buffers(raw, n_node, n_shards, halo=False)

    def _forward_partitioned(self, params, inp, pos, variables, dt, pg, mesh):
        from magnet_tpu.nn.gnn_layer import MPNNLayer
        from magnet_tpu.parallel.graph_partition import (
            make_partitioned_mpnn_processor,
        )

        core = self.core
        apply = lambda method, *a: core.apply(params, *a, method=method)
        h = apply("embed", inp, pos, variables)           # (B, N, H)
        B, N, H = h.shape
        g_shards, ns = pg["table"].shape[1], pg["table"].shape[2]
        n_pad = g_shards * ns

        def padn(a):
            return jnp.pad(a, ((0, 0), (0, n_pad - N), (0, 0)))

        layer = MPNNLayer(
            hidden_features=core.hidden_features,
            out_features=core.hidden_features,
            pos_dim=core.pos_dim,
            time_window=core.time_window,
        )
        stacked = params["params"]["gnn_layers"]["layer"]
        step_params = [
            {"params": jax.tree.map(lambda a: a[i], stacked)}
            for i in range(core.hidden_layer)
        ]
        runner = make_partitioned_mpnn_processor(
            layer, core.hidden_layer, mesh, n_node=N
        )
        h_out = runner(
            step_params, padn(h), padn(inp), padn(pos), padn(variables),
            pg["senders"], pg["recv_loc"], pg["mask"], pg["table"],
        )[:, :N]
        return apply("decode", h_out, inp, dt)

    def loss_partitioned(self, params, batch, pg, mesh, rng=None,
                         train: bool = True, unroll: bool = False):
        """Same semantics as ``loss`` (train and val are both plain
        rollouts; MPNN has no interp/val-feedback branches).  Scans the
        rollout by default — the per-window time variable (window-dependent
        in 2D, mpnn_2d.py:265,281) is precomputed and fed as a scan input;
        ``unroll=True`` keeps the Python loop for the parity test."""
        u, x, t, L, tmax, dt = self._prep(batch)
        B, nt, N = u.shape
        tw = self.time_window
        n_win = (nt - tw) // tw
        pos = x / L
        tf_flag = self.teacher_forcing if train else False

        if unroll:
            inp = u[:, :tw].transpose(0, 2, 1)
            outs = []
            for i in range(n_win):
                variables = self._pp_variables(t, i, nt, N)
                y = self._forward_partitioned(
                    params, inp, pos, variables, dt, pg, mesh
                )
                outs.append(y)
                inp = (
                    u[:, (i + 1) * tw : (i + 2) * tw].transpose(0, 2, 1)
                    if tf_flag else y
                )
            u_hat = jnp.stack(outs, axis=1)
        else:
            variables = jnp.stack(
                [self._pp_variables(t, i, nt, N) for i in range(n_win)]
            )                                              # (n, B, N, 1)
            u_tf = jnp.stack(
                [
                    u[:, (i + 1) * tw : (i + 2) * tw].transpose(0, 2, 1)
                    for i in range(n_win)
                ]
            )                                              # (n, B, N, tw)

            def step(inp, xs):
                var_i, tf_inp = xs
                y = self._forward_partitioned(
                    params, inp, pos, var_i, dt, pg, mesh
                )
                return (tf_inp if tf_flag else y), y

            _, ys = jax.lax.scan(
                step, u[:, :tw].transpose(0, 2, 1), (variables, u_tf)
            )                                              # (n, B, N, tw)
            u_hat = jnp.moveaxis(ys, 0, 1)
        u_hat = u_hat.transpose(0, 1, 3, 2).reshape(B, n_win * tw, N)
        target = u[:, tw : tw + n_win * tw]
        loss = self.criterion(u_hat, target)
        return loss, {"loss": loss, "mae_loss": l1_loss(u_hat, target)}

    def _pp_variables(self, t, win_idx, nt, n_nodes):
        """Per-window time variable; 1D always uses step 0 (mpnn.py:265)."""
        return self._variables(t, 0, n_nodes)


class MPNN2D(MPNN):
    """2D task wrapper.  Batch: u (B, N, nt), x (B, N, 2), t (B, nt).

    Differences from 1D (see module docstring): radius from ||dx-dy||, time
    variable advances with the rollout window, decoder has the mid Swish.
    """

    name = "mpnn_2d"
    is_2d = True

    def __init__(self, hparams: dict[str, Any]):
        hparams = dict(hparams)
        hparams.setdefault("time_window", 10)
        hparams.setdefault("neighbors", 4)
        super().__init__(hparams)
        self.core = MPNNCore(
            hidden_features=int(self.hp.get("hidden_features", 128)),
            hidden_layer=int(self.hp.get("hidden_layer", 5)),
            time_window=self.time_window,
            pos_dim=2,
            with_mid_swish=True,
        )

    def _pp_variables(self, t, win_idx, nt, n_nodes):
        """2D advances the time variable per window (mpnn_2d.py:265,281)."""
        step = min((win_idx + 1) * self.time_window - 1, nt - 1)
        return self._variables_step(t, step, n_nodes)

    def _radius(self, x: np.ndarray) -> float:
        n = x.shape[1]
        w = int(round(np.sqrt(n)))
        dx = x[0, 1] - x[0, 0]                             # (2,)
        dy = x[0, w] - x[0, 0]
        dr = float(np.linalg.norm(dx - dy))
        return self.neighbors * dr + 1e-4

    def _prep(self, batch):
        u = batch["u"].transpose(0, 2, 1)                  # (B, nt, N)
        x = batch["x"]                                     # (B, N, 2)
        t = batch["t"]
        L = x[0, -1, 0]
        tmax = t[0, -1]
        dt = t[0, 1] - t[0, 0]
        return u, x, t, L, tmax, dt

    def _variables_step(self, t, step, n_nodes):
        B = t.shape[0]
        tv = t[:, step] / t[0, -1]
        return jnp.broadcast_to(tv[:, None, None], (B, n_nodes, 1))

    def init(self, rng, batch, graph: Graph):
        u, x, t, L, tmax, dt = self._prep(batch)
        B, nt, N = u.shape
        tw = self.time_window
        u0 = u[:, :tw].transpose(0, 2, 1)
        return self.core.init(
            rng, u0, x / L, self._variables_step(t, tw - 1, N), dt, graph
        )

    def _rollout(self, params, batch, graph: Graph, teacher_forcing: bool):
        u, x, t, L, tmax, dt = self._prep(batch)
        B, nt, N = u.shape
        tw = self.time_window
        n_win = (nt - tw) // tw
        pos = x / L

        fut = u[:, tw : tw + n_win * tw].reshape(B, n_win, tw, N)
        # time variable per window i: t[:, (i+2)*tw - 1] for the NEXT graph,
        # initial graph uses tw-1 (reference mpnn_2d.py:265,281)
        steps = np.minimum((np.arange(n_win) + 1) * tw - 1, nt - 1)
        tv_all = t[:, steps] / t[0, -1]                    # (B, n_win); window i input graph
        # window 0 input graph built with step tw-1 == steps[0] ✓; feedback
        # graphs use (i+2)*tw-1 == steps[i+1] for the next window ✓.

        def step(carry, xs):
            inp = carry
            fut_win, tv = xs                               # tv: (B,)
            variables = jnp.broadcast_to(tv[:, None, None], (B, N, 1))
            y = self.core.apply(params, inp, pos, variables, dt, graph)
            nxt = fut_win.transpose(0, 2, 1) if teacher_forcing else y
            return nxt, y

        _, ys = jax.lax.scan(
            step,
            u[:, :tw].transpose(0, 2, 1),
            (jnp.moveaxis(fut, 1, 0), jnp.moveaxis(tv_all, 1, 0)),
        )
        u_hat = jnp.moveaxis(ys, 0, 1).transpose(0, 1, 3, 2).reshape(
            B, n_win * tw, N
        )
        return u_hat, n_win
