"""Shared graph-parallel execution path for the MAgNet[CNN] wrappers.

Provides build_graph_partitioned / forward_partitioned / loss_partitioned
over a (dp, graph) mesh; the 1D/2D wrappers supply small hooks for their
coordinate grids and output layouts.  See ARCHITECTURE.md (parallelism
model) and tests/test_parallel.py for parity coverage.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from magnet_tpu.models.common import l1_loss


def run_partitioned_processor(nf, ef, pg, mesh, stacked_params, num_steps,
                              mlp_layers, mlp_hidden):
    """Run a stacked-InteractionNetwork processor edge-partitioned over the
    mesh's 'graph' axis.

    nf: (B, n_nodes, latent) encoded node latents;
    ef: (B, E_flat, latent) encoded edge latents in partition order (for the
    overlap variant: [interior | boundary] concatenated);
    pg: partition buffers (parallel.graph_partition.build_partition_buffers);
    stacked_params: params subtree of the GraphProcessor 'steps'/'step'
    stack.  Returns (B, n_nodes, latent).
    """
    from magnet_tpu.nn.graphnet import InteractionNetwork
    from magnet_tpu.parallel.graph_partition import (
        interaction_step_halo,
        interaction_step_halo_overlap,
        interaction_step_local,
        make_partitioned_processor,
        make_partitioned_processor_halo,
        make_partitioned_processor_halo_fused,
        make_partitioned_processor_halo_overlap,
    )

    B = nf.shape[0]
    latent = nf.shape[-1]

    if "blk_rl" in pg:
        # FUSED variant: per-shard blocked layout, real InteractionNetwork
        # step (Pallas kernels on TPU) inside shard_map
        inet = InteractionNetwork(
            node_out=latent, edge_out=latent,
            mlp_layers=mlp_layers, mlp_hidden=mlp_hidden,
        )
        step_params = [
            {"params": jax.tree.map(lambda a: a[i], stacked_params)}
            for i in range(num_steps)
        ]
        g_shards = pg["blk_rl"].shape[1]
        # pad nodes to G * ns where ns = ceil(n_nodes / G) — matches the
        # builder's round_up(n_node, n_shards) // n_shards
        ns = -(-nf.shape[1] // g_shards)
        n_pad = g_shards * ns
        nf_pad = jnp.pad(nf, ((0, 0), (0, n_pad - nf.shape[1]), (0, 0)))
        ef_sh = ef.reshape(B, g_shards, -1, latent)
        runner = make_partitioned_processor_halo_fused(
            inet, num_steps, mesh, set(pg.keys())
        )
        nf_out, _ = runner(step_params, nf_pad, ef_sh, pg)
        return nf_out[:, : nf.shape[1]]

    overlap = "t_int" in pg
    tbl = pg["t_int"] if overlap else pg["table"]
    g_shards, ns = tbl.shape[1], tbl.shape[2]
    n_pad = g_shards * ns
    nf_pad = jnp.pad(nf, ((0, 0), (0, n_pad - nf.shape[1]), (0, 0)))

    inet = InteractionNetwork(
        node_out=latent, edge_out=latent,
        mlp_layers=mlp_layers, mlp_hidden=mlp_hidden,
    )
    step_params = [
        {"params": jax.tree.map(lambda a: a[i], stacked_params)}
        for i in range(num_steps)
    ]

    if overlap:
        n_int = pg["remap_int"].shape[1] * pg["remap_int"].shape[2]
        ef_int = ef[:, :n_int].reshape(B, g_shards, -1, latent)
        ef_bnd = ef[:, n_int:].reshape(B, g_shards, -1, latent)

        def iapply_o(params_i, *a):
            return interaction_step_halo_overlap(inet, params_i, *a)

        import os

        runner = make_partitioned_processor_halo_overlap(
            iapply_o, num_steps, mesh, batched_halo=True,
            ring=os.environ.get("MAGNET_TPU_HALO_RING", "0") == "1",
        )
        nf_out, _ = runner(
            step_params, nf_pad, ef_int, ef_bnd,
            pg["remap_int"], pg["recv_int"], pg["mask_int"], pg["t_int"],
            pg["remap_bnd"], pg["recv_bnd"], pg["mask_bnd"], pg["t_bnd"],
            pg["degree"], pg["halo_idx"],
        )
    elif "halo_idx" in pg:
        ef_sh = ef.reshape(B, g_shards, -1, latent)

        def iapply_h(params_i, x_local, x_ext, e, remap, recv_loc, mask,
                     table):
            return interaction_step_halo(
                inet, params_i, x_local, x_ext, e, remap, recv_loc,
                mask, table,
            )

        runner = make_partitioned_processor_halo(
            iapply_h, num_steps, mesh, batched_halo=True,
        )
        nf_out, _ = runner(
            step_params, nf_pad, ef_sh,
            pg["senders_remap"], pg["recv_loc"], pg["mask"], pg["table"],
            pg["halo_idx"],
        )
    else:
        ef_sh = ef.reshape(B, g_shards, -1, latent)

        def iapply(params_i, x_full, e, senders, recv_loc, mask, table):
            return interaction_step_local(
                inet, params_i, x_full, e, senders, recv_loc, mask, table
            )

        runner = make_partitioned_processor(iapply, num_steps, mesh)
        nf_out, _ = runner(
            step_params, nf_pad, ef_sh,
            pg["senders"], pg["recv_loc"], pg["mask"], pg["table"],
        )
    return nf_out[:, : nf.shape[1]]


def partitioned_edge_feats(core_cls, all_feats, all_coords, pg):
    """Edge features in partition order; returns (ef, ()) or the overlap
    variant's (ef_concat,) with interior length folded into pg layout."""
    if "t_int" in pg:
        ef_int = core_cls.edge_features(
            all_feats, all_coords,
            pg["senders_flat_int"], pg["receivers_flat_int"],
        )
        ef_bnd = core_cls.edge_features(
            all_feats, all_coords,
            pg["senders_flat_bnd"], pg["receivers_flat_bnd"],
        )
        return jnp.concatenate([ef_int, ef_bnd], axis=1)
    return core_cls.edge_features(
        all_feats, all_coords, pg["senders_flat"], pg["receivers_flat"]
    )


class PartitionedGraphMixin:
    """Requires on the host class: ``self.core`` (setup-style core with
    graph_pre/edge_features/graph_encode/graph_decode/assemble_outputs),
    ``self.radius``, ``self.time_slice``, ``self.teacher_forcing``,
    ``self.criterion`` and the hooks ``_pp_lr_coords``, ``_pp_feedback``,
    ``_pp_lr_nodes``, ``_pp_u_nodes``, ``_pp_query_key``."""

    # ---- hooks (overridden per family) --------------------------------
    def _pp_lr_coords(self, batch) -> np.ndarray:
        raise NotImplementedError

    def _pp_query_key(self) -> str:
        return "coords"

    def _pp_feedback(self, out_lr):
        raise NotImplementedError

    def _pp_val_feedback(self, batch, out_hr):
        """Val feedback: interpolate the HR prediction back to the LR input
        layout (reference magnet_cnn.py:458-459 / magnet_cnn_2d.py:466-471)."""
        raise NotImplementedError

    def _pp_lr_nodes(self, lr_hat):
        raise NotImplementedError

    def _pp_u_nodes(self, u, ts, used):
        raise NotImplementedError

    # ---- host-side ----------------------------------------------------
    def build_graph_partitioned(self, batch, n_shards: int,
                                halo=False):
        """halo: False = all-gather variant; True = halo all_to_all;
        "overlap" = halo all_to_all with the interior/boundary edge split
        (collective overlapped with interior compute)."""
        from magnet_tpu.ops.graph import radius_graph_np
        from magnet_tpu.parallel.graph_partition import (
            build_partition_buffers,
        )

        coords = np.asarray(batch[self._pp_query_key()])
        lr = self._pp_lr_coords(batch)
        allc = np.concatenate(
            [np.broadcast_to(lr[None], (coords.shape[0],) + lr.shape), coords],
            axis=1,
        )
        bsz, n_node = allc.shape[:2]
        raw = [
            radius_graph_np(allc[b], self.radius, loop=True)
            for b in range(bsz)
        ]
        return build_partition_buffers(raw, n_node, n_shards, halo=halo)

    # ---- device-side --------------------------------------------------
    def forward_partitioned(self, params, x_t, coords, cell, t, hr_last,
                            pg, mesh):
        core = self.core
        core_cls = type(core)
        apply = lambda method, *a: core.apply(params, *a, method=method)
        node_feats, hr_points, all_feats, all_coords = apply(
            "graph_pre", x_t, coords, cell, t
        )
        edge_feats = partitioned_edge_feats(core_cls, all_feats, all_coords, pg)
        nf, ef = apply("graph_encode", node_feats, edge_feats)
        nf_out = run_partitioned_processor(
            nf, ef, pg, mesh,
            params["params"]["_processor"]["steps"]["step"],
            core.num_message_passing_steps, core.mlp_layers, core.mlp_hidden,
        )
        ret = apply("graph_decode", nf_out)
        return core_cls.assemble_outputs(ret, x_t, hr_points, hr_last, t)

    def _rollout_partitioned(self, params, batch, pg, mesh, tf_flag,
                             train, n_win, unroll: bool = False):
        """Windowed rollout through forward_partitioned.  Scans by default
        (one trace/compile of the sharded model regardless of horizon —
        at E1 scale the unrolled form traced the full model 14×); the
        unrolled path is kept for the scan-vs-unroll parity test."""
        ts = self.time_slice
        u, uv, t = batch["lr_frames"], batch["hr_points"], batch["t"]
        qk = self._pp_query_key()

        if unroll:
            inp = u[:, :ts]
            hr_last = uv[:, ts - 1]
            hr_hat, lr_hat, pts = [], [], []
            for i in range(n_win):
                tw = t[:, i * ts : (i + 2) * ts]
                out_hr, out_lr, hr_pts = self.forward_partitioned(
                    params, inp, batch[qk], batch["cells"], tw, hr_last,
                    pg, mesh,
                )
                hr_hat.append(out_hr)
                lr_hat.append(out_lr)
                pts.append(hr_pts)
                if tf_flag:
                    inp = u[:, (i + 1) * ts : (i + 2) * ts]
                    hr_last = uv[:, (i + 2) * ts - 1]
                elif not train:
                    inp = self._pp_val_feedback(batch, out_hr)
                    hr_last = out_hr[:, -1]
                else:
                    inp = self._pp_feedback(out_lr)
                    hr_last = out_hr[:, -1]
            return (
                jnp.concatenate(hr_hat, axis=1),
                jnp.concatenate(lr_hat, axis=1),
                jnp.concatenate(pts, axis=1),
            )

        from magnet_tpu.models.common import time_windows

        B = u.shape[0]
        u_win = u[:, : (n_win + 1) * ts].reshape(
            B, n_win + 1, ts, *u.shape[2:]
        )
        uv_win = uv[:, : (n_win + 1) * ts].reshape(
            B, n_win + 1, ts, *uv.shape[2:]
        )
        t_win = time_windows(t, n_win, ts)                 # (B, n, 2ts)

        def step(carry, xs):
            inp, hr_last = carry
            tf_inp, tf_uv_last, tw = xs
            out_hr, out_lr, hr_pts = self.forward_partitioned(
                params, inp, batch[qk], batch["cells"], tw, hr_last,
                pg, mesh,
            )
            if tf_flag:
                nxt = (tf_inp, tf_uv_last)
            elif not train:
                nxt = (self._pp_val_feedback(batch, out_hr), out_hr[:, -1])
            else:
                nxt = (self._pp_feedback(out_lr), out_hr[:, -1])
            return nxt, (out_hr, out_lr, hr_pts)

        xs = (
            jnp.moveaxis(u_win[:, 1:], 1, 0),
            jnp.moveaxis(uv_win[:, 1:, -1], 1, 0),
            jnp.moveaxis(t_win, 1, 0),
        )
        init = (u_win[:, 0], uv_win[:, 0, -1])
        _, (hr_seq, lr_seq, pts_seq) = jax.lax.scan(step, init, xs)

        def flat(x):
            return jnp.moveaxis(x, 0, 1).reshape(
                B, n_win * ts, *x.shape[3:]
            )

        return flat(hr_seq), flat(lr_seq), flat(pts_seq)

    def loss_partitioned(self, params, batch, pg, mesh, rng=None,
                         train: bool = True, unroll: bool = False):
        """Matches ``loss``'s semantics exactly: train = TF/plain-LR
        feedback + interp loss; val = no TF, HR-interpolated feedback
        (reference magnet_cnn.py:458-459), HR-only criterion, NO interp
        term — so sharded and unsharded runs monitor the same
        val_mae_loss (parity tested in tests/test_parallel.py)."""
        ts = self.time_slice
        u, uv = batch["lr_frames"], batch["hr_points"]
        nt = u.shape[1]
        n_win = (nt - ts) // ts
        used = (n_win + 1) * ts
        tf_flag = self.teacher_forcing and train

        hr_hat, lr_hat, pts = self._rollout_partitioned(
            params, batch, pg, mesh, tf_flag, train, n_win, unroll=unroll
        )

        if not train:
            target = uv[:, ts:used]
            loss = self.criterion(hr_hat, target)
            return loss, {"loss": loss, "mae_loss": l1_loss(hr_hat, target)}

        y_hat = jnp.concatenate([hr_hat, self._pp_lr_nodes(lr_hat)], axis=2)
        target = jnp.concatenate(
            [uv[:, ts:used], self._pp_u_nodes(u, ts, used)], axis=2
        )
        interp_target = uv[:, : used - ts]
        loss = self.criterion(y_hat, target) + self.criterion(
            pts, interp_target
        )
        return loss, {
            "loss": loss,
            "mae_loss": l1_loss(y_hat, target),
            "interp_loss": l1_loss(pts, interp_target),
        }
