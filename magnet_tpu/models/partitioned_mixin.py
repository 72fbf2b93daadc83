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
            partition_graph,
            partition_graph_halo,
            partition_graph_halo_overlap,
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
        if halo == "overlap":
            return self._build_overlap(
                raw, n_node, n_shards, bsz, partition_graph_halo_overlap
            )
        e_shard = k_max = 1
        for s, t in raw:
            sg = partition_graph(s, t, n_node, n_shards)
            e_shard = max(e_shard, sg.senders.shape[1])
            k_max = max(k_max, sg.recv_edge_ids.shape[2])
        e_shard = ((e_shard + 127) // 128) * 128
        part = partition_graph_halo if halo else partition_graph
        sgs = [
            part(s, t, n_node, n_shards, e_shard=e_shard, k_max=k_max)
            for s, t in raw
        ]
        ns = sgs[0].n_node_pad // n_shards
        shard_off = (np.arange(n_shards, dtype=np.int32) * ns)[None, :, None]
        senders = np.stack([g.senders for g in sgs])
        recv_loc = np.stack([g.receivers_loc for g in sgs])
        out = {
            "senders": jnp.asarray(senders),
            "recv_loc": jnp.asarray(recv_loc),
            "mask": jnp.asarray(np.stack([g.edge_mask for g in sgs])),
            "table": jnp.asarray(np.stack([g.recv_edge_ids for g in sgs])),
            "senders_flat": jnp.asarray(senders.reshape(bsz, -1)),
            "receivers_flat": jnp.asarray(
                (recv_loc + shard_off).reshape(bsz, -1)
            ),
            "n_node": n_node,
            "n_node_pad": sgs[0].n_node_pad,
            "n_shards": n_shards,
        }
        if halo:
            h_pad = max(g.halo_idx.shape[2] for g in sgs)
            halo_idx = np.zeros((bsz, n_shards, n_shards, h_pad), np.int32)
            for b, g in enumerate(sgs):
                halo_idx[b, :, :, : g.halo_idx.shape[2]] = g.halo_idx
            remap = np.stack([g.senders_remap for g in sgs])
            for b, g in enumerate(sgs):
                own = g.halo_idx.shape[2]
                if own != h_pad:
                    halo_slots = remap[b] >= ns
                    src = (remap[b] - ns) // own
                    pos = (remap[b] - ns) % own
                    remap[b] = np.where(
                        halo_slots, ns + src * h_pad + pos, remap[b]
                    )
            out["halo_idx"] = jnp.asarray(halo_idx)
            out["senders_remap"] = jnp.asarray(remap)
        return out

    def _build_overlap(self, raw, n_node, n_shards, bsz, part):
        """Two-pass [interior | boundary] partition: measure per-sample
        sizes, then rebuild batch-uniform."""
        probe = [part(s, t, n_node, n_shards) for s, t in raw]
        e_int = max(g.e_int for g in probe)
        e_bnd = max(g.senders.shape[1] - g.e_int for g in probe)
        k_int = max(g.t_int.shape[2] for g in probe)
        k_bnd = max(g.t_bnd.shape[2] for g in probe)
        h_pad = max(g.halo_idx.shape[2] for g in probe)
        sgs = [
            part(s, t, n_node, n_shards, e_int=e_int, e_bnd=e_bnd,
                 k_int=k_int, k_bnd=k_bnd, h_pad=h_pad)
            for s, t in raw
        ]
        ns = sgs[0].n_node_pad // n_shards
        shard_off = (np.arange(n_shards, dtype=np.int32) * ns)[None, :, None]
        senders = np.stack([g.senders for g in sgs])      # (B, G, Ei+Eb)
        recv_loc = np.stack([g.receivers_loc for g in sgs])
        remap = np.stack([g.senders_remap for g in sgs])
        mask = np.stack([g.edge_mask for g in sgs])
        recv_glob = recv_loc + shard_off
        c = e_int
        out = {
            "remap_int": jnp.asarray(remap[:, :, :c]),
            "recv_int": jnp.asarray(recv_loc[:, :, :c]),
            "mask_int": jnp.asarray(mask[:, :, :c]),
            "t_int": jnp.asarray(np.stack([g.t_int for g in sgs])),
            "remap_bnd": jnp.asarray(remap[:, :, c:]),
            "recv_bnd": jnp.asarray(recv_loc[:, :, c:]),
            "mask_bnd": jnp.asarray(mask[:, :, c:]),
            "t_bnd": jnp.asarray(np.stack([g.t_bnd for g in sgs])),
            "degree": jnp.asarray(np.stack([g.degree for g in sgs])),
            "halo_idx": jnp.asarray(np.stack([g.halo_idx for g in sgs])),
            # per-region GLOBAL edge endpoints for edge-feature builds
            "senders_flat_int": jnp.asarray(
                senders[:, :, :c].reshape(bsz, -1)),
            "receivers_flat_int": jnp.asarray(
                recv_glob[:, :, :c].reshape(bsz, -1)),
            "senders_flat_bnd": jnp.asarray(
                senders[:, :, c:].reshape(bsz, -1)),
            "receivers_flat_bnd": jnp.asarray(
                recv_glob[:, :, c:].reshape(bsz, -1)),
            "n_node": n_node,
            "n_node_pad": sgs[0].n_node_pad,
            "n_shards": n_shards,
        }
        return out

    # ---- device-side --------------------------------------------------
    def forward_partitioned(self, params, x_t, coords, cell, t, hr_last,
                            pg, mesh):
        from magnet_tpu.nn.graphnet import InteractionNetwork
        from magnet_tpu.parallel.graph_partition import (
            interaction_step_halo,
            interaction_step_halo_overlap,
            interaction_step_local,
            make_partitioned_processor,
            make_partitioned_processor_halo,
            make_partitioned_processor_halo_overlap,
        )

        core = self.core
        core_cls = type(core)
        apply = lambda method, *a: core.apply(params, *a, method=method)
        node_feats, hr_points, all_feats, all_coords = apply(
            "graph_pre", x_t, coords, cell, t
        )
        overlap = "t_int" in pg
        if overlap:
            ef_int_raw = core_cls.edge_features(
                all_feats, all_coords,
                pg["senders_flat_int"], pg["receivers_flat_int"],
            )
            ef_bnd_raw = core_cls.edge_features(
                all_feats, all_coords,
                pg["senders_flat_bnd"], pg["receivers_flat_bnd"],
            )
            n_int = ef_int_raw.shape[1]               # static (G * E_i)
            edge_feats = jnp.concatenate([ef_int_raw, ef_bnd_raw], axis=1)
        else:
            edge_feats = core_cls.edge_features(
                all_feats, all_coords, pg["senders_flat"],
                pg["receivers_flat"],
            )
        nf, ef = apply("graph_encode", node_feats, edge_feats)

        B = nf.shape[0]
        latent = nf.shape[-1]
        # static sizes derived from array SHAPES (the int entries in pg
        # become traced values when pg is a jit argument)
        tbl = pg["t_int"] if overlap else pg["table"]
        g_shards, ns = tbl.shape[1], tbl.shape[2]
        n_pad = g_shards * ns
        nf_pad = jnp.pad(nf, ((0, 0), (0, n_pad - nf.shape[1]), (0, 0)))
        if overlap:
            ef_int = ef[:, :n_int].reshape(B, g_shards, -1, latent)
            ef_bnd = ef[:, n_int:].reshape(B, g_shards, -1, latent)
        else:
            ef_sh = ef.reshape(B, g_shards, -1, latent)

        inet = InteractionNetwork(
            node_out=latent, edge_out=latent,
            mlp_layers=core.mlp_layers, mlp_hidden=core.mlp_hidden,
        )
        stacked = params["params"]["_processor"]["steps"]["step"]
        step_params = [
            {"params": jax.tree.map(lambda a: a[i], stacked)}
            for i in range(core.num_message_passing_steps)
        ]

        if overlap:
            def iapply_o(params_i, *a):
                return interaction_step_halo_overlap(inet, params_i, *a)

            runner = make_partitioned_processor_halo_overlap(
                iapply_o, core.num_message_passing_steps, mesh,
                batched_halo=True,
            )
            nf_out, _ = runner(
                step_params, nf_pad, ef_int, ef_bnd,
                pg["remap_int"], pg["recv_int"], pg["mask_int"], pg["t_int"],
                pg["remap_bnd"], pg["recv_bnd"], pg["mask_bnd"], pg["t_bnd"],
                pg["degree"], pg["halo_idx"],
            )
        elif "halo_idx" in pg:
            def iapply_h(params_i, x_local, x_ext, e, remap, recv_loc, mask,
                         table):
                return interaction_step_halo(
                    inet, params_i, x_local, x_ext, e, remap, recv_loc,
                    mask, table,
                )

            runner = make_partitioned_processor_halo(
                iapply_h, core.num_message_passing_steps, mesh,
                batched_halo=True,
            )
            nf_out, _ = runner(
                step_params, nf_pad, ef_sh,
                pg["senders_remap"], pg["recv_loc"], pg["mask"], pg["table"],
                pg["halo_idx"],
            )
        else:
            def iapply(params_i, x_full, e, senders, recv_loc, mask, table):
                return interaction_step_local(
                    inet, params_i, x_full, e, senders, recv_loc, mask, table
                )

            runner = make_partitioned_processor(
                iapply, core.num_message_passing_steps, mesh
            )
            nf_out, _ = runner(
                step_params, nf_pad, ef_sh,
                pg["senders"], pg["recv_loc"], pg["mask"], pg["table"],
            )
        nf_out = nf_out[:, : nf.shape[1]]
        ret = apply("graph_decode", nf_out)
        return core_cls.assemble_outputs(ret, x_t, hr_points, hr_last, t)

    def loss_partitioned(self, params, batch, pg, mesh, rng=None,
                         train: bool = True):
        ts = self.time_slice
        u, uv = batch["lr_frames"], batch["hr_points"]
        t = batch["t"]
        nt = u.shape[1]
        n_win = (nt - ts) // ts
        used = (n_win + 1) * ts
        qk = self._pp_query_key()

        inp = u[:, :ts]
        hr_last = uv[:, ts - 1]
        hr_hat, lr_hat, pts = [], [], []
        for i in range(n_win):
            tw = t[:, i * ts : (i + 2) * ts]
            out_hr, out_lr, hr_pts = self.forward_partitioned(
                params, inp, batch[qk], batch["cells"], tw, hr_last, pg, mesh
            )
            hr_hat.append(out_hr)
            lr_hat.append(out_lr)
            pts.append(hr_pts)
            if self.teacher_forcing and train:
                inp = u[:, (i + 1) * ts : (i + 2) * ts]
                hr_last = uv[:, (i + 2) * ts - 1]
            else:
                inp = self._pp_feedback(out_lr)
                hr_last = out_hr[:, -1]
        hr_hat = jnp.concatenate(hr_hat, axis=1)
        lr_hat = jnp.concatenate(lr_hat, axis=1)
        pts = jnp.concatenate(pts, axis=1)

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
