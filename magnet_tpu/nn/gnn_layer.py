"""Brandstetter-style MPNN message-passing layer (reference models/mpnn.py:27-90,
models/mpnn_2d.py:27-90) plus the time-window-keyed 1D-CNN decoder tables
(mpnn.py:140-163 / mpnn_2d.py:138-163).

Single-sample layout: nodes (N, C); vmap over batch.  Aggregation is
gather-table masked mean; normalization is per-graph InstanceNorm
(segment_instance_norm) as in the reference's ``self.norm(x, batch)``.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as fnn

from magnet_tpu.nn.core import Linear, swish
from magnet_tpu.ops.segment import aggregate_mean_graph, gather_nodes, segment_instance_norm


class MPNNLayer(fnn.Module):
    """One GNN_Layer: message MLP on (x_i, x_j, u_i-u_j, pos_i-pos_j, vars),
    update MLP on (x, mean_msg, vars), residual when in==out, then
    InstanceNorm over the graph's nodes.

    Setup-style: the staged methods (``project_recv``/``project_send``/
    ``message_tail``/``update_nodes``) are reused by the edge-partitioned
    execution path (parallel.graph_partition.mpnn_step_local)."""

    hidden_features: int
    out_features: int
    pos_dim: int = 1  # 1 for 1D, 2 for 2D
    time_window: int = 16  # u feature dim (needed for the torch init fan)

    def setup(self):
        from magnet_tpu.nn.core import torch_bias_init, torch_kernel_init_fan

        # message_net_1 over concat(x_i, x_j, u_i-u_j, pos_i-pos_j, v_i),
        # split into per-input chunks and pre-projected on the N-sized
        # arrays (same math as the reference's per-edge concat+Linear,
        # mpnn.py:51,77; init bound matches the unsplit torch Linear).
        fan = (2 * self.hidden_features + self.time_window + self.pos_dim + 1)
        kinit = torch_kernel_init_fan(fan)

        def dense(use_bias=False):
            return fnn.Dense(
                self.hidden_features, use_bias=use_bias, kernel_init=kinit,
                bias_init=torch_bias_init(fan),
            )

        self.msg1_xi = dense()
        self.msg1_xj = dense()
        self.msg1_u = dense()
        self.msg1_pos = dense()
        self.msg1_var = dense(use_bias=True)

        # message_net_2 as raw params (torch nn.Linear default init) so the
        # fused Pallas edge kernel can consume them directly
        hdim = self.hidden_features
        w2init = torch_kernel_init_fan(hdim)
        self.msg2_w = self.param("msg2_w", w2init, (hdim, hdim))
        self.msg2_b = self.param("msg2_b", w2init, (hdim,))
        self.upd1 = Linear(self.hidden_features)
        self.upd2 = Linear(self.out_features)

    # ---- staged pieces (reused by the partitioned execution path) -------
    def project_recv(self, x, u, pos, variables):
        """Per-node receiver-side projection (gathered at i)."""
        return (self.msg1_xi(x) + self.msg1_u(u) + self.msg1_pos(pos)
                + self.msg1_var(variables))

    def project_send(self, x, u, pos, variables):
        """Per-node sender-side projection (gathered at j)."""
        return self.msg1_xj(x) - self.msg1_u(u) - self.msg1_pos(pos)

    def message_tail(self, pre):
        """swish(pre) -> message_net_2 -> swish (reference mpnn.py:77-79)."""
        return swish(swish(pre) @ self.msg2_w + self.msg2_b)

    def update_nodes(self, x, agg, variables):
        """Update MLP + residual (when in == out)."""
        upd = jnp.concatenate([x, agg, variables], axis=-1)
        upd = swish(self.upd1(upd))
        upd = swish(self.upd2(upd))
        return x + upd if x.shape[-1] == self.out_features else upd

    def __call__(self, x, u, pos, variables, gs):
        p_xi = self.msg1_xi(x)
        p_xj = self.msg1_xj(x)
        p_u = self.msg1_u(u)
        p_p = self.msg1_pos(pos)
        p_v = self.msg1_var(variables)
        recv_side = p_xi + p_u + p_p + p_v                   # gathered at i
        send_side = p_xj - p_u - p_p                         # gathered at j
        hdim = self.hidden_features
        msg2_w, msg2_b = self.msg2_w, self.msg2_b

        import os

        if (gs.blk_recv_local is not None
                and not os.environ.get("MAGNET_TPU_NO_FUSED")):
            t, et = gs.blk_recv_local.shape
            n_pad = t * 128
            n = x.shape[0]
            pr = jnp.pad(recv_side, ((0, n_pad - n), (0, 0)))
            # v2r: both node gathers in-kernel on the ragged live-chunk
            # grid — no (E, H) array exists in HBM in either direction.
            # Gated on the sender-table VMEM budget (f32, in-kernel
            # d_send accumulator).
            from magnet_tpu.ops.pallas_kernels import DPXJ_TABLE_BYTES

            use_v2r = (
                gs.blk_snd2_tids is not None
                and gs.blk_chunk_ct is not None
                and n_pad * hdim * 4 <= DPXJ_TABLE_BYTES
                and not os.environ.get("MAGNET_TPU_NO_FUSED2")
            )
            if use_v2r:
                from magnet_tpu.ops.pallas_kernels import fused_mpnn_edge_agg2r

                pxj_pad = jnp.pad(send_side, ((0, n_pad - n), (0, 0)))
                sums = fused_mpnn_edge_agg2r(
                    pxj_pad, pr.reshape(t, 128, hdim), msg2_w, msg2_b,
                    gs.blk_snd2_tids, gs.blk_snd2_local,
                    gs.blk_recv_local, gs.edge_mask.reshape(t, et),
                    gs.blk_chunk_ct, gs.blk_chunk_cc, gs.blk_chunk_flag,
                )
            else:
                from magnet_tpu.ops.pallas_kernels import fused_mpnn_edge_agg

                h0 = gather_nodes(send_side, gs, "sender")   # (E, H)
                sums = fused_mpnn_edge_agg(
                    h0.reshape(t, et, hdim), pr.reshape(t, 128, hdim),
                    msg2_w, msg2_b,
                    gs.blk_recv_local, gs.edge_mask.reshape(t, et),
                )
            agg = sums.reshape(n_pad, hdim)[:n] / jnp.maximum(gs.degree, 1.0)
            agg = agg.astype(x.dtype)
        else:
            msg = swish(
                gather_nodes(recv_side, gs, "receiver")
                + gather_nodes(send_side, gs, "sender")
            )
            msg = swish(msg @ msg2_w + msg2_b)
            agg = aggregate_mean_graph(msg, gs)

        out = self.update_nodes(x, agg, variables)
        return segment_instance_norm(out)


class TemporalBundlingDecoder(fnn.Module):
    """The strided Conv1d pair mapping (N, hidden) -> (N, time_window).

    Table keyed on time_window exactly as the reference hand-picks kernel and
    stride (mpnn.py:140-163).  ``with_mid_swish`` distinguishes the 1D
    time_window==10 variant (no Swish between convs, mpnn.py:141-143) from
    the 2D one that has it (mpnn_2d.py:139-142).
    """

    time_window: int
    with_mid_swish: bool = True

    # (k1, s1, k2): Conv1d(1->8, k1, stride=s1) [Swish] Conv1d(8->1, k2, 1)
    TABLE = {
        10: (16, 6, 10),
        16: (16, 5, 8),
        20: (15, 4, 10),
        25: (16, 3, 14),
        50: (12, 2, 10),
    }

    @fnn.compact
    def __call__(self, h):
        """h: (N, hidden) -> (N, time_window)."""
        from magnet_tpu.nn.core import Conv

        k1, s1, k2 = self.TABLE[self.time_window]
        x = h[..., None]                                   # (N, hidden, 1) as (batch, length, chan)
        x = Conv(8, (k1,), strides=(s1,), padding="VALID")(x)
        if self.with_mid_swish:
            x = swish(x)
        x = Conv(1, (k2,), strides=(1,), padding="VALID")(x)
        return x[..., 0]                                   # (N, time_window)
