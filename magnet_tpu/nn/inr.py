"""Implicit-neural-representation (INR) continuous decoders.

Three flavors, matching the reference exactly (including its quirks):

* ``INRDecoder1D`` — MAgNet[CNN] 1D: two-tap (±dx) nearest grid-sample with
  area-weighted blend (reference magnet_cnn.py:225-285; both branches of the
  ``interpolation`` flag are identical there, magnet_cnn.py:281-284).
* ``INRDecoder2D`` — MAgNet[CNN] 2D: four-corner nearest sample; the areas
  list is diagonally swapped before blending (the LIIF local-ensemble trick,
  reference magnet_cnn_2d.py:286-287) — replicated.
* ``KNNDecoder`` — MAgNet[GNN]: k-NN latent interpolation; although
  ``codec_neighbors`` latents are computed, the blend uses only neighbors 0
  and 1 (reference magnet_gnn.py:276-279) — replicated.

TPU-first notes: nearest-mode grid_sample (border padding,
align_corners=False) reduces to one clamped integer gather; the sample index
is the same for every timestep, so the reference's per-timestep
``F.grid_sample`` loop (magnet_cnn.py:268-278) collapses into a single
gather + one big proj_head matmul over all (N, T) query points.

All modules are per-sample; vmap over batch.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as fnn

from magnet_tpu.nn.core import MLP, LayerNorm, Linear
from magnet_tpu.ops.interp import _nearest_index
from magnet_tpu.utils import make_coord


def _bcast_t(x, T):
    """(N, C) -> (N, T, C)."""
    n, c = x.shape
    return jnp.broadcast_to(x[:, None, :], (n, T, c))


class INRDecoder1D(fnn.Module):
    """Args (per sample): x_t (T, C, L), feat (Cf, L), cell (N, 1),
    coord_hr (N, 1), t (T_total,).  Returns (N, T, n_chan)."""

    n_chan: int
    mlp_layers: int
    mlp_hidden: int

    @fnn.compact
    def __call__(self, x_t, feat, cell, coord_hr, t):
        T, C, L = x_t.shape
        N = coord_hr.shape[0]
        feat_coord = make_coord([L])[:, 0]                   # (L,)
        dx = 1.0 / L
        tcol = jnp.broadcast_to(t[:T][None, :, None], (N, T, 1))

        proj_head = fnn.Sequential(
            [MLP([self.mlp_hidden] * self.mlp_layers, self.n_chan), LayerNorm()]
        )

        preds, areas = [], []
        for vx in (-1.0, 1.0):
            gx = jnp.clip(coord_hr[:, 0] + vx * dx + 1e-6, -1 + 1e-6, 1 - 1e-6)
            idx = _nearest_index(gx, L)                      # (N,)
            q_feat = jnp.take(feat, idx, axis=-1).T          # (N, Cf)
            q_coord = jnp.take(feat_coord, idx)[:, None]     # (N, 1)
            q_inp = jnp.take(x_t, idx, axis=-1)              # (T, C, N)
            q_inp = q_inp.transpose(2, 0, 1)                 # (N, T, C)
            final_coord = (coord_hr - q_coord) * L           # (N, 1)
            final_cell = cell * L                            # (N, 1)
            areas.append(jnp.abs(final_coord)[:, None, :])   # (N, 1, 1)

            inp = jnp.concatenate(
                [
                    _bcast_t(q_feat, T),
                    q_inp,
                    _bcast_t(final_coord, T),
                    _bcast_t(final_cell, T),
                    tcol,
                ],
                axis=-1,
            )                                                # (N, T, Cf+C+3)
            preds.append(proj_head(inp))                     # (N, T, n_chan)

        # both 'interpolation' branches are identical in the reference
        ret = (preds[0] * areas[1] + preds[1] * areas[0]) / (areas[1] + areas[0])
        return ret


class INRDecoder2D(fnn.Module):
    """Args (per sample): x_t (T, C, W, W), feat (Cf, W, W), cell (N, 2),
    coord_hr (N, 2), t (T_total,).  Returns (N, T, n_chan)."""

    n_chan: int
    mlp_layers: int
    mlp_hidden: int

    @fnn.compact
    def __call__(self, x_t, feat, cell, coord_hr, t):
        T, C, H, W = x_t.shape
        N = coord_hr.shape[0]
        fc = make_coord([W, W], flatten=False)               # (W, W, 2)
        feat_coord = fc.reshape(W * W, 2)                    # row-major
        dx = 1.0 / W
        dy = 1.0 / W
        tcol = jnp.broadcast_to(t[:T][None, :, None], (N, T, 1))

        proj_head = fnn.Sequential(
            [MLP([self.mlp_hidden] * self.mlp_layers, self.n_chan), LayerNorm()]
        )

        feat_flat = feat.reshape(feat.shape[0], H * W)       # (Cf, HW)
        x_flat = x_t.reshape(T, C, H * W)                    # (T, C, HW)

        preds, areas = [], []
        for vx in (-1.0, 1.0):
            for vy in (-1.0, 1.0):
                g0 = jnp.clip(coord_hr[:, 0] + vx * dx + 1e-6, -1 + 1e-6, 1 - 1e-6)
                g1 = jnp.clip(coord_hr[:, 1] + vy * dy + 1e-6, -1 + 1e-6, 1 - 1e-6)
                # reference flips coords before grid_sample so that dim0
                # indexes H and dim1 indexes W (magnet_cnn_2d.py:257)
                iy = _nearest_index(g0, H)
                ix = _nearest_index(g1, W)
                lin = iy * W + ix                            # (N,)
                q_feat = jnp.take(feat_flat, lin, axis=-1).T         # (N, Cf)
                q_coord = jnp.take(feat_coord, lin, axis=0)          # (N, 2)
                q_inp = jnp.take(x_flat, lin, axis=-1).transpose(2, 0, 1)  # (N, T, C)
                final_coord = (coord_hr - q_coord) * W               # (N, 2)
                final_cell = cell * W
                area = jnp.abs(final_coord[:, 0] * final_coord[:, 1]) + 1e-9
                areas.append(area[:, None])                          # (N, 1)

                inp = jnp.concatenate(
                    [
                        _bcast_t(q_feat, T),
                        q_inp,
                        _bcast_t(final_coord, T),
                        _bcast_t(final_cell, T),
                        tcol,
                    ],
                    axis=-1,
                )
                preds.append(proj_head(inp))                         # (N, T, n_chan)

        tot = areas[0] + areas[1] + areas[2] + areas[3]              # (N, 1)
        # diagonal swap (reference magnet_cnn_2d.py:286-287)
        areas = [areas[3], areas[2], areas[1], areas[0]]
        ret = 0.0
        for pred, area in zip(preds, areas):
            ret = ret + pred * (area / tot)[:, None, :]
        return ret


class KNNDecoder(fnn.Module):
    """MAgNet[GNN] continuous decoder (reference magnet_gnn.py:224-283).

    k-NN indices are precomputed host-side (neighbors sorted by ascending
    distance, torch_cluster parity).  proj_head input dim is
    ``latent + C + pos_dim + 1`` (the reference hardcodes latent_dim+4,
    which equals this for its shipped 2D configs; generalized here so 1D
    works too).

    Args (per sample):
      x_lr (T, C, L), lr_encoded (L, latent), lr_coords (L, P),
      hr_coords (N, P), t (T_total,), nbr_idx (N, k) int32.
    Returns (N, T, n_chan).
    """

    n_chan: int
    codec_neighbors: int
    interpolation: str = "area"  # 'area' | 'knn' | 'sph'

    @fnn.compact
    def __call__(self, x_lr, lr_encoded, lr_coords, hr_coords, t, nbr_idx):
        T, C, L = x_lr.shape
        N = hr_coords.shape[0]
        tcol = jnp.broadcast_to(t[:T][None, :, None], (N, T, 1))
        proj_head = Linear(self.n_chan)

        u = x_lr.transpose(2, 0, 1)                          # (L, T, C)

        latents, weights = [], []
        for j in range(self.codec_neighbors):
            idx = nbr_idx[:, j]                              # (N,)
            q_feat = jnp.take(lr_encoded, idx, axis=0)       # (N, latent)
            q_inp = jnp.take(u, idx, axis=0)                 # (N, T, C)
            q_coord = jnp.take(lr_coords, idx, axis=0)       # (N, P)
            final_coord = q_coord - hr_coords                # (N, P)
            d2 = jnp.sum(final_coord**2, axis=-1, keepdims=True)  # (N, 1)
            if self.interpolation == "area":
                w = d2
            elif self.interpolation == "knn":
                w = 1.0 / d2
            elif self.interpolation == "sph":
                w = (1.0 - L * d2) ** 3
            else:
                raise ValueError(self.interpolation)
            inp = jnp.concatenate(
                [_bcast_t(q_feat, T), q_inp, _bcast_t(final_coord, T), tcol],
                axis=-1,
            )                                                # (N, T, latent+C+P+1)
            latents.append(proj_head(inp))                   # (N, T, n_chan)
            weights.append(w[:, None, :])                    # (N, 1, 1)

        # blend of the FIRST TWO neighbors only (reference magnet_gnn.py:276-279)
        if self.interpolation == "area":
            out = (latents[0] * weights[1] + latents[1] * weights[0]) / (
                weights[1] + weights[0]
            )
        else:
            out = (latents[0] * weights[0] + latents[1] * weights[1]) / (
                weights[1] + weights[0]
            )
        return out
