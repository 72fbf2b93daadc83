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

TPU-first notes:
* nearest-mode grid_sample (border padding, align_corners=False) reduces to
  one clamped integer gather; the sample index is the same for every
  timestep, so the reference's per-timestep ``F.grid_sample`` loop
  (magnet_cnn.py:268-278) collapses into a single gather;
* the per-tap / per-corner / per-neighbor python loops are vectorized into
  a stacked leading axis with ONE proj_head application — ~4x smaller
  compiled program and larger MXU matmuls than the reference's unrolled
  branches.

All modules are per-sample; vmap over batch.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from magnet_tpu.nn.core import MLP, LayerNorm, Linear
from magnet_tpu.ops.interp import _nearest_index
from magnet_tpu.utils import make_coord


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
        K = 2

        vx = jnp.asarray([-1.0, 1.0])                        # (2,)
        gx = jnp.clip(
            coord_hr[None, :, 0] + vx[:, None] * dx + 1e-6, -1 + 1e-6, 1 - 1e-6
        )                                                    # (2, N)
        idx = _nearest_index(gx, L).reshape(-1)              # (2N,)
        q_feat = jnp.take(feat, idx, axis=-1).T.reshape(K, N, -1)     # (2,N,Cf)
        q_coord = jnp.take(feat_coord, idx).reshape(K, N, 1)          # (2,N,1)
        q_inp = (
            jnp.take(x_t, idx, axis=-1)                      # (T, C, 2N)
            .reshape(T, C, K, N)
            .transpose(2, 3, 0, 1)                           # (2, N, T, C)
        )
        final_coord = (coord_hr[None] - q_coord) * L         # (2, N, 1)
        final_cell = jnp.broadcast_to(cell[None] * L, (K, N, 1))
        areas = jnp.abs(final_coord)[:, :, None, :]          # (2, N, 1, 1)

        def bt(a):                                           # (K,N,D)->(K,N,T,D)
            return jnp.broadcast_to(a[:, :, None, :], (K, N, T, a.shape[-1]))

        tcol = jnp.broadcast_to(t[:T][None, None, :, None], (K, N, T, 1))
        inp = jnp.concatenate(
            [bt(q_feat), q_inp, bt(final_coord), bt(final_cell), tcol], axis=-1
        )                                                    # (2, N, T, Cin)
        proj_head = fnn.Sequential(
            [MLP([self.mlp_hidden] * self.mlp_layers, self.n_chan), LayerNorm()]
        )
        preds = proj_head(inp)                               # (2, N, T, nc)

        # both 'interpolation' branches are identical in the reference
        num = preds[0] * areas[1] + preds[1] * areas[0]
        den = areas[1] + areas[0]
        # den == 0 iff both ±dx taps clip into the SAME cell, which happens
        # only when the query sits exactly on that cell's center at the mesh
        # edge (full-support eval, eval_support='full'); the blend is then
        # that cell's prediction.  where-in-where keeps grads NaN-free.
        safe = jnp.where(den > 0, den, 1.0)
        ret = jnp.where(den > 0, num / safe, preds[0])
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
        K = 4

        # corner order (vx, vy) = (-1,-1), (-1,1), (1,-1), (1,1) — matches
        # the reference's nested loops (magnet_cnn_2d.py:248-249)
        vx = jnp.asarray([-1.0, -1.0, 1.0, 1.0])
        vy = jnp.asarray([-1.0, 1.0, -1.0, 1.0])
        g0 = jnp.clip(
            coord_hr[None, :, 0] + vx[:, None] * dx + 1e-6, -1 + 1e-6, 1 - 1e-6
        )                                                    # (4, N)
        g1 = jnp.clip(
            coord_hr[None, :, 1] + vy[:, None] * dy + 1e-6, -1 + 1e-6, 1 - 1e-6
        )
        iy = _nearest_index(g0, H)
        ix = _nearest_index(g1, W)
        lin = (iy * W + ix).reshape(-1)                      # (4N,)

        feat_flat = feat.reshape(feat.shape[0], H * W)
        x_flat = x_t.reshape(T, C, H * W)
        q_feat = jnp.take(feat_flat, lin, axis=-1).T.reshape(K, N, -1)
        q_coord = jnp.take(feat_coord, lin, axis=0).reshape(K, N, 2)
        q_inp = (
            jnp.take(x_flat, lin, axis=-1)
            .reshape(T, C, K, N)
            .transpose(2, 3, 0, 1)                           # (4, N, T, C)
        )
        final_coord = (coord_hr[None] - q_coord) * W         # (4, N, 2)
        final_cell = jnp.broadcast_to(cell[None] * W, (K, N, 2))
        area = (
            jnp.abs(final_coord[..., 0] * final_coord[..., 1]) + 1e-9
        )[:, :, None]                                        # (4, N, 1)

        def bt(a):
            return jnp.broadcast_to(a[:, :, None, :], (K, N, T, a.shape[-1]))

        tcol = jnp.broadcast_to(t[:T][None, None, :, None], (K, N, T, 1))
        inp = jnp.concatenate(
            [bt(q_feat), q_inp, bt(final_coord), bt(final_cell), tcol], axis=-1
        )
        proj_head = fnn.Sequential(
            [MLP([self.mlp_hidden] * self.mlp_layers, self.n_chan), LayerNorm()]
        )
        preds = proj_head(inp)                               # (4, N, T, nc)

        tot = jnp.sum(area, axis=0)                          # (N, 1)
        # diagonal swap (reference magnet_cnn_2d.py:286-287)
        swapped = area[jnp.asarray([3, 2, 1, 0])]            # (4, N, 1)
        w = (swapped / tot[None])[:, :, None, :]             # (4, N, 1, 1)
        return jnp.sum(preds * w, axis=0)                    # (N, T, nc)


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
        N, K = nbr_idx.shape
        P = hr_coords.shape[-1]
        u = x_lr.transpose(2, 0, 1)                          # (L, T, C)

        idx = nbr_idx.T.reshape(-1)                          # (KN,) neighbor-major
        q_feat = jnp.take(lr_encoded, idx, axis=0).reshape(K, N, -1)
        q_inp = jnp.take(u, idx, axis=0).reshape(K, N, T, C)
        q_coord = jnp.take(lr_coords, idx, axis=0).reshape(K, N, P)
        final_coord = q_coord - hr_coords[None]              # (K, N, P)
        d2 = jnp.sum(final_coord**2, axis=-1, keepdims=True)  # (K, N, 1)
        if self.interpolation == "area":
            w = d2
        elif self.interpolation == "knn":
            # d2 == 0 exactly when a query coincides with its support node
            # (eval_support='full'); 1/0 = inf would make the blend below
            # inf/inf = NaN.  Guarded division — the degenerate case is
            # resolved by the where-in-where fallback on the blend.
            w = 1.0 / jnp.where(d2 > 0, d2, 1.0)
        elif self.interpolation == "sph":
            w = (1.0 - L * d2) ** 3
        else:
            raise ValueError(self.interpolation)
        weights = w[:, :, None, :]                           # (K, N, 1, 1)

        def bt(a):
            return jnp.broadcast_to(a[:, :, None, :], (K, N, T, a.shape[-1]))

        tcol = jnp.broadcast_to(t[:T][None, None, :, None], (K, N, T, 1))
        inp = jnp.concatenate([bt(q_feat), q_inp, bt(final_coord), tcol], axis=-1)
        latents = Linear(self.n_chan)(inp)                   # (K, N, T, nc)

        # blend of the FIRST TWO neighbors only (reference magnet_gnn.py:276-279)
        if self.interpolation == "area":
            num = latents[0] * weights[1] + latents[1] * weights[0]
        else:
            num = latents[0] * weights[0] + latents[1] * weights[1]
        den = weights[1] + weights[0]
        # Degenerate geometry (ADVICE r3): under eval_support='full' the
        # nearest support node coincides with the query (d2[0] == 0, so
        # 'knn' weights blow up), and duplicate mesh coordinates can zero
        # the 'area' denominator.  In both cases the exact limit is the
        # nearest neighbor's latent; where-in-where keeps grads NaN-free.
        d2_01 = d2[:2]                                       # (2, N, 1)
        degen = (jnp.min(d2_01, axis=0) <= 0)[:, None, :]    # (N, 1, 1)
        safe = jnp.where(den != 0, den, 1.0)
        nearest = jnp.where(d2_01[0] <= d2_01[1], 0, 1)[:, None, :]
        near_lat = jnp.where(nearest == 0, latents[0], latents[1])
        return jnp.where(degen, near_lat, num / safe)
