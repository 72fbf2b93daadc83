"""HDF5-backed datasets reproducing the reference reader semantics.

Eight dataset classes (4 per dimensionality), numpy-only (host side feeds
the TPU; h5py stays on CPU — SURVEY.md §2.2).  Schemas and sampling rules
follow the reference exactly:

1D (reference datamodule/dataset.py):
  * Dataset1D        -> (u, dx, dt)  for FNO            (dataset.py:204-256)
  * DatasetGraph1D   -> {u, x, t}    for MPNN           (dataset.py:12-51)
  * DatasetImplicit1D-> LR by linear F.interpolate(L//2), random HR pixel
    samples ('uniform' or 'boundary' softmax), make_coord cells, for
    MAgNet[CNN]                                          (dataset.py:126-200)
  * DatasetImplicitGNN1D -> LR by stride-2 subsampling, HR sampled from the
    odd complement, coords min-max normalized to [-1,1], for MAgNet[GNN]
                                                        (dataset.py:53-124)
2D (reference datamodule/dataset_2d.py): the four counterparts, with
  regular (meshgrid of x,y) vs stored-'coords' irregular meshes.

All __getitem__ return numpy dicts; coordinates always carry an explicit
trailing dim (N, P).  Randomness is drawn from a per-dataset Generator
reseedable via set_epoch() (JAX-friendly determinism; same distribution as
the reference's np.random.choice, not the same draws).
"""
from __future__ import annotations

import numpy as np
import h5py

from magnet_tpu.utils import make_coord_np
from magnet_tpu.ops.interp import interpolate_linear_1d, interpolate_bilinear_2d


def _np_linear_resize_1d(u: np.ndarray, size: int) -> np.ndarray:
    """torch F.interpolate(mode='linear', align_corners=False) on host."""
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        return np.asarray(interpolate_linear_1d(u, size))


def _np_bilinear_resize_2d(u: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        return np.asarray(interpolate_bilinear_2d(u, size))


class _H5Base:
    def __init__(self, path, mode, key, load_all=False):
        assert mode in ("train", "valid", "test")
        self.path = path
        self.mode = mode
        self.key = key
        self._f = h5py.File(path, "r")
        self.data = self._f[mode]
        self.rng = np.random.default_rng(0)
        if load_all:
            self.data = {k: self.data[k][:] for k in self.data.keys()}
            self._f.close()

    def set_epoch(self, seed: int):
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return self.data[self.key].shape[0]


# ---------------------------------------------------------------- 1D


class Dataset1D(_H5Base):
    """(u, dx, dt) triplets for FNO (reference dataset.py:204-256)."""

    def __init__(self, path, mode, nt, nx, load_all=False):
        super().__init__(path, mode, f"pde_{nt}-{nx}", load_all)

    def __getitem__(self, idx):
        u = np.asarray(self.data[self.key][idx], np.float32)
        x = np.asarray(self.data["x"][idx], np.float32)
        t = np.asarray(self.data["t"][idx], np.float32)
        return {
            "u": u,
            "dx": np.float32(x[1] - x[0]),
            "dt": np.float32(t[1] - t[0]),
        }


class DatasetGraph1D(_H5Base):
    """{u (N, T), x (N, 1), t (T,)} for MPNN (reference dataset.py:12-51)."""

    def __init__(self, path, mode, nt, nx, in_timesteps=16, radius=2, load_all=False):
        super().__init__(path, mode, f"pde_{nt}-{nx}", load_all)
        self.in_timesteps = in_timesteps
        self.radius = radius

    def __getitem__(self, idx):
        u = np.asarray(self.data[self.key][idx], np.float32)  # (T, N)
        x = np.asarray(self.data["x"][idx], np.float32)[:, None]
        t = np.asarray(self.data["t"][idx], np.float32)
        return {"u": u.T, "x": x, "t": t}


class DatasetImplicit1D(_H5Base):
    """MAgNet[CNN] samples (reference dataset.py:126-200).

    ``eval_support``: at eval time the reference hands the model a
    DOWN-sampled support (L//2 linear resize) and queries the full grid —
    i.e. the MAgNet rows of a cross-model table solve super-resolution
    while MPNN/FNO see the full-resolution field (not apples-to-apples,
    BASELINE.md E1 notes).  'full' makes support = query = the test mesh
    (the paper's "any mesh at test time" forecasting setting); 'lr' keeps
    the reference behavior.  Train mode is unaffected."""

    def __init__(self, path, mode, nt, nx, sampling="uniform", samples=256,
                 eval_support="lr", load_all=False):
        super().__init__(path, mode, f"pde_{nt}-{nx}", load_all)
        self.samples = samples
        self.sampling = sampling
        self.eval_support = eval_support

    def __getitem__(self, idx):
        t = np.asarray(self.data["t"][idx], np.float32)
        u_hr = np.asarray(self.data[self.key][idx], np.float32)[:, None, :]  # (T,1,L)
        T, _, L = u_hr.shape
        full = self.mode != "train" and self.eval_support == "full"
        u_lr = u_hr if full else _np_linear_resize_1d(u_hr, L // 2)

        full_coord = make_coord_np([L])                      # (L, 1)
        if self.mode == "train":
            if self.sampling == "uniform":
                sample_lst = np.sort(
                    self.rng.choice(L, self.samples, replace=False)
                )
            elif self.sampling == "boundary":
                logits = (np.abs(np.arange(L) - L // 2) / L) ** 2 / 0.1
                p = np.exp(logits - logits.max())
                p = p / p.sum()
                sample_lst = np.sort(
                    self.rng.choice(L, self.samples, p=p, replace=False)
                )
            else:
                raise ValueError(self.sampling)
        else:
            sample_lst = np.arange(L)

        hr_coord = full_coord[sample_lst]
        cell = np.full_like(hr_coord, 2.0 / L)
        hr_points = u_hr[:, 0, sample_lst][:, :, None]       # (T, n, 1)
        out = {
            "t": t,
            "lr_frames": u_lr,
            "hr_frames": u_hr,
            "hr_points": hr_points,
            "coords": hr_coord,
            "cells": cell,
        }
        if self.mode == "train":
            out["sample_idx"] = sample_lst.astype(np.int64)
        return out


class DatasetImplicitGNN1D(_H5Base):
    """MAgNet[GNN] samples (reference dataset.py:53-124).

    ``eval_support``: 'lr' = reference eval behavior (stride-2 support,
    odd-complement queries = super-resolution); 'full' = support and
    queries are both the whole test mesh (plain forecasting — the INR
    'area' blend degenerates cleanly to the coincident node's latent,
    nn/inr.py:203-206).  Train mode is unaffected."""

    def __init__(self, path, mode, nt, nx, sampling="uniform", samples=256,
                 eval_support="lr", load_all=False):
        super().__init__(path, mode, f"pde_{nt}-{nx}", load_all)
        self.samples = samples
        self.sampling = sampling
        self.eval_support = eval_support

    def __getitem__(self, idx):
        x = np.asarray(self.data["x"][idx], np.float32)
        x = 2 * (x - x.min()) / (x.max() - x.min()) - 1
        t = np.asarray(self.data["t"][idx], np.float32)
        u_hr = np.asarray(self.data[self.key][idx], np.float32)[:, None, :]  # (T,1,L)
        T, _, L = u_hr.shape
        full = self.mode != "train" and self.eval_support == "full"
        u_lr = u_hr if full else u_hr[:, :, ::2]
        lr_coord = (x if full else x[::2])[:, None]

        indices_left = np.setdiff1d(np.arange(L), np.arange(L)[::2])
        if self.mode == "train":
            sample_lst = np.sort(
                self.rng.choice(indices_left, self.samples, replace=False)
            )
        else:
            sample_lst = np.arange(L) if full else indices_left
        hr_coord = x[sample_lst][:, None]
        hr_points = u_hr[:, 0, sample_lst][:, :, None]

        out = {
            "t": t,
            "lr_frames": u_lr,
            "hr_frames": u_hr,
            "hr_points": hr_points,
            "coords_hr": hr_coord,
            "coords_lr": lr_coord,
        }
        if self.mode == "train":
            out["sample_idx"] = sample_lst.astype(np.int64)
        return out


# ---------------------------------------------------------------- 2D


class Dataset2D(_H5Base):
    """(u, dx, dy, dt) for FNO-2D (reference dataset_2d.py:213-264)."""

    def __init__(self, path, mode, nt, res, load_all=False):
        super().__init__(path, mode, f"pde_{nt}-{res}", load_all)

    def __getitem__(self, idx):
        u = np.asarray(self.data[self.key][idx], np.float32)
        return {
            "u": u,
            "dx": np.float32(self.data["dx"][idx][0]),
            "dy": np.float32(self.data["dy"][idx][0]),
            "dt": np.float32(self.data["dt"][idx][0]),
        }


class DatasetGraph2D(_H5Base):
    """{u (WW, T), x (WW, 2), t} for MPNN-2D (reference dataset_2d.py:12-59)."""

    def __init__(self, path, mode, nt, res, regular=True, load_all=False):
        super().__init__(path, mode, f"pde_{nt}-{res}", load_all)
        self.regular = regular

    def __getitem__(self, idx):
        u = np.asarray(self.data[self.key][idx], np.float32)   # (T, W, W) | (T, N)
        u = u.reshape(u.shape[0], -1).T                        # (N, T)
        if self.regular:
            x = np.asarray(self.data["x"][idx], np.float32)
            y = np.asarray(self.data["y"][idx], np.float32)
            coords = np.stack(np.meshgrid(x, y, indexing="ij"), -1).reshape(-1, 2)
        else:
            coords = np.asarray(self.data["coords"][idx], np.float32)
        t = np.asarray(self.data["t"][idx], np.float32)
        return {"u": u, "x": coords, "t": t}


class DatasetImplicit2D(_H5Base):
    """MAgNet[CNN] 2D samples (reference dataset_2d.py:142-210)."""

    def __init__(self, path, mode, nt, res, samples=256, eval_support="lr",
                 load_all=False):
        super().__init__(path, mode, f"pde_{nt}-{res}", load_all)
        self.samples = samples
        self.eval_support = eval_support

    def __getitem__(self, idx):
        t = np.asarray(self.data["t"][idx], np.float32)
        u_hr = np.asarray(self.data[self.key][idx], np.float32)[:, None]  # (T,1,W,W)
        T, _, W, _ = u_hr.shape
        full = self.mode != "train" and self.eval_support == "full"
        u_lr = u_hr if full else _np_bilinear_resize_2d(u_hr, (W // 2, W // 2))

        full_coord = make_coord_np([W, W])                    # (W*W, 2)
        if self.mode == "train":
            sample_lst = np.sort(self.rng.choice(W * W, self.samples, replace=False))
        else:
            sample_lst = np.arange(W * W)
        hr_coord = full_coord[sample_lst]
        cell = np.full_like(hr_coord, 2.0 / W)
        hr_points = u_hr.reshape(T, -1)[:, sample_lst][:, :, None]

        out = {
            "t": t,
            "lr_frames": u_lr,
            "hr_frames": u_hr,
            "hr_points": hr_points,
            "coords": hr_coord,
            "cells": cell,
        }
        if self.mode == "train":
            out["sample_idx"] = sample_lst.astype(np.int64)
        return out


class DatasetImplicitGNN2D(_H5Base):
    """MAgNet[GNN] 2D samples (reference dataset_2d.py:61-140)."""

    def __init__(self, path, mode, nt, res, regular=True, samples=256,
                 eval_support="lr", load_all=False, n_nodes=None):
        key_res = res if regular or n_nodes is None else n_nodes
        super().__init__(path, mode, f"pde_{nt}-{key_res}", load_all)
        self.regular = regular
        self.samples = samples
        self.eval_support = eval_support

    def __getitem__(self, idx):
        if self.regular:
            x = np.asarray(self.data["x"][idx], np.float32)
            y = np.asarray(self.data["y"][idx], np.float32)
            coords = np.stack(np.meshgrid(x, y, indexing="ij"), -1).reshape(-1, 2)
            u_hr = np.asarray(self.data[self.key][idx], np.float32)
            u_hr = u_hr.reshape(u_hr.shape[0], 1, -1)         # (T, 1, N)
        else:
            coords = np.asarray(self.data["coords"][idx], np.float32)
            u_hr = np.asarray(self.data[self.key][idx], np.float32)[:, None]  # (T,1,N)
        coords = (
            2 * (coords - coords.min(0)) / (coords.max(0) - coords.min(0)) - 1
        ).astype(np.float32)
        t = np.asarray(self.data["t"][idx], np.float32)

        T, _, N = u_hr.shape
        full = self.mode != "train" and self.eval_support == "full"
        u_lr = u_hr if full else u_hr[:, :, ::2]
        lr_coord = coords if full else coords[::2]

        indices_left = np.setdiff1d(np.arange(N), np.arange(N)[::2])
        if self.mode == "train":
            sample_lst = np.sort(
                self.rng.choice(indices_left, self.samples, replace=False)
            )
        else:
            sample_lst = np.arange(N) if full else indices_left
        hr_coord = coords[sample_lst]
        hr_points = u_hr[:, 0, sample_lst][:, :, None]

        out = {
            "t": t,
            "lr_frames": u_lr,
            "hr_frames": u_hr,
            "hr_points": hr_points,
            "coords_hr": hr_coord,
            "coords_lr": lr_coord,
        }
        if self.mode == "train":
            out["sample_idx"] = sample_lst.astype(np.int64)
        return out
