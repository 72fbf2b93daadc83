"""Shared coordinate helpers and small utilities.

TPU-native re-design of the reference helpers in ``utils.py`` of jaggbow/magnet
(see /root/reference/utils.py:5-71). Everything here is pure ``jax.numpy`` /
``numpy`` — no torch.
"""
from __future__ import annotations

import logging
import os
from typing import Sequence

import jax.numpy as jnp
import numpy as np


def to_coords(x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Space-time coordinate grid X of shape [time, space, 2] with
    X[..., 0] = space, X[..., 1] = time (reference utils.py:5-17)."""
    x_, t_ = jnp.meshgrid(jnp.asarray(x), jnp.asarray(t), indexing="ij")
    return jnp.stack((x_.T, t_.T), axis=-1)


def make_coord(shape: Sequence[int], ranges=None, flatten: bool = True) -> jnp.ndarray:
    """Coordinates at grid cell centers in [-1, 1] (reference utils.py:19-35).

    For ``shape=[n]`` returns ``(n, 1)``; for ``shape=[h, w]`` returns
    ``(h*w, 2)`` (or ``(h, w, 2)`` when ``flatten=False``) with 'ij' indexing,
    matching ``torch.meshgrid`` default.
    """
    coord_seqs = []
    for i, n in enumerate(shape):
        if ranges is None:
            v0, v1 = -1.0, 1.0
        else:
            v0, v1 = ranges[i]
        r = (v1 - v0) / (2 * n)
        seq = v0 + r + (2 * r) * np.arange(n, dtype=np.float32)
        coord_seqs.append(seq)
    grids = np.meshgrid(*coord_seqs, indexing="ij")
    ret = np.stack(grids, axis=-1).astype(np.float32)
    if flatten:
        ret = ret.reshape(-1, ret.shape[-1])
    return jnp.asarray(ret)


def make_coord_np(shape: Sequence[int], ranges=None, flatten: bool = True) -> np.ndarray:
    """Numpy variant of :func:`make_coord` for host-side pipelines."""
    coord_seqs = []
    for i, n in enumerate(shape):
        if ranges is None:
            v0, v1 = -1.0, 1.0
        else:
            v0, v1 = ranges[i]
        r = (v1 - v0) / (2 * n)
        coord_seqs.append(v0 + r + (2 * r) * np.arange(n, dtype=np.float32))
    grids = np.meshgrid(*coord_seqs, indexing="ij")
    ret = np.stack(grids, axis=-1).astype(np.float32)
    if flatten:
        ret = ret.reshape(-1, ret.shape[-1])
    return ret


def to_pixel_samples(img: np.ndarray):
    """Convert an image ``(C, L)`` or ``(C, H, W)`` to (coords, values).

    Mirrors reference utils.py:60-71 — including the quirk that the 3-D branch
    also builds coords only from the last axis (callers only use the value
    part for 3-D inputs, reference dataset_2d.py:183).
    """
    coord = make_coord_np(img.shape[-1:])
    vals = img.reshape(img.shape[0], -1).T
    return coord, vals


def get_logger(name: str = __name__, rank: int | None = None) -> logging.Logger:
    """Process-0-only logger (reference utils.py:37-58 used Lightning's
    rank_zero_only; here we gate on ``jax.process_index``)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("[%(asctime)s][%(name)s][%(levelname)s] %(message)s")
        )
        logger.addHandler(handler)
        logger.setLevel(os.environ.get("MAGNET_TPU_LOGLEVEL", "INFO"))
    if rank is None:
        try:
            import jax

            rank = jax.process_index()
        except Exception:  # pragma: no cover - before backend init
            rank = 0
    if rank != 0:
        logger.setLevel(logging.ERROR)
    return logger


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
