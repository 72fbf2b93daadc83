"""Interpolation / sampling ops matching torch semantics, as pure gathers.

``F.grid_sample(mode='nearest', padding_mode='border',
align_corners=False)`` — used by the INR decoders (reference
models/magnet_cnn.py:257-271, models/magnet_cnn_2d.py:257-276) — reduces to
clamped integer gathers; no kernel needed on TPU.

``F.interpolate(mode='linear'/'bilinear', align_corners=False)`` — used for
LR frame construction and validation feedback (reference
datamodule/dataset.py:161, models/magnet_cnn.py:459) — is implemented with
half-pixel-center linear resampling without antialiasing, exactly matching
torch.
"""
from __future__ import annotations

import jax.numpy as jnp


def _nearest_index(gx: jnp.ndarray, n: int) -> jnp.ndarray:
    """Map normalized coord in [-1,1] to nearest pixel index with border
    padding, align_corners=False.  torch rounds with nearbyint (half-to-even)
    after clipping the float coordinate; jnp.round is also half-to-even."""
    ix = ((gx + 1.0) * n - 1.0) / 2.0
    ix = jnp.clip(ix, 0.0, n - 1.0)
    return jnp.round(ix).astype(jnp.int32)


def grid_sample_nearest_1d(feat: jnp.ndarray, gx: jnp.ndarray) -> jnp.ndarray:
    """feat: (C, L), gx: (N,) normalized x in [-1,1] -> (N, C)."""
    idx = _nearest_index(gx, feat.shape[-1])
    return jnp.take(feat, idx, axis=-1).T


def grid_sample_nearest_2d(
    feat: jnp.ndarray, g_row: jnp.ndarray, g_col: jnp.ndarray
) -> jnp.ndarray:
    """feat: (C, H, W); g_row/g_col: (N,) normalized coords for the H and W
    axes respectively -> (N, C).

    Note: callers pass coordinates in the reference's (dim0, dim1) = (row,
    col) convention; the reference's ``coord.flip(-1)`` before grid_sample
    (magnet_cnn_2d.py:257) is already accounted for here.
    """
    c, h, w = feat.shape
    iy = _nearest_index(g_row, h)
    ix = _nearest_index(g_col, w)
    flat = feat.reshape(c, h * w)
    return jnp.take(flat, iy * w + ix, axis=-1).T


def interpolate_linear_1d(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """x: (..., L) -> (..., size); torch F.interpolate(mode='linear',
    align_corners=False) — half-pixel centers, no antialias, edge clamp."""
    l = x.shape[-1]
    scale = l / size
    pos = (jnp.arange(size, dtype=jnp.float32) + 0.5) * scale - 0.5
    lo = jnp.floor(pos)
    frac = pos - lo
    lo_i = jnp.clip(lo.astype(jnp.int32), 0, l - 1)
    hi_i = jnp.clip(lo_i + 1, 0, l - 1)
    # torch clamps the *source position* at the left edge (pos<0 -> frac
    # applied to duplicated first pixel); clamping indices matches because
    # both taps then read the same pixel.
    frac = jnp.where(pos < 0, 0.0, frac)
    return x[..., lo_i] * (1.0 - frac) + x[..., hi_i] * frac


def interpolate_bilinear_2d(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """x: (..., H, W) -> (..., size[0], size[1]); torch bilinear,
    align_corners=False, no antialias."""
    out = interpolate_linear_1d(x, size[1])                 # cols
    out = jnp.swapaxes(out, -1, -2)
    out = interpolate_linear_1d(out, size[0])               # rows
    return jnp.swapaxes(out, -1, -2)
