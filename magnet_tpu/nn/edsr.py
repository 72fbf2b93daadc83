"""EDSR super-resolution backbone without upsampling (reference
models/backbones/edsr.py:3-59), feature-last layout for TPU.

Input:  1d mode: (..., L, C_in);  2d mode: (..., H, W, C_in)
Output: same spatial dims with n_chan channels.

Note the reference instantiates ``ResBlock(n_chan, kernel_size, res_scale,
mode=mode)`` *positionally*, so ``res_scale`` actually lands in the ``bias``
argument (edsr.py:43,47) and the block's res_scale stays at its default 1.
With the shipped configs (res_scale=1) both readings coincide; we implement
the written semantics (bias=bool(res_scale), block res_scale=1).
"""
from __future__ import annotations

from flax import linen as fnn
import jax

from magnet_tpu.nn.core import Conv


class ResBlock(fnn.Module):
    n_chan: int
    kernel_size: int
    ndim: int = 1
    res_scale: float = 1.0

    @fnn.compact
    def __call__(self, x):
        k = (self.kernel_size,) * self.ndim
        out = Conv(self.n_chan, k)(x)
        out = jax.nn.relu(out)
        out = Conv(self.n_chan, k)(out)
        return (out + x) * self.res_scale


class _ResStep(fnn.Module):
    n_chan: int
    kernel_size: int
    ndim: int

    @fnn.compact
    def __call__(self, res, _):
        res = ResBlock(self.n_chan, self.kernel_size, self.ndim)(res)
        return res, None


class EDSR(fnn.Module):
    """Residual blocks run as a ``lax.scan`` over stacked per-block params
    (all blocks are identical in shape — reference edsr.py:43) so the
    compiled program holds one block instead of up to 16."""

    n_chan: int = 64
    res_layers: int = 16
    kernel_size: int = 3
    res_scale: float = 1.0
    ndim: int = 1

    @fnn.compact
    def __call__(self, x):
        k = (self.kernel_size,) * self.ndim
        x = Conv(self.n_chan, k)(x)
        scan = fnn.scan(
            _ResStep,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.res_layers,
        )(self.n_chan, self.kernel_size, self.ndim, name="res_layers")
        res, _ = scan(x, None)
        res = Conv(self.n_chan, k)(res)
        return res + x
