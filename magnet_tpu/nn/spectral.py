"""Spectral convolutions for the FNO baselines (XLA FFT on TPU).

Reference: models/fno_1d.py:13-59 and models/fno_2d.py:11-47 (cuFFT there,
``jnp.fft`` -> XLA FFT here).  Complex weights are stored as separate
real/imag parameters (TPU has no complex params) initialized like
``torch.rand(dtype=cfloat)``: real and imag each ~ U(0,1) * scale.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as fnn


def _rand_uniform(scale):
    def init(key, shape, dtype=jnp.float32):
        return scale * jax.random.uniform(key, shape, dtype)

    return init


class SpectralConv1d(fnn.Module):
    """rfft -> per-mode complex channel mix -> irfft.  Input (B, C, L)."""

    in_channels: int
    out_channels: int
    modes: int

    @fnn.compact
    def __call__(self, x):
        scale = 1.0 / (self.in_channels * self.out_channels)
        shape = (self.in_channels, self.out_channels, self.modes)
        wr = self.param("weights_real", _rand_uniform(scale), shape)
        wi = self.param("weights_imag", _rand_uniform(scale), shape)
        w = wr + 1j * wi

        l = x.shape[-1]
        x_ft = jnp.fft.rfft(x)                               # (B, C, L//2+1)
        out_modes = jnp.einsum("bix,iox->box", x_ft[:, :, : self.modes], w)
        out_ft = jnp.zeros(
            (x.shape[0], self.out_channels, l // 2 + 1), dtype=out_modes.dtype
        )
        out_ft = out_ft.at[:, :, : self.modes].set(out_modes)
        return jnp.fft.irfft(out_ft, n=l)


class SpectralConv2d(fnn.Module):
    """2D variant with the ±modes1 corner blocks (reference fno_2d.py:39-43).

    Input (B, C, H, W).
    """

    in_channels: int
    out_channels: int
    modes1: int
    modes2: int

    @fnn.compact
    def __call__(self, x):
        scale = 1.0 / (self.in_channels * self.out_channels)
        shape = (self.in_channels, self.out_channels, self.modes1, self.modes2)
        w1r = self.param("weights1_real", _rand_uniform(scale), shape)
        w1i = self.param("weights1_imag", _rand_uniform(scale), shape)
        w2r = self.param("weights2_real", _rand_uniform(scale), shape)
        w2i = self.param("weights2_imag", _rand_uniform(scale), shape)
        w1 = w1r + 1j * w1i
        w2 = w2r + 1j * w2i

        b, c, h, wd = x.shape
        x_ft = jnp.fft.rfft2(x)                              # (B, C, H, W//2+1)
        m1, m2 = self.modes1, self.modes2
        top = jnp.einsum("bixy,ioxy->boxy", x_ft[:, :, :m1, :m2], w1)
        bot = jnp.einsum("bixy,ioxy->boxy", x_ft[:, :, -m1:, :m2], w2)
        out_ft = jnp.zeros(
            (b, self.out_channels, h, wd // 2 + 1), dtype=top.dtype
        )
        out_ft = out_ft.at[:, :, :m1, :m2].set(top)
        out_ft = out_ft.at[:, :, -m1:, :m2].set(bot)
        return jnp.fft.irfft2(out_ft, s=(h, wd))
