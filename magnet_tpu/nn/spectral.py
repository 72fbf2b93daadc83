"""Spectral convolutions for the FNO baselines (XLA FFT on TPU).

Reference: models/fno_1d.py:13-59 and models/fno_2d.py:11-47 (cuFFT there,
``jnp.fft`` -> XLA FFT here).  Complex weights are stored as separate
real/imag parameters initialized like ``torch.rand(dtype=cfloat)``: real
and imag each ~ U(0,1) * scale.

TPU note: the mode-mixing contraction is computed in REAL arithmetic
(4 f32 einsums per block, (a+bi)(c+di) = (ac-bd) + (ad+bc)i) — complex
matmuls are unsupported on the TPU backend and real einsums ride the MXU.
The FFTs themselves run complex (supported).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as fnn


def _rand_uniform(scale):
    def init(key, shape, dtype=jnp.float32):
        return scale * jax.random.uniform(key, shape, dtype)

    return init


def _cmul_einsum(eq, xr, xi, wr, wi):
    """Complex contraction via real einsums: (xr+ixi) . (wr+iwi)."""
    rr = jnp.einsum(eq, xr, wr)
    ii = jnp.einsum(eq, xi, wi)
    ri = jnp.einsum(eq, xr, wi)
    ir = jnp.einsum(eq, xi, wr)
    return rr - ii, ri + ir


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

        l = x.shape[-1]
        x_ft = jnp.fft.rfft(x)                               # (B, C, L//2+1)
        xr = jnp.real(x_ft[:, :, : self.modes])
        xi = jnp.imag(x_ft[:, :, : self.modes])
        outr, outi = _cmul_einsum("bix,iox->box", xr, xi, wr, wi)
        pad = l // 2 + 1 - self.modes
        outr = jnp.pad(outr, ((0, 0), (0, 0), (0, pad)))
        outi = jnp.pad(outi, ((0, 0), (0, 0), (0, pad)))
        return jnp.fft.irfft(jax.lax.complex(outr, outi), n=l)


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

        b, c, h, wd = x.shape
        x_ft = jnp.fft.rfft2(x)                              # (B, C, H, W//2+1)
        m1, m2 = self.modes1, self.modes2
        wlen = wd // 2 + 1

        tr, ti = _cmul_einsum(
            "bixy,ioxy->boxy",
            jnp.real(x_ft[:, :, :m1, :m2]), jnp.imag(x_ft[:, :, :m1, :m2]),
            w1r, w1i,
        )
        br_, bi_ = _cmul_einsum(
            "bixy,ioxy->boxy",
            jnp.real(x_ft[:, :, -m1:, :m2]), jnp.imag(x_ft[:, :, -m1:, :m2]),
            w2r, w2i,
        )
        # assemble (B, Cout, H, wlen): top block rows [0, m1), bottom rows
        # [h-m1, h), cols [0, m2)
        mid = h - 2 * m1
        outr = jnp.concatenate(
            [
                jnp.pad(tr, ((0, 0), (0, 0), (0, 0), (0, wlen - m2))),
                jnp.zeros((b, self.out_channels, mid, wlen), tr.dtype),
                jnp.pad(br_, ((0, 0), (0, 0), (0, 0), (0, wlen - m2))),
            ],
            axis=2,
        )
        outi = jnp.concatenate(
            [
                jnp.pad(ti, ((0, 0), (0, 0), (0, 0), (0, wlen - m2))),
                jnp.zeros((b, self.out_channels, mid, wlen), ti.dtype),
                jnp.pad(bi_, ((0, 0), (0, 0), (0, 0), (0, wlen - m2))),
            ],
            axis=2,
        )
        return jnp.fft.irfft2(jax.lax.complex(outr, outi), s=(h, wd))
