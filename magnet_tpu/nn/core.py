"""Core neural building blocks with torch-default initialization parity.

The reference's numerics depend on PyTorch defaults; to make per-layer
activation parity (BASELINE.md "allclose") achievable both with freshly
initialized and imported weights, these modules reproduce:

  * ``nn.Linear`` init: kaiming-uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)) for
    the kernel, U(±1/sqrt(fan_in)) for the bias.
  * ``nn.Conv1d/2d`` init: same with fan_in = in_chan * prod(kernel).
  * ``nn.LayerNorm``: eps=1e-5, affine.
  * ``nn.GELU``: exact (erf) variant — flax's default is the tanh approx.
  * Swish == x*sigmoid(x) (reference models/mpnn.py:15-24).

All modules are feature-last.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

# kernel: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — variance_scaling uniform with
# scale=1/3 yields bound sqrt(3*scale/fan_in) = 1/sqrt(fan_in).
torch_kernel_init = fnn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_kernel_init_fan(fan_in: int) -> Callable:
    """Kernel init U(±1/sqrt(fan_in)) with an EXPLICIT fan_in — used when a
    conceptual wide layer is split into chunks (pre-projection trick) so the
    init distribution matches the unsplit torch Linear."""
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_kernel_init_fanmult(mult: int) -> Callable:
    """Kernel init U(±1/sqrt(mult * in_dim)) — for equal-width chunks of a
    split conceptual layer (in_dim read from the kernel shape)."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(mult * shape[0])
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def swish(x):
    return x * jax.nn.sigmoid(x)


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "gelu": gelu,
    "swish": swish,
}


class Linear(fnn.Module):
    """Dense layer with torch nn.Linear default init.

    ``dtype`` is the computation dtype (params stay float32) — set to
    jnp.bfloat16 for the fast path on TPU.
    """

    features: int
    use_bias: bool = True
    dtype: Any = None

    @fnn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        y = fnn.Dense(
            self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
        )(x)
        return y


class LayerNorm(fnn.Module):
    """torch nn.LayerNorm (eps=1e-5, elementwise affine)."""

    dtype: Any = None

    @fnn.compact
    def __call__(self, x):
        # use_fast_variance=False: flax's default E[x^2]-mu^2 form can
        # cancel NEGATIVE on near-constant large-magnitude rows and NaN
        # the rsqrt; torch LayerNorm computes E[(x-mu)^2] >= 0 (this
        # NaN'd the B1-64 magnet_cnn_2d campaign at epoch 30 — the INR
        # proj_head LayerNorm was the entry point)
        return fnn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             use_fast_variance=False)(x)


class MLP(fnn.Module):
    """Plain MLP (reference models/backbones/mlp.py:9-28): Linear+act per
    hidden layer, final Linear without activation."""

    hidden_list: Sequence[int]
    out_dim: int
    activation: str = "relu"
    dtype: Any = None

    @fnn.compact
    def __call__(self, x):
        act = ACTIVATIONS[self.activation]
        for h in self.hidden_list:
            x = act(Linear(h, dtype=self.dtype)(x))
        return Linear(self.out_dim, dtype=self.dtype)(x)


class Conv(fnn.Module):
    """Convolution with torch nn.ConvNd default init; feature-last.

    kernel_size: tuple; stride defaults to 1; 'SAME' padding equals torch's
    ``padding=k//2`` for odd k; use padding='VALID' for the strided decoder
    CNNs (reference models/mpnn.py:140-163 use no padding).
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | None = None
    padding: str = "SAME"

    @fnn.compact
    def __call__(self, x):
        fan_in = x.shape[-1] * int(np.prod(self.kernel_size))
        return fnn.Conv(
            self.features,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides) if self.strides else None,
            padding=self.padding,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
        )(x)
