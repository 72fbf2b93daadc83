"""FNO 1D/2D baselines (reference models/fno_1d.py, models/fno_2d.py).

Lift (u ‖ dx ‖ dt) -> width, ``num_layers`` × [SpectralConv ⊕ 1×1 conv] with
GELU (exact erf — torch parity), project 128 -> time_future.  Autoregressive
time-bundled rollout with optional teacher forcing, as a ``lax.scan``.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as fnn

from magnet_tpu.models.common import LOSSES, l1_loss
from magnet_tpu.nn.core import Linear, gelu
from magnet_tpu.nn.spectral import SpectralConv1d, SpectralConv2d


class FNO1DCore(fnn.Module):
    modes: int = 12
    width: int = 256
    num_layers: int = 5
    time_future: int = 25

    @fnn.compact
    def __call__(self, u, dx, dt):
        """u: (B, L, T_history); dx/dt: (B,). Returns (B, L, time_future)."""
        B, L, _ = u.shape
        x = jnp.concatenate(
            [
                u,
                jnp.broadcast_to(dx[:, None, None], (B, L, 1)),
                jnp.broadcast_to(dt[:, None, None], (B, L, 1)),
            ],
            axis=-1,
        )
        x = Linear(self.width, name="fc0")(x)                # (B, L, W)
        x = x.transpose(0, 2, 1)                             # (B, W, L)
        for i in range(self.num_layers):
            x1 = SpectralConv1d(
                self.width, self.width, self.modes, name=f"fourier_{i}"
            )(x)
            x2 = Linear(self.width, name=f"conv_{i}")(x.transpose(0, 2, 1)).transpose(
                0, 2, 1
            )                                                # 1x1 conv == dense over channels
            x = gelu(x1 + x2)
        x = x.transpose(0, 2, 1)
        x = gelu(Linear(128, name="fc1")(x))
        return Linear(self.time_future, name="fc2")(x)       # (B, L, T_future)


class FNO2DCore(fnn.Module):
    modes_1: int = 12
    modes_2: int = 12
    width: int = 256
    num_layers: int = 5
    time_future: int = 10

    @fnn.compact
    def __call__(self, u, dx, dy, dt):
        """u: (B, H, W, T_history); dx/dy/dt: (B,)."""
        B, H, W, _ = u.shape
        ones = (B, H, W, 1)
        x = jnp.concatenate(
            [
                u,
                jnp.broadcast_to(dx[:, None, None, None], ones),
                jnp.broadcast_to(dy[:, None, None, None], ones),
                jnp.broadcast_to(dt[:, None, None, None], ones),
            ],
            axis=-1,
        )
        x = Linear(self.width, name="fc0")(x)                # (B, H, W, C)
        x = x.transpose(0, 3, 1, 2)                          # (B, C, H, W)
        for i in range(self.num_layers):
            x1 = SpectralConv2d(
                self.width, self.width, self.modes_1, self.modes_2,
                name=f"fourier_{i}",
            )(x)
            x2 = Linear(self.width, name=f"conv_{i}")(
                x.transpose(0, 2, 3, 1)
            ).transpose(0, 3, 1, 2)
            x = gelu(x1 + x2)
        x = x.transpose(0, 2, 3, 1)
        x = gelu(Linear(128, name="fc1")(x))
        return Linear(self.time_future, name="fc2")(x)       # (B, H, W, T_future)


class _FNOBase:
    def __init__(self, hparams: dict[str, Any]):
        self.hp = dict(hparams)
        self.time_history = int(self.hp.get("time_history", 25))
        self.time_future = int(self.hp.get("time_future", 25))
        self.teacher_forcing = bool(self.hp.get("teacher_forcing", True))
        # The rollout scan swaps a (B, time_history, ...) carry for a
        # (B, time_future, ...) prediction each window, so the two must agree
        # (the reference has the same latent constraint, fno_1d.py:167-173;
        # here it is explicit instead of an opaque scan shape error).
        if self.time_history != self.time_future:
            raise ValueError(
                "FNO autoregressive rollout requires time_history == "
                f"time_future (got {self.time_history} != {self.time_future}): "
                "each window's prediction becomes the next window's input."
            )
        self.criterion = LOSSES[self.hp.get("loss", "l1")]

    def build_graph(self, batch):
        return None

    def _windows(self, u):
        th, tf = self.time_history, self.time_future
        nt = u.shape[1]
        n_win = (nt - th) // tf
        return n_win

    def _rollout(self, params, batch, teacher_forcing: bool):
        raise NotImplementedError

    def loss(self, params, batch, graph=None, rng=None, train: bool = True):
        u = batch["u"]
        th = self.time_history
        tf_flag = self.teacher_forcing if train else False
        u_hat, n_win = self._rollout(params, batch, tf_flag)
        target = u[:, th : th + n_win * self.time_future]
        loss = self.criterion(u_hat, target)
        return loss, {"loss": loss, "mae_loss": l1_loss(u_hat, target)}

    def predict(self, params, batch, graph=None):
        u_hat, _ = self._rollout(params, batch, teacher_forcing=False)
        return u_hat

    def rollout_target(self, batch, horizon: int):
        """Ground truth aligned with predict(): u shifted by time_history
        (reference fno_1d.py:165-175 rollout window slicing)."""
        th = self.time_history
        return jnp.asarray(batch["u"])[:, th : th + horizon]


class FNO1D(_FNOBase):
    """Batch: u (B, nt, L), dx (B,), dt (B,)."""

    name = "fno_1d"
    is_2d = False

    def __init__(self, hparams):
        super().__init__(hparams)
        self.core = FNO1DCore(
            modes=int(self.hp.get("modes", 12)),
            width=int(self.hp.get("width", 256)),
            num_layers=int(self.hp.get("num_layers", 5)),
            time_future=self.time_future,
        )

    def init(self, rng, batch, graph=None):
        u = batch["u"]
        inp = u[:, : self.time_history].transpose(0, 2, 1)
        return self.core.init(rng, inp, batch["dx"], batch["dt"])

    def _rollout(self, params, batch, teacher_forcing: bool):
        u, dx, dt = batch["u"], batch["dx"], batch["dt"]
        th, tf = self.time_history, self.time_future
        B, nt, L = u.shape
        n_win = (nt - th) // tf
        fut = u[:, th : th + n_win * tf].reshape(B, n_win, tf, L)

        def step(inp, fut_win):
            y = self.core.apply(params, inp.transpose(0, 2, 1), dx, dt)
            y = y.transpose(0, 2, 1)                          # (B, tf, L)
            nxt = fut_win if teacher_forcing else y
            return nxt, y

        _, ys = jax.lax.scan(step, u[:, :th], jnp.moveaxis(fut, 1, 0))
        u_hat = jnp.moveaxis(ys, 0, 1).reshape(B, n_win * tf, L)
        return u_hat, n_win


class FNO2D(_FNOBase):
    """Batch: u (B, nt, H, W), dx, dy, dt (B,)."""

    name = "fno_2d"
    is_2d = True

    def __init__(self, hparams):
        hparams = dict(hparams)
        hparams.setdefault("time_history", 10)
        hparams.setdefault("time_future", 10)
        super().__init__(hparams)
        self.core = FNO2DCore(
            modes_1=int(self.hp.get("modes_1", 12)),
            modes_2=int(self.hp.get("modes_2", 12)),
            width=int(self.hp.get("width", 256)),
            num_layers=int(self.hp.get("num_layers", 5)),
            time_future=self.time_future,
        )

    def init(self, rng, batch, graph=None):
        u = batch["u"]
        inp = u[:, : self.time_history].transpose(0, 2, 3, 1)
        return self.core.init(rng, inp, batch["dx"], batch["dy"], batch["dt"])

    def _rollout(self, params, batch, teacher_forcing: bool):
        u = batch["u"]
        dx, dy, dt = batch["dx"], batch["dy"], batch["dt"]
        th, tf = self.time_history, self.time_future
        B, nt, H, W = u.shape
        n_win = (nt - th) // tf
        fut = u[:, th : th + n_win * tf].reshape(B, n_win, tf, H, W)

        def step(inp, fut_win):
            y = self.core.apply(params, inp.transpose(0, 2, 3, 1), dx, dy, dt)
            y = y.transpose(0, 3, 1, 2)                       # (B, tf, H, W)
            nxt = fut_win if teacher_forcing else y
            return nxt, y

        _, ys = jax.lax.scan(step, u[:, :th], jnp.moveaxis(fut, 1, 0))
        u_hat = jnp.moveaxis(ys, 0, 1).reshape(B, n_win * tf, H, W)
        return u_hat, n_win
