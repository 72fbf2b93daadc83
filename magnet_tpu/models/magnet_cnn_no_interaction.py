"""MAgNet[CNN] no-interaction ablation (reference
models/magnet_cnn_no_interaction.py): EDSR encoding at downsampled scales,
a *recurrent* INR decoder that threads an LSTM-sized latent through both
taps and all timesteps, sinusoidal positional encoding, seq2seq LSTM with
attention for the future steps, MLP decode + Euler update.

Reference quirks replicated:
  * the latent starts as ``torch.randn`` at every forward
    (no_interaction.py:148) — here an explicit PRNG key;
  * inside a timestep the vx=+1 tap consumes the latent already updated by
    the vx=-1 tap, and the next timestep starts from the vx=+1 latent
    (no_interaction.py:152-180);
  * training always feeds ground-truth HR frames as the next input; without
    teacher forcing the model's predictions are written into those frames at
    the sampled indices (no_interaction.py:272-281).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from magnet_tpu.models.common import (
    HRPointsTarget, LOSSES, batch_vmap, l1_loss, time_windows,
)
from magnet_tpu.nn.core import MLP, Linear, LayerNorm
from magnet_tpu.nn.edsr import EDSR
from magnet_tpu.nn.lstm import AttnSeq2Seq
from magnet_tpu.ops.interp import _nearest_index, interpolate_linear_1d
from magnet_tpu.utils import make_coord


class _RecINRStep(fnn.Module):
    """One timestep of the recurrent INR decode, scanned over time."""

    lstm_hidden: int

    @fnn.compact
    def __call__(self, carry, xs):
        latent, statics = carry
        ti, q_inps = xs                                      # scalar t, (2, C, N)
        proj_head = Linear(self.lstm_hidden, name="proj_head")
        n = latent.shape[0]
        preds = []
        for k in range(2):
            q_feat, fc, fcell, _ = [s[k] for s in statics]
            q_inp = q_inps[k].T                              # (N, C)
            inp = jnp.concatenate(
                [q_feat, q_inp, fc, fcell, latent,
                 jnp.broadcast_to(ti, (n, 1))],
                axis=-1,
            )
            latent = proj_head(inp)                          # (N, H)
            preds.append(latent)
        a0, a1 = statics[3][0], statics[3][1]
        blended = (preds[0] * a1 + preds[1] * a0) / (a1 + a0)
        return (latent, statics), blended


class RecurrentINR(fnn.Module):
    """Per-sample recurrent continuous decoder (no_interaction.py:124-190).

    Args: x_t (T, C, L2), feat (Cf, L2), cell (N, 1), coord_hr (N, 1),
    t (T_total,), latent0 (N, H).  Returns (T, N, H) blended latents.
    """

    lstm_hidden: int

    @fnn.compact
    def __call__(self, x_t, feat, cell, coord_hr, t, latent0):
        T, C, L = x_t.shape
        N = coord_hr.shape[0]
        feat_coord = make_coord([L])[:, 0]
        dx = 1.0 / L

        # precompute both taps' gathers (identical for every timestep)
        q_feats, fcs, fcells, areas, q_inp_seqs = [], [], [], [], []
        for vx in (-1.0, 1.0):
            gx = jnp.clip(coord_hr[:, 0] + vx * dx + 1e-6, -1 + 1e-6, 1 - 1e-6)
            idx = _nearest_index(gx, L)
            q_feats.append(jnp.take(feat, idx, axis=-1).T)   # (N, Cf)
            q_coord = jnp.take(feat_coord, idx)[:, None]
            q_inp_seqs.append(jnp.take(x_t, idx, axis=-1))   # (T, C, N)
            fc = (coord_hr - q_coord) * L
            fcs.append(fc)
            fcells.append(cell * L)
            areas.append(jnp.abs(fc))                        # (N, 1)

        statics = (
            jnp.stack(q_feats), jnp.stack(fcs), jnp.stack(fcells),
            jnp.stack(areas),
        )
        q_inp_seq = jnp.stack(q_inp_seqs, axis=1)            # (T, 2, C, N)

        scan = fnn.scan(
            _RecINRStep,
            variable_broadcast="params",
            split_rngs={"params": False},
        )(self.lstm_hidden, name="rec_step")
        _, out = scan((latent0, statics), (t[:T], q_inp_seq))
        return out                                           # (T, N, H)


class NoInteractionCore(fnn.Module):
    time_slice: int = 16
    lstm_hidden: int = 256
    lstm_layers: int = 4
    mlp_layers: int = 1
    mlp_hidden: int = 32
    scales: int = 1
    n_chan: int = 128
    kernel_size: int = 3
    res_scale: float = 1.0
    res_layers: int = 16

    @fnn.compact
    def __call__(self, x_t, coords, cell, t, hr_last, latent0):
        """x_t: (B, T, C, L) full-res frames; coords/cell: (B, N, 1);
        t: (B, 2T); hr_last: (B, N, 1); latent0: (B, N, H) ~ N(0,1)."""
        B, T, C, L = x_t.shape
        N = coords.shape[1]
        T_out = t.shape[-1] - T

        edsr = EDSR(
            n_chan=self.n_chan, res_layers=self.res_layers,
            kernel_size=self.kernel_size, res_scale=self.res_scale,
            ndim=1, name="encoder",
        )
        rinr = batch_vmap(
            RecurrentINR, in_axes=(0, 0, 0, 0, 0, 0),
            lstm_hidden=self.lstm_hidden, name="recurrent_inr",
        )

        z = 0.0
        for s in range(1, self.scales + 1):
            l2 = L // (2**s)
            x_lr = interpolate_linear_1d(x_t.reshape(B, T * C, L), l2)
            feat = edsr(x_lr.transpose(0, 2, 1)).transpose(0, 2, 1)  # (B, Cf, L2)
            x_lr_t = x_lr.reshape(B, T, C, l2)
            z = z + rinr(x_lr_t, feat, cell, coords, t, latent0)     # (B, T, N, H)

        # sinusoidal pos enc (no_interaction.py:115-122): sin/cos(2πx)
        pe = jnp.concatenate(
            [jnp.sin(2 * np.pi * coords), jnp.cos(2 * np.pi * coords)], axis=-1
        )                                                    # (B, N, 2)
        z = z.transpose(0, 2, 1, 3)                          # (B, N, T, H)
        z = jnp.concatenate(
            [z, jnp.broadcast_to(pe[:, :, None, :], (B, N, T, 2))], axis=-1
        ).reshape(B * N, T, self.lstm_hidden + 2)

        seq = batch_vmap(
            AttnSeq2Seq, in_axes=(0, None),
            hidden=self.lstm_hidden, num_layers=self.lstm_layers,
            name="seq2seq",
        )
        out, _ = seq(z, T_out)                               # (B*N, T_out, H)
        out = LayerNorm(name="layernorm")(out)
        ret = MLP(
            [self.mlp_hidden] * self.mlp_layers, 1, name="decoder"
        )(out).reshape(B, N, T_out)

        dt = t[:, T:] - t[:, T - 1 : T]                      # (B, T_out)
        outputs = hr_last[:, None] + dt[:, :, None, None] * ret.transpose(0, 2, 1)[..., None]
        return outputs                                       # (B, T_out, N, 1)


class MAgNetCNNNoInteraction(HRPointsTarget):
    """Task wrapper.  Batch (DatasetImplicit1D): t, hr_frames (B,nt,1,L),
    hr_points (B,nt,N,1), coords (B,N,1), cells (B,N,1), sample_idx (B,N)."""

    name = "magnet_cnn_no_interaction"
    is_2d = False

    def __init__(self, hparams: dict[str, Any]):
        self.hp = dict(hparams)
        self.time_slice = int(self.hp.get("time_slice", 16))
        self.teacher_forcing = bool(self.hp.get("teacher_forcing", False))
        self.criterion = LOSSES[self.hp.get("loss", "l1")]
        self.lstm_hidden = int(self.hp.get("lstm_hidden", 256))
        self.core = NoInteractionCore(
            time_slice=self.time_slice,
            lstm_hidden=self.lstm_hidden,
            lstm_layers=int(self.hp.get("lstm_layers", 4)),
            mlp_layers=int(self.hp.get("mlp_layers", 1)),
            mlp_hidden=int(self.hp.get("mlp_hidden", 32)),
            scales=int(self.hp.get("scales", 1)),
            n_chan=int(self.hp.get("n_chan", 128)),
            kernel_size=int(self.hp.get("kernel_size", 3)),
            res_scale=float(self.hp.get("res_scale", 1.0)),
            res_layers=int(self.hp.get("res_layers", 16)),
        )

    def build_graph(self, batch):
        return None

    def _latent0(self, rng, B, N):
        return jax.random.normal(rng, (B, N, self.lstm_hidden))

    def init(self, rng, batch, graph=None):
        ts = self.time_slice
        B, _, _, L = batch["hr_frames"].shape
        N = batch["coords"].shape[1]
        rng, sub = jax.random.split(rng)
        return self.core.init(
            rng,
            batch["hr_frames"][:, :ts],
            batch["coords"],
            batch["cells"],
            batch["t"][:, : 2 * ts],
            batch["hr_points"][:, ts - 1],
            self._latent0(sub, B, N),
        )

    def _rollout(self, params, batch, teacher_forcing: bool, rng,
                 scatter_feedback: bool):
        ts = self.time_slice
        u = batch["hr_frames"]                               # (B, nt, C, L)
        uv = batch["hr_points"]
        t = batch["t"]
        B, nt, C, L = u.shape
        N = uv.shape[2]
        n_win = (nt - ts) // ts

        u_win = u[:, : (n_win + 1) * ts].reshape(B, n_win + 1, ts, C, L)
        uv_win = uv[:, : (n_win + 1) * ts].reshape(B, n_win + 1, ts, N, 1)
        t_win = time_windows(t, n_win, ts)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        sample_idx = batch.get("sample_idx")

        def step(carry, xs):
            inp, hr_last, key = carry
            nxt_gt_inp, tf_uv_last, tw = xs
            key, sub = jax.random.split(key)
            y = self.core.apply(
                params, inp, batch["coords"], batch["cells"], tw, hr_last,
                self._latent0(sub, B, N),
            )                                                # (B, ts, N, 1)
            if teacher_forcing:
                nxt_inp, nxt_hr = nxt_gt_inp, tf_uv_last
            elif scatter_feedback and sample_idx is not None:
                # train, no TF: GT frames with predictions written in at
                # sample_idx (no_interaction.py:277-281)
                def wr(frames, pred, idx):
                    # frames (ts, C, L), pred (ts, N, 1), idx (N,)
                    return frames.at[:, 0, idx].set(pred[..., 0])

                nxt_inp = jax.vmap(wr)(nxt_gt_inp, y, sample_idx)
                nxt_hr = y[:, -1]
            else:
                # val: predictions become the next frames directly (N == L,
                # no_interaction.py:311-312)
                nxt_inp = y.transpose(0, 1, 3, 2)
                nxt_hr = y[:, -1]
            return (nxt_inp, nxt_hr, key), y

        xs = (
            jnp.moveaxis(u_win[:, 1:], 1, 0),
            jnp.moveaxis(uv_win[:, 1:, -1], 1, 0),
            jnp.moveaxis(t_win, 1, 0),
        )
        init = (u_win[:, 0], uv_win[:, 0, -1], rng)
        _, ys = jax.lax.scan(step, init, xs)                 # (n, B, ts, N, 1)
        y_hat = jnp.moveaxis(ys, 0, 1).reshape(B, n_win * ts, N, 1)
        return y_hat, n_win

    def loss(self, params, batch, graph=None, rng=None, train: bool = True):
        ts = self.time_slice
        uv = batch["hr_points"]
        nt = uv.shape[1]
        n_win = (nt - ts) // ts
        used = (n_win + 1) * ts
        tf_flag = self.teacher_forcing if train else False
        y_hat, _ = self._rollout(
            params, batch, tf_flag, rng, scatter_feedback=train
        )
        target = uv[:, ts:used]
        loss = self.criterion(y_hat, target)
        return loss, {"loss": loss, "mae_loss": l1_loss(y_hat, target)}

    def predict(self, params, batch, graph=None):
        y_hat, _ = self._rollout(
            params, batch, teacher_forcing=False, rng=None, scatter_feedback=False
        )
        return y_hat
