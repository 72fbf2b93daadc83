"""Optimizer-TRAJECTORY parity against the actual reference code.

The reference-parity suite proves forward/loss agreement at random init;
this file closes the remaining gap (VERDICT r2 item 3): starting from the
same torch-default init, run K Adam + StepLR steps on BOTH stacks — the
unmodified torch reference (via ref_stubs, torch.optim.Adam +
lr_scheduler.StepLR, reference models/fno_1d.py:144-152 semantics) and our
trainer's optax chain (magnet_tpu/train/optim.py) — on identical batches,
and assert the per-step loss trajectory and the final parameters track
within fp32 tolerance.  Covered: the flagship (magnet_cnn, incl. its
nonzero weight decay) and one baseline (fno_1d, with weight_decay=0.01 to
exercise the coupled-L2 ordering).

Each optimizer step is treated as one epoch (scheduler.step() per step,
steps_per_epoch=1 on our side) with step_size=3 so the K=8-step run crosses
two StepLR decays — the schedule alignment is part of what's under test.
"""
from __future__ import annotations

import copy
from types import SimpleNamespace as NS

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

import ref_stubs  # noqa: E402
from magnet_tpu.train import import_torch as imp  # noqa: E402
from magnet_tpu.train.optim import make_optimizer  # noqa: E402

torch.manual_seed(0)

K_STEPS = 8
STEP_SIZE = 3          # StepLR period in epochs (= steps here)
FACTOR = 0.3


def _sd(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def _t(x):
    return torch.as_tensor(np.asarray(x))


def _j(tree):
    return jax.tree.map(jnp.asarray, tree)


def _run_torch(ref, batch_t, lr, weight_decay):
    """K reference training steps; returns (losses, final state_dict)."""
    opt = torch.optim.Adam(ref.parameters(), lr=lr, weight_decay=weight_decay)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=STEP_SIZE,
                                            gamma=FACTOR)
    losses = []
    for _ in range(K_STEPS):
        opt.zero_grad()
        loss = ref.training_step(batch_t, 0)
        loss.backward()
        opt.step()
        sched.step()
        losses.append(float(loss.detach()))
    return np.asarray(losses), _sd(ref)


def _run_ours(model, params, batch_j, graph, lr, weight_decay):
    """K steps through the same optax chain the Trainer builds."""
    tx = make_optimizer(lr, weight_decay, FACTOR, STEP_SIZE,
                        steps_per_epoch=1)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s):
        (loss, _), grads = jax.value_and_grad(
            lambda q: model.loss(q, batch_j, graph, train=True), has_aux=True
        )(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for _ in range(K_STEPS):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    return np.asarray(losses), params


def _assert_tracks(ours_losses, ref_losses, ours_params, ref_final_params):
    np.testing.assert_allclose(ours_losses, ref_losses, rtol=2e-3, atol=1e-5)
    flat_o, _ = jax.tree.flatten(ours_params)
    flat_r, _ = jax.tree.flatten(ref_final_params)
    assert len(flat_o) == len(flat_r)
    for o, r in zip(flat_o, flat_r):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), rtol=5e-3,
                                   atol=2e-4)


def test_fno1d_optimizer_trajectory():
    lr, wd = 1e-3, 0.01
    m = ref_stubs.load("models.fno_1d")
    hp = NS(lr=lr, weight_decay=wd, factor=FACTOR, step_size=STEP_SIZE,
            loss="l1", teacher_forcing=True, modes=4, width=8, num_layers=2,
            time_history=6, time_future=6)
    ref = m.FNO1d(hp)
    sd0 = copy.deepcopy(_sd(ref))

    rng = np.random.default_rng(7)
    B, L, nt = 2, 16, 18
    u = rng.normal(size=(B, nt, L)).astype(np.float32)
    dx = np.asarray([0.1, 0.2], np.float32)
    dt = np.asarray([0.01, 0.02], np.float32)
    ref_losses, ref_sd = _run_torch(ref, (_t(u), _t(dx), _t(dt)), lr, wd)

    from magnet_tpu.models.factory import create_model

    hpd = dict(modes=4, width=8, num_layers=2, time_history=6, time_future=6,
               teacher_forcing=True, loss="l1")
    ours = create_model("fno_1d", hpd)
    params = _j(imp.import_state_dict("fno_1d", sd0, vars(hp)))
    jb = {"u": jnp.asarray(u), "dx": jnp.asarray(dx), "dt": jnp.asarray(dt)}
    our_losses, our_params = _run_ours(ours, params, jb, None, lr, wd)

    ref_final = _j(imp.import_state_dict("fno_1d", ref_sd, vars(hp)))
    _assert_tracks(our_losses, ref_losses, our_params, ref_final)


def test_magnet_cnn_optimizer_trajectory():
    """Flagship trajectory incl. the reference's nonzero weight decay
    (configs/model/magnet_cnn.yaml: weight_decay=1e-7)."""
    lr, wd = 1e-3, 1e-7
    m = ref_stubs.load("models.magnet_cnn")
    hp = dict(lr=lr, weight_decay=wd, factor=FACTOR, step_size=STEP_SIZE,
              loss="l1", time_slice=4, num_message_passing_steps=2,
              latent_dim=8, mlp_layers=2, mlp_hidden=16, scales=1,
              res_layers=2, n_chan=8, kernel_size=3, res_scale=1,
              interpolation="area", radius=0.3, teacher_forcing=True)
    ref = m.MAgNetCNN(NS(**hp))
    sd0 = copy.deepcopy(_sd(ref))

    rng = np.random.default_rng(11)
    B, ts, L, N = 2, 4, 16, 6
    nt = 3 * ts
    batch_np = {
        "t": np.linspace(0, 1, nt, dtype=np.float32)[None].repeat(B, 0),
        "lr_frames": rng.normal(size=(B, nt, 1, L)).astype(np.float32),
        "hr_points": rng.normal(size=(B, nt, N, 1)).astype(np.float32),
        "coords": np.sort(rng.uniform(-1, 1, (B, N, 1)).astype(np.float32), 1),
        "cells": np.full((B, N, 1), 2.0 / (2 * L), np.float32),
        "sample_idx": np.stack(
            [np.sort(rng.choice(L, N, replace=False)) for _ in range(B)]
        ),
    }
    ref_losses, ref_sd = _run_torch(
        ref, {k: _t(v) for k, v in batch_np.items()}, lr, wd
    )

    from magnet_tpu.models.factory import create_model

    ours = create_model("magnet_cnn", hp)
    params = _j(imp.import_state_dict("magnet_cnn", sd0, hp))
    jb = {k: jnp.asarray(v) for k, v in batch_np.items()}
    g = ours.build_graph(jb)
    our_losses, our_params = _run_ours(ours, params, jb, g, lr, wd)

    ref_final = _j(imp.import_state_dict("magnet_cnn", ref_sd, hp))
    _assert_tracks(our_losses, ref_losses, our_params, ref_final)
