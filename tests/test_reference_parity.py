"""Numerical parity against the ACTUAL reference code at /root/reference.

Each test constructs a reference torch module (random torch-default init),
exports its ``state_dict()``, imports it through
``magnet_tpu.train.import_torch`` (exercising the importer on genuinely
torch-produced state dicts), runs both forwards on identical inputs, and
asserts allclose.  The reference runs unmodified via ``ref_stubs``
(pytorch_lightning / torch_geometric stand-ins built on torch-native ops).

Skips cleanly when torch is unavailable.
"""
from __future__ import annotations

from types import SimpleNamespace as NS

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import ref_stubs  # noqa: E402
from magnet_tpu.train import import_torch as imp  # noqa: E402

torch.manual_seed(0)


def _sd(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def _t(x):
    return torch.as_tensor(np.asarray(x))


def _n(x):
    return x.detach().cpu().numpy()


def _j(tree):
    return jax.tree.map(jnp.asarray, tree)


# --------------------------------------------------------------------------
# FNO 1D / 2D — full model forward (reference models/fno_1d.py:106-142,
# models/fno_2d.py:~100-140; torch-only paths)
# --------------------------------------------------------------------------

FNO_HP = dict(lr=1e-3, weight_decay=0.0, factor=0.3, step_size=50, loss="l1",
              teacher_forcing=True)


def test_fno1d_full_forward():
    m = ref_stubs.load("models.fno_1d")
    hp = NS(**FNO_HP, modes=4, width=8, num_layers=3, time_history=6,
            time_future=6)
    ref = m.FNO1d(hp)
    rng = np.random.default_rng(0)
    u = rng.normal(size=(2, 16, 6)).astype(np.float32)   # (B, L, T)
    dx = np.asarray([0.1, 0.2], np.float32)
    dt = np.asarray([0.01, 0.02], np.float32)
    with torch.no_grad():
        ref_out = _n(ref(_t(u), _t(dx), _t(dt)))

    from magnet_tpu.models.factory import create_model

    ours = create_model("fno_1d", dict(modes=4, width=8, num_layers=3,
                                       time_history=6, time_future=6,
                                       teacher_forcing=True, loss="l1"))
    params = _j(imp.import_state_dict("fno_1d", _sd(ref), vars(hp)))
    out = np.asarray(ours.core.apply(params, jnp.asarray(u), jnp.asarray(dx),
                                     jnp.asarray(dt)))
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=1e-5)


def test_fno2d_full_forward():
    m = ref_stubs.load("models.fno_2d")
    hp = NS(**FNO_HP, modes_1=3, modes_2=3, width=8, num_layers=2,
            time_history=4, time_future=4)
    ref = m.FNO2d(hp)
    rng = np.random.default_rng(1)
    u = rng.normal(size=(2, 4, 10, 12)).astype(np.float32)  # (B, T, H, W)
    dx = np.asarray([0.1, 0.2], np.float32)
    dy = np.asarray([0.15, 0.25], np.float32)
    dt = np.asarray([0.01, 0.02], np.float32)
    with torch.no_grad():
        # reference consumes (B, T, H, W), returns (B, tf, H, W)
        ref_out = _n(ref(_t(u), _t(dx), _t(dy), _t(dt)))

    from magnet_tpu.models.factory import create_model

    ours = create_model("fno_2d", dict(modes_1=3, modes_2=3, width=8,
                                       num_layers=2, time_history=4,
                                       time_future=4, teacher_forcing=True,
                                       loss="l1"))
    params = _j(imp.import_state_dict("fno_2d", _sd(ref), vars(hp)))
    out = np.asarray(
        ours.core.apply(params, jnp.asarray(u.transpose(0, 2, 3, 1)),
                        jnp.asarray(dx), jnp.asarray(dy), jnp.asarray(dt))
    )  # ours is channels-last: (B, H, W, tf)
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref_out,
                               rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# EDSR backbone — 1d and 2d modes (reference backbones/edsr.py:32-59)
# --------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["1d", "2d"])
def test_edsr_backbone(mode):
    eref = ref_stubs.load("models.backbones.edsr")
    ref = eref.EDSR(in_chan=4, n_chan=8, res_layers=3, kernel_size=3,
                    res_scale=1, mode=mode)
    rng = np.random.default_rng(2)
    if mode == "1d":
        x = rng.normal(size=(2, 4, 16)).astype(np.float32)      # (B, C, L)
        x_ours = jnp.asarray(x.transpose(0, 2, 1))              # (B, L, C)
    else:
        x = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)    # (B, C, H, W)
        x_ours = jnp.asarray(x.transpose(0, 2, 3, 1))
    with torch.no_grad():
        ref_out = _n(ref(_t(x)))

    from magnet_tpu.nn.edsr import EDSR

    ours = EDSR(n_chan=8, res_layers=3, kernel_size=3, res_scale=1.0,
                ndim=1 if mode == "1d" else 2)
    params = {"params": _j(imp.import_edsr(_sd(ref), "", 3))}
    out = np.asarray(ours.apply(params, x_ours))
    if mode == "1d":
        out = out.transpose(0, 2, 1)
    else:
        out = out.transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# MAgNet[CNN] 1D pieces and full single-window forward
# (reference models/magnet_cnn.py)
# --------------------------------------------------------------------------

CNN_HP = dict(lr=1e-3, weight_decay=0.0, factor=0.3, step_size=50, loss="l1",
              time_slice=4, num_message_passing_steps=2, latent_dim=8,
              mlp_layers=2, mlp_hidden=16, scales=1, res_layers=2, n_chan=8,
              kernel_size=3, res_scale=1, interpolation="area", radius=0.3,
              teacher_forcing=True)


@pytest.fixture(scope="module")
def ref_magnet_cnn():
    m = ref_stubs.load("models.magnet_cnn")
    return m.MAgNetCNN(NS(**CNN_HP))


def _cnn_inputs(seed=3, B=2, T=4, L=16, N=6):
    rng = np.random.default_rng(seed)
    x_t = rng.normal(size=(B, T, 1, L)).astype(np.float32)
    coords = np.sort(rng.uniform(-1, 1, (B, N, 1)).astype(np.float32), axis=1)
    cells = np.full((B, N, 1), 2.0 / (2 * L), np.float32)
    t = np.linspace(0, 1, 2 * T, dtype=np.float32)[None].repeat(B, 0)
    hr_last = rng.normal(size=(B, N, 1)).astype(np.float32)
    return x_t, coords, cells, t, hr_last


def test_magnet_cnn_continuous_decoder(ref_magnet_cnn):
    """INR continuous decoder (reference magnet_cnn.py:225-285) incl. the
    2-tap area blend, vs INRDecoder1D with imported proj_head."""
    ref = ref_magnet_cnn
    x_t, coords, cells, t, _ = _cnn_inputs()
    B, T, C, L = x_t.shape
    N = coords.shape[1]
    with torch.no_grad():
        feat = ref.feature_encoding(_t(x_t))                    # (B, Cf, L)
        z_ref = _n(ref.continuous_decoder(_t(x_t), feat, _t(cells),
                                          _t(coords), _t(t)))    # (B*N, T, nc)
    z_ref = z_ref.reshape(B, N, T, -1)

    from magnet_tpu.nn.inr import INRDecoder1D

    params = imp.import_state_dict("magnet_cnn", _sd(ref), CNN_HP)
    sub = {"params": _j(params["params"]["continuous_decoder"])}
    dec = INRDecoder1D(n_chan=CNN_HP["n_chan"], mlp_layers=CNN_HP["mlp_layers"],
                       mlp_hidden=CNN_HP["mlp_hidden"])
    feat_np = _n(feat)
    for b in range(B):
        ours = np.asarray(
            dec.apply(sub, jnp.asarray(x_t[b]), jnp.asarray(feat_np[b]),
                      jnp.asarray(cells[b]), jnp.asarray(coords[b]),
                      jnp.asarray(t[b]))
        )
        np.testing.assert_allclose(ours, z_ref[b], rtol=1e-4, atol=1e-5)


def test_interaction_network_step(ref_magnet_cnn):
    """One InteractionNetwork propagate step in torch (via the stub's
    index_select/index_add mean-scatter) vs our split-weight step — covers
    the PyG update-arg quirk (edge output is the doubled INPUT features)."""
    ref = ref_magnet_cnn._processor.gnn_stacks[0]
    C = CNN_HP["latent_dim"]
    rng = np.random.default_rng(4)
    Nn, E = 10, 40
    x = rng.normal(size=(Nn, C)).astype(np.float32)
    e = rng.normal(size=(E, C)).astype(np.float32)
    senders = rng.integers(0, Nn, E)
    receivers = rng.integers(0, Nn, E)
    edge_index = np.stack([senders, receivers])
    with torch.no_grad():
        x_ref, e_ref = ref(_t(x), _t(edge_index).long(), _t(e))

    params = imp.import_state_dict("magnet_cnn", _sd(ref_magnet_cnn), CNN_HP)
    step0 = jax.tree.map(
        lambda a: jnp.asarray(a[0]),
        params["params"]["_processor"]["steps"]["step"],
    )
    from magnet_tpu.nn.graphnet import InteractionNetwork

    inet = InteractionNetwork(node_out=C, edge_out=C,
                              mlp_layers=CNN_HP["mlp_layers"],
                              mlp_hidden=CNN_HP["mlp_hidden"])
    xi = x[receivers]         # PyG x_i = x[edge_index[1]]
    xj = x[senders]
    cat = jnp.asarray(np.concatenate([xi, xj, e], axis=-1))
    msg = np.asarray(inet.apply({"params": step0}, cat, method="edge_mlp"))
    # mean-scatter into receivers (count clamped to >= 1)
    agg = np.zeros((Nn, C), np.float32)
    np.add.at(agg, receivers, msg)
    cnt = np.bincount(receivers, minlength=Nn).clip(min=1)[:, None]
    agg = agg / cnt
    upd = np.asarray(
        inet.apply({"params": step0},
                   jnp.asarray(np.concatenate([agg, x], axis=-1)),
                   method="node_mlp")
    )
    np.testing.assert_allclose(upd + x, _n(x_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(e + e, _n(e_ref), rtol=1e-5, atol=1e-6)


def test_magnet_cnn_full_window_forward(ref_magnet_cnn):
    """Full single-window forward: EDSR + INR + projector + radius graph +
    encoder/processor/decoder + Euler (reference magnet_cnn.py:322-381)."""
    ref = ref_magnet_cnn
    x_t, coords, cells, t, hr_last = _cnn_inputs()
    with torch.no_grad():
        out_hr, out_lr, hr_pts = ref(_t(x_t), _t(coords), _t(cells), _t(t),
                                     _t(hr_last))

    from magnet_tpu.models.factory import create_model

    ours = create_model("magnet_cnn", CNN_HP)
    params = _j(imp.import_state_dict("magnet_cnn", _sd(ref), CNN_HP))
    batch = {"coords": jnp.asarray(coords),
             "lr_frames": jnp.asarray(x_t)}
    g = ours.build_graph(batch)
    o_hr, o_lr, o_pts = ours.core.apply(
        params, jnp.asarray(x_t), jnp.asarray(coords), jnp.asarray(cells),
        jnp.asarray(t), jnp.asarray(hr_last), g,
    )
    np.testing.assert_allclose(np.asarray(o_pts), _n(hr_pts), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_lr), _n(out_lr), rtol=1e-4,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(o_hr), _n(out_hr), rtol=1e-4,
                               atol=2e-5)
