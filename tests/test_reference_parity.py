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


# --------------------------------------------------------------------------
# MPNN 1D / 2D — full forward incl. InstanceNorm + temporal-bundling decoder
# (reference models/mpnn.py:175-251, models/mpnn_2d.py)
# --------------------------------------------------------------------------

# hidden_features must be 128: the temporal-bundling decoder conv shapes
# are hardcoded for it (reference mpnn.py:140-163)
MPNN_HP = dict(lr=1e-3, weight_decay=0.0, factor=0.3, step_size=50, loss="l1",
               hidden_features=128, hidden_layer=2, teacher_forcing=False)


@pytest.mark.parametrize("tw", [10, 16])
def test_mpnn_full_forward(tw):
    m = ref_stubs.load("models.mpnn")
    hp = NS(**MPNN_HP, time_window=tw, neighbors=2)
    ref = m.MPNN(hp)
    rng = np.random.default_rng(5)
    B, N, nt = 2, 24, 2 * tw
    u = rng.normal(size=(B, N, nt)).astype(np.float32)        # (B, N, nt)
    x = np.linspace(0, 16, N, dtype=np.float32)[None, :, None].repeat(B, 0)
    t = np.linspace(0, 2, nt, dtype=np.float32)[None].repeat(B, 0)
    L, tmax = x[0, -1, 0], t[0, -1]
    dt = t[0, 1] - t[0, 0]
    with torch.no_grad():
        graph = ref._build_graph(
            _t(u.transpose(0, 2, 1)[:, :tw]), _t(t), _t(x[..., 0]), [0] * B
        )
        ref_out = _n(ref(graph, _t(L), _t(tmax), _t(dt))).reshape(B, N, tw)

    from magnet_tpu.models.factory import create_model

    hpd = dict(hidden_features=128, hidden_layer=2, time_window=tw,
               neighbors=2, teacher_forcing=False, loss="l1")
    ours = create_model("mpnn", hpd)
    params = _j(imp.import_state_dict("mpnn", _sd(ref), hpd))
    batch = {"u": jnp.asarray(u), "x": jnp.asarray(x), "t": jnp.asarray(t)}
    g = ours.build_graph(batch)
    u0 = jnp.asarray(u[:, :, :tw])
    variables = ours._variables(jnp.asarray(t), 0, N)
    out = np.asarray(
        ours.core.apply(params, u0, jnp.asarray(x / L), variables,
                        jnp.asarray(dt), g)
    )
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=1e-5)


def test_mpnn_2d_full_forward():
    m = ref_stubs.load("models.mpnn_2d")
    tw = 10
    hp = NS(**MPNN_HP, time_window=tw, neighbors=1)
    ref = m.MPNN_2d(hp)
    rng = np.random.default_rng(6)
    W = 5
    B, N, nt = 2, W * W, 2 * tw
    gx, gy = np.meshgrid(np.linspace(0, 2, W), np.linspace(0, 2, W),
                         indexing="ij")
    x = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)[None].repeat(B, 0)
    u = rng.normal(size=(B, N, nt)).astype(np.float32)
    t = np.linspace(0, 2, nt, dtype=np.float32)[None].repeat(B, 0)
    L, tmax = x[0, -1, 0], t[0, -1]
    dt = t[0, 1] - t[0, 0]
    with torch.no_grad():
        graph = ref._build_graph(
            _t(u.transpose(0, 2, 1)[:, :tw]), _t(t), _t(x), [tw - 1] * B
        )
        # Reference BUG: mpnn_2d.py:179 takes pos[:, 1][:, None] (one
        # column), which crashes its own Linear(time_window+3) — the
        # runnable semantics (declared dims, message_net's "+2") use both
        # spatial columns.  Drive the reference's OWN submodules with the
        # corrected 2-column pos_x; everything else is its forward verbatim
        # (mpnn_2d.py:175-201).
        u_n = graph.x
        pos = graph.pos
        pos_x = pos[:, 1:] / _t(L)
        variables = pos[:, 0][:, None] / _t(tmax)
        node_input = torch.cat((u_n, pos_x, variables), -1)
        h = ref.embedding_mlp(node_input)
        for i in range(ref.hidden_layer):
            h = ref.gnn_layers[i](h, u_n, pos_x, variables, graph.edge_index,
                                  graph.batch)
        dt_row = torch.cumsum(torch.ones(1, tw) * _t(dt), dim=1)
        diff = ref.output_mlp(h[:, None]).squeeze(1)
        ref_out = _n(
            u_n[:, -1].repeat(tw, 1).transpose(0, 1) + dt_row * diff
        ).reshape(B, N, tw)

    from magnet_tpu.models.factory import create_model

    hpd = dict(hidden_features=128, hidden_layer=2, time_window=tw,
               neighbors=1, teacher_forcing=False, loss="l1")
    ours = create_model("mpnn_2d", hpd)
    params = _j(imp.import_state_dict("mpnn_2d", _sd(ref), hpd))
    batch = {"u": jnp.asarray(u), "x": jnp.asarray(x), "t": jnp.asarray(t)}
    g = ours.build_graph(batch)
    variables = ours._variables_step(jnp.asarray(t), tw - 1, N)
    out = np.asarray(
        ours.core.apply(params, jnp.asarray(u[:, :, :tw]),
                        jnp.asarray(x / L), variables, jnp.asarray(dt), g)
    )
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("tf", [True, False])
def test_mpnn_training_and_val_loss_parity(tf):
    """MPNN training_step / validation_step multi-window rollout losses
    (reference mpnn.py:252-333) == our loss(train=True/False)."""
    m = ref_stubs.load("models.mpnn")
    tw = 10
    hp = NS(**{**MPNN_HP, "teacher_forcing": tf}, time_window=tw, neighbors=2)
    ref = m.MPNN(hp)
    rng = np.random.default_rng(41)
    B, N, nt = 2, 24, 3 * tw                         # 2 rollout windows
    batch_np = {
        "u": rng.normal(size=(B, N, nt)).astype(np.float32),
        "x": np.linspace(0, 16, N, dtype=np.float32)[None, :, None].repeat(B, 0),
        "t": np.linspace(0, 2, nt, dtype=np.float32)[None].repeat(B, 0),
    }
    tb = {k: _t(v) for k, v in batch_np.items()}
    with torch.no_grad():
        ref_train = float(ref.training_step(tb, 0))
        ref.validation_step(tb, 0)

    from magnet_tpu.models.factory import create_model

    hpd = dict(hidden_features=128, hidden_layer=2, time_window=tw,
               neighbors=2, teacher_forcing=tf, loss="l1")
    ours = create_model("mpnn", hpd)
    params = _j(imp.import_state_dict("mpnn", _sd(ref), hpd))
    jb = {k: jnp.asarray(v) for k, v in batch_np.items()}
    g = ours.build_graph(jb)
    loss, _ = ours.loss(params, jb, g, train=True)
    np.testing.assert_allclose(float(loss), ref_train, rtol=1e-5, atol=1e-6)
    vloss, _ = ours.loss(params, jb, g, train=False)
    np.testing.assert_allclose(
        float(vloss), ref._logged["val_loss"], rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("tf", [True, False])
def test_fno_training_and_val_loss_parity(tf):
    """FNO1d training_step / validation_step rollout losses (reference
    fno_1d.py:154-210) == our loss(train=True/False)."""
    m = ref_stubs.load("models.fno_1d")
    hp = NS(**{**FNO_HP, "teacher_forcing": tf}, modes=4, width=8,
            num_layers=2, time_history=6, time_future=6)
    ref = m.FNO1d(hp)
    rng = np.random.default_rng(43)
    B, L, nt = 2, 16, 18                             # th=6 + 2 windows
    u = rng.normal(size=(B, nt, L)).astype(np.float32)
    dx = np.asarray([0.1, 0.2], np.float32)
    dt = np.asarray([0.01, 0.02], np.float32)
    tb = (_t(u), _t(dx), _t(dt))
    with torch.no_grad():
        ref_train = float(ref.training_step(tb, 0))
        ref.validation_step(tb, 0)

    from magnet_tpu.models.factory import create_model

    ours = create_model("fno_1d", dict(modes=4, width=8, num_layers=2,
                                       time_history=6, time_future=6,
                                       teacher_forcing=tf, loss="l1"))
    params = _j(imp.import_state_dict("fno_1d", _sd(ref), vars(hp)))
    jb = {"u": jnp.asarray(u), "dx": jnp.asarray(dx), "dt": jnp.asarray(dt)}
    loss, _ = ours.loss(params, jb, None, train=True)
    np.testing.assert_allclose(float(loss), ref_train, rtol=1e-5, atol=1e-6)
    vloss, _ = ours.loss(params, jb, None, train=False)
    np.testing.assert_allclose(
        float(vloss), ref._logged["val_loss"], rtol=1e-5, atol=1e-6
    )


# --------------------------------------------------------------------------
# MAgNet[GNN] — full forward incl. kNN INR decoder and both GraphNet passes
# (reference models/magnet_gnn.py:312-376)
# --------------------------------------------------------------------------

def test_magnet_gnn_full_forward():
    # The reference hardcodes node_in=time_slice+3 and proj_head
    # latent_dim+4 (magnet_gnn.py:176-193), i.e. it only RUNS with
    # 2-column coordinates (its 2D irregular-mesh experiments); we test
    # parity there.  (Our implementation infers the coord dim, so 1D works
    # too — covered by the structural tests.)
    m = ref_stubs.load("models.magnet_gnn")
    hp = dict(lr=1e-3, weight_decay=0.0, factor=0.3, step_size=50, loss="l1",
              time_slice=4, num_message_passing_steps=2, latent_dim=8,
              mlp_layers=2, mlp_hidden=16, n_chan=8, radius=0.7,
              codec_neighbors=4, noise=0.0, interpolation="area",
              teacher_forcing=True)
    ref = m.MAgNetGNN(NS(**hp))
    rng = np.random.default_rng(7)
    B, T, L, N = 2, 4, 12, 6
    x_lr = rng.normal(size=(B, T, 1, L)).astype(np.float32)
    lr_coords = rng.uniform(-1, 1, (B, L, 2)).astype(np.float32)
    hr_coords = rng.uniform(-1, 1, (B, N, 2)).astype(np.float32)
    t = np.linspace(0, 1, 2 * T, dtype=np.float32)[None].repeat(B, 0)
    hr_last = rng.normal(size=(B, N, 1)).astype(np.float32)
    with torch.no_grad():
        out_hr, out_lr, hr_pts = ref(_t(x_lr), _t(lr_coords), _t(hr_coords),
                                     _t(t), _t(hr_last))

    from magnet_tpu.models.factory import create_model

    ours = create_model("magnet_gnn", hp)
    params = _j(imp.import_state_dict("magnet_gnn", _sd(ref), hp))
    batch = {"coords_lr": jnp.asarray(lr_coords),
             "coords_hr": jnp.asarray(hr_coords)}
    g_lr, g_all, nbr = ours.build_graph(batch)
    o_hr, o_lr, o_pts = ours.core.apply(
        params, jnp.asarray(x_lr), jnp.asarray(lr_coords),
        jnp.asarray(hr_coords), jnp.asarray(t), jnp.asarray(hr_last),
        g_lr, g_all, nbr,
    )
    np.testing.assert_allclose(np.asarray(o_pts), _n(hr_pts), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_lr), _n(out_lr), rtol=1e-4,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(o_hr), _n(out_hr), rtol=1e-4,
                               atol=2e-5)


@pytest.mark.parametrize("tf", [True, False])
def test_magnet_gnn_training_and_val_loss_parity(tf):
    """MAgNetGNN training_step (noise=0 -> deterministic) and
    validation_step losses (reference magnet_gnn.py:388-475) == ours."""
    m = ref_stubs.load("models.magnet_gnn")
    hp = dict(lr=1e-3, weight_decay=0.0, factor=0.3, step_size=50, loss="l1",
              time_slice=4, num_message_passing_steps=2, latent_dim=8,
              mlp_layers=2, mlp_hidden=16, n_chan=8, radius=0.7,
              codec_neighbors=2, noise=0.0, interpolation="area",
              teacher_forcing=tf)
    ref = m.MAgNetGNN(NS(**hp))
    rng = np.random.default_rng(47)
    B, ts, L, N = 2, 4, 12, 6
    nt = 3 * ts
    batch_np = {
        "t": np.linspace(0, 1, nt, dtype=np.float32)[None].repeat(B, 0),
        "lr_frames": rng.normal(size=(B, nt, 1, L)).astype(np.float32),
        "hr_points": rng.normal(size=(B, nt, N, 1)).astype(np.float32),
        "coords_hr": rng.uniform(-1, 1, (B, N, 2)).astype(np.float32),
        "coords_lr": rng.uniform(-1, 1, (B, L, 2)).astype(np.float32),
    }
    tb = {k: _t(v) for k, v in batch_np.items()}
    with torch.no_grad():
        ref_train = float(ref.training_step(tb, 0))
        ref.validation_step(tb, 0)

    from magnet_tpu.models.factory import create_model

    ours = create_model("magnet_gnn", hp)
    params = _j(imp.import_state_dict("magnet_gnn", _sd(ref), hp))
    jb = {k: jnp.asarray(v) for k, v in batch_np.items()}
    g = ours.build_graph(jb)
    loss, _ = ours.loss(params, jb, g, train=True)
    np.testing.assert_allclose(float(loss), ref_train, rtol=1e-5, atol=1e-6)
    vloss, vmetrics = ours.loss(params, jb, g, train=False)
    np.testing.assert_allclose(
        float(vloss), ref._logged["val_loss"], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        float(vmetrics["mae_loss"]), ref._logged["val_mae_loss"],
        rtol=1e-5, atol=1e-6,
    )


# --------------------------------------------------------------------------
# MAgNet[CNN] no-interaction ablation — full forward (torch-only path:
# EDSR + recurrent INR + LSTM seq2seq attention, reference
# models/magnet_cnn_no_interaction.py:84-241)
# --------------------------------------------------------------------------

def test_no_interaction_full_forward(monkeypatch):
    m = ref_stubs.load("models.magnet_cnn_no_interaction")
    hp = dict(lr=1e-3, weight_decay=0.0, factor=0.3, step_size=50, loss="l1",
              time_slice=4, use_lstm=True, lstm_hidden=8, lstm_layers=2,
              mlp_layers=1, mlp_hidden=8, scales=1, n_chan=8, kernel_size=3,
              res_scale=1, res_layers=2, interpolation="area",
              teacher_forcing=False)
    ref = m.MAgNetCNN_no_interaction(NS(**hp))
    rng = np.random.default_rng(8)
    B, T, L, N = 2, 4, 16, 5
    x_t = rng.normal(size=(B, T, 1, L)).astype(np.float32)
    coords = np.sort(rng.uniform(-1, 1, (B, N, 1)).astype(np.float32), axis=1)
    cells = np.full((B, N, 1), 2.0 / (2 * L), np.float32)
    t = np.linspace(0, 1, 2 * T, dtype=np.float32)[None].repeat(B, 0)
    hr_last = rng.normal(size=(B, N, 1)).astype(np.float32)

    # pin the reference's torch.randn latent init (no_interaction.py:148)
    # to a fixed array we also feed to our core
    latent0 = rng.normal(size=(B, N, hp["lstm_hidden"])).astype(np.float32)
    monkeypatch.setattr(m.torch, "randn",
                        lambda *s, **k: torch.as_tensor(latent0))
    with torch.no_grad():
        ref_out, _ = ref(_t(x_t), _t(coords), _t(cells), _t(t), _t(hr_last))

    from magnet_tpu.models.factory import create_model

    ours = create_model("magnet_cnn_no_interaction", hp)
    params = _j(imp.import_state_dict("magnet_cnn_no_interaction", _sd(ref), hp))
    out = np.asarray(
        ours.core.apply(params, jnp.asarray(x_t), jnp.asarray(coords),
                        jnp.asarray(cells), jnp.asarray(t),
                        jnp.asarray(hr_last), jnp.asarray(latent0))
    )
    np.testing.assert_allclose(out, _n(ref_out), rtol=1e-4, atol=2e-5)


# --------------------------------------------------------------------------
# MAgNet[CNN] 2D — full single-window forward incl. the 4-corner INR with
# the diagonal area swap (reference magnet_cnn_2d.py:248-287, 328-390)
# --------------------------------------------------------------------------

def test_magnet_cnn_2d_full_window_forward():
    m = ref_stubs.load("models.magnet_cnn_2d")
    hp = dict(lr=1e-3, weight_decay=0.0, factor=0.3, step_size=50, loss="l1",
              time_slice=3, num_message_passing_steps=2, latent_dim=8,
              mlp_layers=2, mlp_hidden=16, scales=1, res_layers=2, n_chan=8,
              kernel_size=3, res_scale=1, interpolation="area", radius=0.6,
              teacher_forcing=True)
    ref = m.MAgNetCNN_2d(NS(**hp))
    rng = np.random.default_rng(9)
    B, T, W, N = 2, 3, 6, 5
    x_t = rng.normal(size=(B, T, 1, W, W)).astype(np.float32)
    coords = rng.uniform(-1, 1, (B, N, 2)).astype(np.float32)
    cells = np.full((B, N, 2), 2.0 / (2 * W), np.float32)
    t = np.linspace(0, 1, 2 * T, dtype=np.float32)[None].repeat(B, 0)
    hr_last = rng.normal(size=(B, N, 1)).astype(np.float32)
    with torch.no_grad():
        out_hr, out_lr, hr_pts = ref(_t(x_t), _t(coords), _t(cells), _t(t),
                                     _t(hr_last))

    from magnet_tpu.models.factory import create_model

    ours = create_model("magnet_cnn_2d", hp)
    params = _j(imp.import_state_dict("magnet_cnn_2d", _sd(ref), hp))
    batch = {"coords": jnp.asarray(coords), "lr_frames": jnp.asarray(x_t)}
    g = ours.build_graph(batch)
    o_hr, o_lr, o_pts = ours.core.apply(
        params, jnp.asarray(x_t), jnp.asarray(coords), jnp.asarray(cells),
        jnp.asarray(t), jnp.asarray(hr_last), g,
    )
    np.testing.assert_allclose(np.asarray(o_pts), _n(hr_pts), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_lr), _n(out_lr), rtol=1e-4,
                               atol=2e-5)  # both (B, T_out, C, W, W)
    np.testing.assert_allclose(np.asarray(o_hr), _n(out_hr), rtol=1e-4,
                               atol=2e-5)


@pytest.mark.parametrize("tf", [True, False])
def test_magnet_cnn_training_step_loss_parity(tf):
    """Full training_step loss (multi-window rollout + interp term,
    reference magnet_cnn.py:393-436) == our loss(train=True)."""
    m = ref_stubs.load("models.magnet_cnn")
    hp = dict(CNN_HP, teacher_forcing=tf)
    ref = m.MAgNetCNN(NS(**hp))
    rng = np.random.default_rng(31)
    B, ts, L, N = 2, 4, 16, 6
    nt = 3 * ts                                       # 2 rollout windows
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
    with torch.no_grad():
        ref_loss = float(ref.training_step(
            {k: _t(v) for k, v in batch_np.items()}, 0
        ))

    from magnet_tpu.models.factory import create_model

    ours = create_model("magnet_cnn", hp)
    params = _j(imp.import_state_dict("magnet_cnn", _sd(ref), hp))
    jb = {k: jnp.asarray(v) for k, v in batch_np.items()}
    g = ours.build_graph(jb)
    loss, metrics = ours.loss(params, jb, g, train=True)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        float(metrics["mae_loss"]), ref._logged["train_mae_loss"],
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        float(metrics["interp_loss"]), ref._logged["train_interp_loss"],
        rtol=1e-5, atol=1e-6,
    )


def test_magnet_cnn_validation_step_loss_parity():
    """validation_step (no TF, HR-interpolated feedback, HR-only loss,
    reference magnet_cnn.py:439-467) == our loss(train=False) — the metric
    early stopping and checkpoint selection monitor."""
    m = ref_stubs.load("models.magnet_cnn")
    ref = m.MAgNetCNN(NS(**CNN_HP))
    rng = np.random.default_rng(37)
    B, ts, L, N = 2, 4, 16, 6
    nt = 3 * ts
    batch_np = {
        "t": np.linspace(0, 1, nt, dtype=np.float32)[None].repeat(B, 0),
        "lr_frames": rng.normal(size=(B, nt, 1, L)).astype(np.float32),
        "hr_points": rng.normal(size=(B, nt, N, 1)).astype(np.float32),
        "coords": np.sort(rng.uniform(-1, 1, (B, N, 1)).astype(np.float32), 1),
        "cells": np.full((B, N, 1), 2.0 / (2 * L), np.float32),
    }
    with torch.no_grad():
        ref.validation_step({k: _t(v) for k, v in batch_np.items()}, 0)

    from magnet_tpu.models.factory import create_model

    ours = create_model("magnet_cnn", CNN_HP)
    params = _j(imp.import_state_dict("magnet_cnn", _sd(ref), CNN_HP))
    jb = {k: jnp.asarray(v) for k, v in batch_np.items()}
    g = ours.build_graph(jb)
    loss, metrics = ours.loss(params, jb, g, train=False)
    np.testing.assert_allclose(
        float(loss), ref._logged["val_loss"], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        float(metrics["mae_loss"]), ref._logged["val_mae_loss"],
        rtol=1e-5, atol=1e-6,
    )


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


# --------------------------------------------------------------------------
# Round 2: loss-level parity for the remaining families (fno_2d,
# magnet_cnn_2d, no_interaction).  mpnn_2d is covered at the (corrected)
# forward level only — its reference training_step crashes on its own
# pos-column bug (mpnn_2d.py:179), see test_mpnn_2d_full_forward.
# --------------------------------------------------------------------------

@pytest.mark.parametrize("tf", [True, False])
def test_fno2d_training_and_val_loss_parity(tf):
    """FNO2d training_step / validation_step rollout losses (reference
    fno_2d.py:141-201) == our loss(train=True/False)."""
    m = ref_stubs.load("models.fno_2d")
    hp = NS(**{**FNO_HP, "teacher_forcing": tf}, modes_1=3, modes_2=3,
            width=8, num_layers=2, time_history=4, time_future=4)
    ref = m.FNO2d(hp)
    rng = np.random.default_rng(51)
    B, H, W, nt = 2, 10, 12, 12                       # th=4 + 2 windows
    u = rng.normal(size=(B, nt, H, W)).astype(np.float32)
    dx = np.asarray([0.1, 0.2], np.float32)
    dy = np.asarray([0.15, 0.25], np.float32)
    dt = np.asarray([0.01, 0.02], np.float32)
    tb = (_t(u), _t(dx), _t(dy), _t(dt))
    with torch.no_grad():
        ref_train = float(ref.training_step(tb, 0))
        ref.validation_step(tb, 0)

    from magnet_tpu.models.factory import create_model

    ours = create_model("fno_2d", dict(modes_1=3, modes_2=3, width=8,
                                       num_layers=2, time_history=4,
                                       time_future=4, teacher_forcing=tf,
                                       loss="l1"))
    params = _j(imp.import_state_dict("fno_2d", _sd(ref), vars(hp)))
    jb = {"u": jnp.asarray(u), "dx": jnp.asarray(dx),
          "dy": jnp.asarray(dy), "dt": jnp.asarray(dt)}
    loss, _ = ours.loss(params, jb, None, train=True)
    np.testing.assert_allclose(float(loss), ref_train, rtol=1e-5, atol=1e-6)
    vloss, _ = ours.loss(params, jb, None, train=False)
    np.testing.assert_allclose(
        float(vloss), ref._logged["val_loss"], rtol=1e-5, atol=1e-6
    )


CNN2D_HP = dict(lr=1e-3, weight_decay=0.0, factor=0.3, step_size=50,
                loss="l1", time_slice=3, num_message_passing_steps=2,
                latent_dim=8, mlp_layers=2, mlp_hidden=16, scales=1,
                res_layers=2, n_chan=8, kernel_size=3, res_scale=1,
                interpolation="area", radius=0.6, teacher_forcing=True)


def _cnn2d_batch(rng, B=2, W=6, N=4, ts=3):
    nt = 3 * ts                                       # 2 rollout windows
    return {
        "t": np.linspace(0, 1, nt, dtype=np.float32)[None].repeat(B, 0),
        "lr_frames": rng.normal(size=(B, nt, 1, W, W)).astype(np.float32),
        "hr_points": rng.normal(size=(B, nt, N, 1)).astype(np.float32),
        "coords": rng.uniform(-1, 1, (B, N, 2)).astype(np.float32),
        "cells": np.full((B, N, 2), 2.0 / (2 * W), np.float32),
    }


@pytest.mark.parametrize("tf", [True, False])
def test_magnet_cnn_2d_training_step_loss_parity(tf):
    """2D training_step loss: multi-window rollout over HR points + LR
    pixels plus the interp term (reference magnet_cnn_2d.py:403-445) ==
    our loss(train=True)."""
    m = ref_stubs.load("models.magnet_cnn_2d")
    hp = dict(CNN2D_HP, teacher_forcing=tf)
    ref = m.MAgNetCNN_2d(NS(**hp))
    batch_np = _cnn2d_batch(np.random.default_rng(52))
    with torch.no_grad():
        ref_loss = float(ref.training_step(
            {k: _t(v) for k, v in batch_np.items()}, 0
        ))

    from magnet_tpu.models.factory import create_model

    ours = create_model("magnet_cnn_2d", hp)
    params = _j(imp.import_state_dict("magnet_cnn_2d", _sd(ref), hp))
    jb = {k: jnp.asarray(v) for k, v in batch_np.items()}
    g = ours.build_graph(jb)
    loss, metrics = ours.loss(params, jb, g, train=True)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        float(metrics["mae_loss"]), ref._logged["train_mae_loss"],
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        float(metrics["interp_loss"]), ref._logged["train_interp_loss"],
        rtol=1e-5, atol=1e-6,
    )


def test_magnet_cnn_2d_validation_step_loss_parity():
    """2D validation_step (no TF; sqrt(N)-grid reshape + bilinear
    interpolate feedback, reference magnet_cnn_2d.py:447-478) == our
    loss(train=False).  N must be a perfect square for the reference's
    own reshape — the val dataloader samples the full pixel grid."""
    m = ref_stubs.load("models.magnet_cnn_2d")
    ref = m.MAgNetCNN_2d(NS(**CNN2D_HP))
    batch_np = _cnn2d_batch(np.random.default_rng(53), N=4)
    with torch.no_grad():
        ref.validation_step({k: _t(v) for k, v in batch_np.items()}, 0)

    from magnet_tpu.models.factory import create_model

    ours = create_model("magnet_cnn_2d", CNN2D_HP)
    params = _j(imp.import_state_dict("magnet_cnn_2d", _sd(ref), CNN2D_HP))
    jb = {k: jnp.asarray(v) for k, v in batch_np.items()}
    g = ours.build_graph(jb)
    loss, metrics = ours.loss(params, jb, g, train=False)
    np.testing.assert_allclose(
        float(loss), ref._logged["val_loss"], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        float(metrics["mae_loss"]), ref._logged["val_mae_loss"],
        rtol=1e-5, atol=1e-6,
    )


NOINT_HP = dict(lr=1e-3, weight_decay=0.0, factor=0.3, step_size=50,
                loss="l1", time_slice=4, use_lstm=True, lstm_hidden=8,
                lstm_layers=2, mlp_layers=1, mlp_hidden=8, scales=1,
                n_chan=8, kernel_size=3, res_scale=1, res_layers=2,
                interpolation="area", teacher_forcing=True)


@pytest.mark.parametrize("tf", [True, False])
def test_no_interaction_training_and_val_loss_parity(monkeypatch, tf):
    """no_interaction training_step (scatter feedback at sample_idx when
    not teacher forcing, reference magnet_cnn_no_interaction.py:253-291)
    and validation_step (prediction-as-frames feedback, :293-319) == our
    loss(train=True/False).  N == L so the reference's val feedback keeps
    a static frame shape (matching the val dataloader's full-grid
    sampling); the torch.randn LSTM latent init is pinned to a fixed
    array fed to both sides."""
    m = ref_stubs.load("models.magnet_cnn_no_interaction")
    hp = dict(NOINT_HP, teacher_forcing=tf)
    ref = m.MAgNetCNN_no_interaction(NS(**hp))
    rng = np.random.default_rng(54)
    B, L, ts = 2, 12, 4
    N, nt = L, 3 * ts                                 # 2 rollout windows
    batch_np = {
        "t": np.linspace(0, 1, nt, dtype=np.float32)[None].repeat(B, 0),
        "hr_frames": rng.normal(size=(B, nt, 1, L)).astype(np.float32),
        "hr_points": rng.normal(size=(B, nt, N, 1)).astype(np.float32),
        "coords": np.sort(rng.uniform(-1, 1, (B, N, 1)).astype(np.float32), 1),
        "cells": np.full((B, N, 1), 2.0 / (2 * L), np.float32),
        "sample_idx": np.stack(
            [np.sort(rng.permutation(L)) for _ in range(B)]
        ),
    }
    latent0 = rng.normal(size=(B, N, hp["lstm_hidden"])).astype(np.float32)
    monkeypatch.setattr(m.torch, "randn",
                        lambda *s, **k: torch.as_tensor(latent0))
    with torch.no_grad():
        ref_train = float(ref.training_step(
            {k: _t(v) for k, v in batch_np.items()}, 0
        ))
        ref.validation_step({k: _t(v) for k, v in batch_np.items()}, 0)

    from magnet_tpu.models.factory import create_model

    ours = create_model("magnet_cnn_no_interaction", hp)
    ours._latent0 = lambda rng, B, N: jnp.asarray(latent0)
    params = _j(imp.import_state_dict(
        "magnet_cnn_no_interaction", _sd(ref), hp))
    jb = {k: jnp.asarray(v) for k, v in batch_np.items()}
    loss, metrics = ours.loss(params, jb, None, train=True)
    np.testing.assert_allclose(float(loss), ref_train, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        float(metrics["mae_loss"]), ref._logged["train_mae_loss"],
        rtol=1e-5, atol=1e-6,
    )
    vloss, vmetrics = ours.loss(params, jb, None, train=False)
    np.testing.assert_allclose(
        float(vloss), ref._logged["val_loss"], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        float(vmetrics["mae_loss"]), ref._logged["val_mae_loss"],
        rtol=1e-5, atol=1e-6,
    )
