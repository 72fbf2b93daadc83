"""Torch checkpoint importer: structural match against our param trees and
numerical parity of imported components against a numpy implementation of
the reference's torch semantics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from magnet_tpu.models.factory import create_model
from magnet_tpu.train.import_torch import import_state_dict


def _rand_sd_magnet_cnn(hp, rng):
    """Synthesize a state_dict with the reference's key names/shapes
    (names derived from reference models/magnet_cnn.py + backbones)."""
    ts, latent = hp["time_slice"], hp["latent_dim"]
    ml, mh = hp["mlp_layers"], hp["mlp_hidden"]
    nch, k, nres, mp = hp["n_chan"], hp["kernel_size"], hp["res_layers"], hp[
        "num_message_passing_steps"]
    sd = {}

    def lin(name, i, o):
        sd[f"{name}.weight"] = rng.normal(size=(o, i)).astype(np.float32) * 0.2
        sd[f"{name}.bias"] = rng.normal(size=(o,)).astype(np.float32) * 0.1

    def ln(name, d):
        sd[f"{name}.weight"] = rng.normal(size=(d,)).astype(np.float32) * 0.1 + 1
        sd[f"{name}.bias"] = rng.normal(size=(d,)).astype(np.float32) * 0.1

    def conv(name, i, o):
        sd[f"{name}.weight"] = rng.normal(size=(o, i, k)).astype(np.float32) * 0.2
        sd[f"{name}.bias"] = rng.normal(size=(o,)).astype(np.float32) * 0.1

    def mlp(name, i, o):
        dims = [i] + [mh] * ml + [o]
        for j in range(ml + 1):
            lin(f"{name}.layers.{2 * j}", dims[j], dims[j + 1])

    conv("encoder.head_conv", ts, nch)
    for r in range(nres):
        conv(f"encoder.res_layers.{r}.conv_1", nch, nch)
        conv(f"encoder.res_layers.{r}.conv_2", nch, nch)
    conv("encoder.tail_conv", nch, nch)
    mlp("proj_head.0", nch + 3 + 1, nch)
    ln("proj_head.1", nch)
    mlp("projector", nch, 1)
    mlp("_encoder.node_fn.0", ts + 2, latent)
    ln("_encoder.node_fn.1", latent)
    mlp("_encoder.edge_fn.0", ts + 1, latent)
    ln("_encoder.edge_fn.1", latent)
    for i in range(mp):
        mlp(f"_processor.gnn_stacks.{i}.edge_fn.0", 3 * latent, latent)
        ln(f"_processor.gnn_stacks.{i}.edge_fn.1", latent)
        mlp(f"_processor.gnn_stacks.{i}.node_fn.0", 2 * latent, latent)
        ln(f"_processor.gnn_stacks.{i}.node_fn.1", latent)
    mlp("_decoder.node_fn", latent, ts)
    return sd


HP = dict(time_slice=16, latent_dim=8, num_message_passing_steps=2,
          mlp_layers=2, mlp_hidden=16, n_chan=16, kernel_size=3,
          res_layers=2, radius=0.3, teacher_forcing=True, loss="l1")


def _np_mlp(sd, prefix, n_hidden, x):
    """Reference MLP forward in numpy (relu)."""
    h = x
    for j in range(n_hidden + 1):
        w = sd[f"{prefix}.layers.{2 * j}.weight"]
        b = sd[f"{prefix}.layers.{2 * j}.bias"]
        h = h @ w.T + b
        if j < n_hidden:
            h = np.maximum(h, 0)
    return h


def _np_ln(sd, prefix, x, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    v = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(v + eps) * sd[f"{prefix}.weight"] + sd[f"{prefix}.bias"]


def test_import_magnet_cnn_structure_and_forward():
    rng = np.random.default_rng(0)
    sd = _rand_sd_magnet_cnn(HP, rng)
    imported = import_state_dict("magnet_cnn", sd, HP)

    # structural match vs an initialized tree
    B, nt, L, N = 2, 48, 32, 16
    batch = {
        "t": jnp.asarray(np.linspace(0, 1, nt, dtype=np.float32)[None].repeat(B, 0)),
        "lr_frames": jnp.asarray(rng.normal(size=(B, nt, 1, L)).astype(np.float32)),
        "hr_points": jnp.asarray(rng.normal(size=(B, nt, N, 1)).astype(np.float32)),
        "coords": jnp.asarray(
            np.sort(rng.uniform(-1, 1, (B, N, 1)).astype(np.float32), axis=1)
        ),
        "cells": jnp.asarray(np.full((B, N, 1), 2.0 / (2 * L), np.float32)),
    }
    m = create_model("magnet_cnn", HP)
    g = m.build_graph(batch)
    ref_params = m.init(jax.random.PRNGKey(0), batch, g)

    ref_shapes = jax.tree.map(lambda a: tuple(a.shape), ref_params)
    imp_shapes = jax.tree.map(lambda a: tuple(a.shape), imported)
    assert ref_shapes == imp_shapes, "imported tree structure/shape mismatch"

    # the model must run with imported weights
    loss, _ = m.loss(jax.tree.map(jnp.asarray, imported), batch, g, train=True)
    assert np.isfinite(float(loss))

    # numerical parity: _decoder (pure MLP) against numpy torch semantics
    x = rng.normal(size=(5, HP["latent_dim"])).astype(np.float32)
    from magnet_tpu.nn.graphnet import GraphDecoder

    dec = GraphDecoder(node_out=HP["time_slice"], mlp_layers=HP["mlp_layers"],
                       mlp_hidden=HP["mlp_hidden"])
    ours = dec.apply({"params": imported["params"]["_decoder"]}, jnp.asarray(x))
    ref = _np_mlp(sd, "_decoder.node_fn", HP["mlp_layers"], x)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)

    # numerical parity: processor edge path — split weights must reproduce
    # the unsplit torch first layer (edge_mlp on explicit concat)
    from magnet_tpu.nn.graphnet import InteractionNetwork

    latent = HP["latent_dim"]
    inet = InteractionNetwork(node_out=latent, edge_out=latent,
                              mlp_layers=HP["mlp_layers"],
                              mlp_hidden=HP["mlp_hidden"])
    step0 = jax.tree.map(lambda a: a[0], imported["params"]["_processor"]["steps"]["step"])
    cat = rng.normal(size=(7, 3 * latent)).astype(np.float32)
    ours_msg = inet.apply({"params": step0}, jnp.asarray(cat), method="edge_mlp")
    ref_msg = _np_ln(
        sd, "_processor.gnn_stacks.0.edge_fn.1",
        _np_mlp(sd, "_processor.gnn_stacks.0.edge_fn.0", HP["mlp_layers"], cat),
    )
    np.testing.assert_allclose(np.asarray(ours_msg), ref_msg, rtol=1e-4, atol=1e-4)


def test_import_fno_1d_numerical():
    rng = np.random.default_rng(1)
    hp = dict(modes=4, width=8, num_layers=2, time_history=6, time_future=6,
              teacher_forcing=True)
    sd = {}
    sd["fc0.weight"] = rng.normal(size=(8, 8)).astype(np.float32) * 0.3
    sd["fc0.bias"] = rng.normal(size=(8,)).astype(np.float32) * 0.1
    sd["fc1.weight"] = rng.normal(size=(128, 8)).astype(np.float32) * 0.3
    sd["fc1.bias"] = rng.normal(size=(128,)).astype(np.float32) * 0.1
    sd["fc2.weight"] = rng.normal(size=(6, 128)).astype(np.float32) * 0.3
    sd["fc2.bias"] = rng.normal(size=(6,)).astype(np.float32) * 0.1
    for i in range(2):
        sd[f"fourier_layers.{i}.weights"] = (
            rng.normal(size=(8, 8, 4)) + 1j * rng.normal(size=(8, 8, 4))
        ).astype(np.complex64) * 0.1
        sd[f"conv_layers.{i}.weight"] = rng.normal(size=(8, 8, 1)).astype(np.float32) * 0.3
        sd[f"conv_layers.{i}.bias"] = rng.normal(size=(8,)).astype(np.float32) * 0.1

    imported = import_state_dict("fno_1d", sd, hp)
    m = create_model("fno_1d", dict(**hp, loss="l1"))
    u = jnp.asarray(rng.normal(size=(2, 16, 6)).astype(np.float32))  # (B, L, T)
    out = m.core.apply(jax.tree.map(jnp.asarray, imported), u,
                       jnp.asarray([0.1, 0.1]), jnp.asarray([0.01, 0.01]))
    assert out.shape == (2, 16, 6) and np.isfinite(np.asarray(out)).all()

    # torch-semantics numpy forward of fc0 for one point
    x0 = np.concatenate([np.asarray(u[0, 0]), [0.1], [0.01]])
    ref0 = x0 @ sd["fc0.weight"].T + sd["fc0.bias"]
    # extract our fc0 output by applying the Dense directly
    ours0 = x0 @ np.asarray(imported["params"]["fc0"]["Dense_0"]["kernel"]) + np.asarray(
        imported["params"]["fc0"]["Dense_0"]["bias"]
    )
    np.testing.assert_allclose(ours0, ref0, rtol=1e-5, atol=1e-6)


def test_import_mpnn_structure():
    rng = np.random.default_rng(2)
    hp = dict(hidden_features=128, hidden_layer=2, time_window=10,
              neighbors=3, teacher_forcing=False, loss="l1")
    sd = {}

    def lin(name, i, o):
        sd[f"{name}.weight"] = rng.normal(size=(o, i)).astype(np.float32) * 0.1
        sd[f"{name}.bias"] = rng.normal(size=(o,)).astype(np.float32) * 0.1

    lin("embedding_mlp.0", 10 + 2, 128)
    lin("embedding_mlp.2", 128, 128)
    for i in range(2):
        lin(f"gnn_layers.{i}.message_net_1.0", 2 * 128 + 10 + 1 + 1, 128)
        lin(f"gnn_layers.{i}.message_net_2.0", 128, 128)
        lin(f"gnn_layers.{i}.update_net_1.0", 128 + 128 + 1, 128)
        lin(f"gnn_layers.{i}.update_net_2.0", 128, 128)
    sd["output_mlp.0.weight"] = rng.normal(size=(8, 1, 16)).astype(np.float32) * 0.1
    sd["output_mlp.0.bias"] = rng.normal(size=(8,)).astype(np.float32) * 0.1
    sd["output_mlp.1.weight"] = rng.normal(size=(1, 8, 10)).astype(np.float32) * 0.1
    sd["output_mlp.1.bias"] = rng.normal(size=(1,)).astype(np.float32) * 0.1

    imported = import_state_dict("mpnn", sd, hp)

    B, N, nt = 2, 30, 30
    batch = {
        "u": jnp.asarray(rng.normal(size=(B, N, nt)).astype(np.float32)),
        "x": jnp.asarray(np.linspace(0, 16, N, dtype=np.float32)[None, :, None].repeat(B, 0)),
        "t": jnp.asarray(np.linspace(0, 2, nt, dtype=np.float32)[None].repeat(B, 0)),
    }
    m = create_model("mpnn", hp)
    g = m.build_graph(batch)
    ref_params = m.init(jax.random.PRNGKey(0), batch, g)
    ref_shapes = jax.tree.map(lambda a: tuple(a.shape), ref_params)
    imp_shapes = jax.tree.map(lambda a: tuple(a.shape), jax.tree.map(jnp.asarray, imported))
    assert ref_shapes == imp_shapes
    loss, _ = m.loss(jax.tree.map(jnp.asarray, imported), batch, g, train=True)
    assert np.isfinite(float(loss))


def test_import_magnet_gnn_structure():
    rng = np.random.default_rng(3)
    hp = dict(time_slice=16, latent_dim=8, num_message_passing_steps=2,
              mlp_layers=2, mlp_hidden=16, n_chan=16, radius=0.3,
              codec_neighbors=4, noise=0.0, interpolation="area",
              teacher_forcing=True, loss="l1")
    ts, latent, ml, mh, nch = 16, 8, 2, 16, 16
    sd = {}

    def lin(name, i, o):
        sd[f"{name}.weight"] = rng.normal(size=(o, i)).astype(np.float32) * 0.1
        sd[f"{name}.bias"] = rng.normal(size=(o,)).astype(np.float32) * 0.1

    def ln(name, d):
        sd[f"{name}.weight"] = np.ones(d, np.float32)
        sd[f"{name}.bias"] = np.zeros(d, np.float32)

    def mlp(name, i, o):
        dims = [i] + [mh] * ml + [o]
        for j in range(ml + 1):
            lin(f"{name}.layers.{2 * j}", dims[j], dims[j + 1])

    for pfx in ("encoder", "_encoder"):
        mlp(f"{pfx}.node_fn.0", ts + 2, latent)   # 1D coords: ts+1+1
        ln(f"{pfx}.node_fn.1", latent)
        mlp(f"{pfx}.edge_fn.0", ts + 1, latent)
        ln(f"{pfx}.edge_fn.1", latent)
    for pfx in ("processor", "_processor"):
        for i in range(2):
            mlp(f"{pfx}.gnn_stacks.{i}.edge_fn.0", 3 * latent, latent)
            ln(f"{pfx}.gnn_stacks.{i}.edge_fn.1", latent)
            mlp(f"{pfx}.gnn_stacks.{i}.node_fn.0", 2 * latent, latent)
            ln(f"{pfx}.gnn_stacks.{i}.node_fn.1", latent)
    mlp("_decoder.node_fn", latent, ts)
    mlp("projector", nch, 1)
    lin("proj_head", latent + 1 + 1 + 1, nch)     # latent+C+P+1 (1D)

    imported = import_state_dict("magnet_gnn", sd, hp)

    B, nt, L, N = 2, 48, 32, 16
    batch = {
        "t": jnp.asarray(np.linspace(0, 1, nt, dtype=np.float32)[None].repeat(B, 0)),
        "lr_frames": jnp.asarray(rng.normal(size=(B, nt, 1, L)).astype(np.float32)),
        "hr_points": jnp.asarray(rng.normal(size=(B, nt, N, 1)).astype(np.float32)),
        "coords_hr": jnp.asarray(
            np.sort(rng.uniform(-1, 1, (B, N, 1)).astype(np.float32), axis=1)
        ),
        "coords_lr": jnp.asarray(
            np.sort(rng.uniform(-1, 1, (B, L, 1)).astype(np.float32), axis=1)
        ),
    }
    m = create_model("magnet_gnn", hp)
    g = m.build_graph(batch)
    ref_params = m.init(jax.random.PRNGKey(0), batch, g)
    ref_shapes = jax.tree.map(lambda a: tuple(a.shape), ref_params)
    imp_shapes = jax.tree.map(lambda a: tuple(a.shape), jax.tree.map(jnp.asarray, imported))
    assert ref_shapes == imp_shapes
    loss, _ = m.loss(jax.tree.map(jnp.asarray, imported), batch, g, train=True)
    assert np.isfinite(float(loss))


def test_import_no_interaction_structure():
    rng = np.random.default_rng(4)
    hp = dict(time_slice=16, use_lstm=True, lstm_hidden=16, lstm_layers=2,
              mlp_layers=1, mlp_hidden=8, scales=1, n_chan=8, kernel_size=3,
              res_layers=1, teacher_forcing=False, loss="l1")
    H, ml, mh, nch, k = 16, 1, 8, 8, 3
    sd = {}

    def lin(name, i, o, bias=True):
        sd[f"{name}.weight"] = rng.normal(size=(o, i)).astype(np.float32) * 0.1
        if bias:
            sd[f"{name}.bias"] = rng.normal(size=(o,)).astype(np.float32) * 0.1

    def conv(name, i, o):
        sd[f"{name}.weight"] = rng.normal(size=(o, i, k)).astype(np.float32) * 0.1
        sd[f"{name}.bias"] = rng.normal(size=(o,)).astype(np.float32) * 0.1

    conv("encoder.head_conv", hp["time_slice"], nch)
    conv("encoder.res_layers.0.conv_1", nch, nch)
    conv("encoder.res_layers.0.conv_2", nch, nch)
    conv("encoder.tail_conv", nch, nch)
    lin("proj_head", nch + 3 + 1 + H, H)
    for pfx, in0 in (("lstm_encoder", 2 + H), ("lstm_decoder", 2 * H)):
        for layer in range(2):
            i_dim = in0 if layer == 0 else H
            sd[f"{pfx}.weight_ih_l{layer}"] = rng.normal(size=(4 * H, i_dim)).astype(np.float32) * 0.1
            sd[f"{pfx}.weight_hh_l{layer}"] = rng.normal(size=(4 * H, H)).astype(np.float32) * 0.1
            sd[f"{pfx}.bias_ih_l{layer}"] = rng.normal(size=(4 * H,)).astype(np.float32) * 0.1
            sd[f"{pfx}.bias_hh_l{layer}"] = rng.normal(size=(4 * H,)).astype(np.float32) * 0.1
    lin("attn.0", 3 * H, H)
    lin("attn.2", H, 1, bias=False)
    sd["layernorm.weight"] = np.ones(H, np.float32)
    sd["layernorm.bias"] = np.zeros(H, np.float32)
    dims = [H] + [mh] * ml + [1]
    for j in range(ml + 1):
        lin(f"decoder.layers.{2 * j}", dims[j], dims[j + 1])

    imported = import_state_dict("magnet_cnn_no_interaction", sd, hp)

    B, nt, L, N = 2, 48, 32, 8
    batch = {
        "t": jnp.asarray(np.linspace(0, 1, nt, dtype=np.float32)[None].repeat(B, 0)),
        "hr_frames": jnp.asarray(rng.normal(size=(B, nt, 1, L)).astype(np.float32)),
        "hr_points": jnp.asarray(rng.normal(size=(B, nt, N, 1)).astype(np.float32)),
        "coords": jnp.asarray(
            np.sort(rng.uniform(-1, 1, (B, N, 1)).astype(np.float32), axis=1)
        ),
        "cells": jnp.asarray(np.full((B, N, 1), 2.0 / (2 * L), np.float32)),
        "sample_idx": jnp.asarray(
            np.stack([np.sort(rng.choice(L, N, replace=False)) for _ in range(B)])
        ),
    }
    m = create_model("magnet_cnn_no_interaction", hp)
    ref_params = m.init(jax.random.PRNGKey(0), batch, None)
    ref_shapes = jax.tree.map(lambda a: tuple(a.shape), ref_params)
    imp_shapes = jax.tree.map(lambda a: tuple(a.shape), jax.tree.map(jnp.asarray, imported))
    assert ref_shapes == imp_shapes
    loss, _ = m.loss(jax.tree.map(jnp.asarray, imported), batch, None, train=True)
    assert np.isfinite(float(loss))
