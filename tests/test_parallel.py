"""Multi-device tests on the virtual 8-CPU mesh: edge-partitioned processor
parity vs the single-device GraphProcessor, and the dp training-step dryrun."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from magnet_tpu.nn.graphnet import GraphProcessor, InteractionNetwork
from magnet_tpu.ops.graph import pad_graph, radius_graph_np
from magnet_tpu.parallel.graph_partition import (
    interaction_step_local,
    make_partitioned_processor,
    partition_graph,
)
from magnet_tpu.parallel.mesh import make_mesh


LATENT = 8
STEPS = 3


def _setup_graph(n=24, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-1, 1, (n, 2))
    s, t = radius_graph_np(pos, 0.6, loop=True)
    return s, t, n


def test_partitioned_processor_matches_single_device():
    s, t, n = _setup_graph()
    B, G, DP = 2, 4, 2
    mesh = make_mesh(dp=DP, graph=G)

    rng = np.random.default_rng(1)
    sg = partition_graph(s, t, n, G)
    n_pad = sg.n_node_pad
    x = rng.normal(size=(B, n_pad, LATENT)).astype(np.float32)
    e_total = int(sg.senders.shape[1]) * G

    # reference: single-device processor on the same (padded) graph
    from magnet_tpu.models.common import Graph as GraphNT

    proc = GraphProcessor(
        latent_dim=LATENT, num_steps=STEPS, mlp_layers=2, mlp_hidden=LATENT
    )
    # rebuild an equivalent unpartitioned padded graph (table layout)
    g1 = pad_graph(s, t, n_pad, e_pad=len(s))
    gs1 = GraphNT(
        senders=jnp.asarray(g1.senders),
        receivers=jnp.asarray(g1.receivers),
        edge_mask=jnp.asarray(g1.edge_mask),
        recv_edge_ids=jnp.asarray(g1.recv_edge_ids),
    )
    params = proc.init(
        jax.random.PRNGKey(0),
        jnp.asarray(x[0]),
        jnp.zeros((len(s), LATENT)),
        gs1,
    )
    e_feats_full = rng.normal(size=(len(s), LATENT)).astype(np.float32)

    def single(xb):
        out, _ = proc.apply(params, xb, jnp.asarray(e_feats_full), gs1)
        return out

    ref = np.stack([np.asarray(single(jnp.asarray(x[b]))) for b in range(B)])

    # partitioned: same per-step params, edge latents scattered to shards
    e_shard = sg.senders.shape[1]
    e_sharded = np.zeros((B, G, e_shard, LATENT), np.float32)
    # map original edge order into shard slots: rebuild shard assignment
    ns = n_pad // G
    shard_of = t // ns
    slot = np.zeros(G, np.int64)
    for eid in range(len(s)):
        g = shard_of[eid]
        e_sharded[:, g, slot[g]] = e_feats_full[eid]
        slot[g] += 1

    inet = InteractionNetwork(
        node_out=LATENT, edge_out=LATENT, mlp_layers=2, mlp_hidden=LATENT
    )
    stacked = params["params"]["steps"]["step"]
    step_params = [
        {"params": jax.tree.map(lambda a: a[i], stacked)} for i in range(STEPS)
    ]

    def iapply(params_i, x_full, e, senders, recv_loc, mask, table):
        return interaction_step_local(
            inet, params_i, x_full, e, senders, recv_loc, mask, table
        )

    runner = make_partitioned_processor(iapply, STEPS, mesh)
    xs = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P("dp", "graph"))
    )
    args = [jnp.asarray(a) for a in (sg.senders, sg.receivers_loc,
                                     sg.edge_mask, sg.recv_edge_ids)]
    eargs = [jnp.broadcast_to(a[None], (B,) + a.shape) for a in args]
    ed = NamedSharding(mesh, P("dp", "graph"))
    eargs = [jax.device_put(a, ed) for a in eargs]
    e_in = jax.device_put(jnp.asarray(e_sharded), ed)

    out, _ = jax.jit(runner)(step_params, xs, e_in, *eargs)
    out = np.asarray(out)

    np.testing.assert_allclose(out[:, :n], ref[:, :n], rtol=2e-4, atol=2e-5)


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_flagship_graph_parallel_matches_standard():
    """MAgNetCNN1D with the GraphProcessor edge-partitioned over a
    dp=2 x graph=4 mesh == the standard single-device path (same params)."""
    from magnet_tpu.models.factory import create_model

    rng = np.random.default_rng(0)
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
    m = create_model(
        "magnet_cnn",
        dict(time_slice=16, latent_dim=8, num_message_passing_steps=2,
             mlp_layers=2, mlp_hidden=16, n_chan=16, res_layers=1,
             radius=0.3, teacher_forcing=True, loss="l1"),
    )
    g = m.build_graph(batch)
    params = m.init(jax.random.PRNGKey(0), batch, g)
    ref_loss, ref_metrics = m.loss(params, batch, g, train=True)

    mesh = make_mesh(dp=2, graph=4)
    pg = m.build_graph_partitioned(batch, n_shards=4)
    # shard batch over dp, graph arrays over (dp, graph)
    bs = NamedSharding(mesh, P("dp"))
    batch_sh = {k: jax.device_put(v, bs) for k, v in batch.items()}
    eg = NamedSharding(mesh, P("dp", "graph"))
    for k in ("senders", "recv_loc", "mask", "table"):
        pg[k] = jax.device_put(pg[k], eg)

    loss_p, metrics_p = jax.jit(
        lambda p, b: m.loss_partitioned(p, b, pg, mesh, train=True)
    )(params, batch_sh)

    np.testing.assert_allclose(float(loss_p), float(ref_loss), rtol=2e-4)
    np.testing.assert_allclose(
        float(metrics_p["mae_loss"]), float(ref_metrics["mae_loss"]), rtol=2e-4
    )

    # gradients agree too
    gref = jax.grad(lambda p: m.loss(p, batch, g, train=True)[0])(params)
    gpar = jax.jit(
        jax.grad(lambda p: m.loss_partitioned(p, batch_sh, pg, mesh, train=True)[0])
    )(params)
    ref_n = float(sum(jnp.sum(x**2) for x in jax.tree.leaves(gref)) ** 0.5)
    par_n = float(sum(jnp.sum(x**2) for x in jax.tree.leaves(gpar)) ** 0.5)
    np.testing.assert_allclose(par_n, ref_n, rtol=5e-3)


def test_flagship_graph_parallel_val_matches_standard():
    """loss_partitioned(train=False) must monitor the SAME val_mae_loss as
    the standard path: no-TF rollout with HR-interpolated feedback
    (reference magnet_cnn.py:458-459), HR-only criterion, no interp term —
    otherwise early stopping/checkpoint selection would differ between
    sharded and unsharded training."""
    from magnet_tpu.models.factory import create_model

    rng = np.random.default_rng(13)
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
    m = create_model(
        "magnet_cnn",
        dict(time_slice=16, latent_dim=8, num_message_passing_steps=2,
             mlp_layers=2, mlp_hidden=16, n_chan=16, res_layers=1,
             radius=0.3, teacher_forcing=True, loss="l1"),
    )
    g = m.build_graph(batch)
    params = m.init(jax.random.PRNGKey(0), batch, g)
    ref_loss, ref_metrics = m.loss(params, batch, g, train=False)

    mesh = make_mesh(dp=2, graph=4)
    pg = m.build_graph_partitioned(batch, n_shards=4)
    bs = NamedSharding(mesh, P("dp"))
    batch_sh = {k: jax.device_put(v, bs) for k, v in batch.items()}
    eg = NamedSharding(mesh, P("dp", "graph"))
    for k in ("senders", "recv_loc", "mask", "table"):
        pg[k] = jax.device_put(pg[k], eg)

    loss_v, metrics_v = jax.jit(
        lambda p, b: m.loss_partitioned(p, b, pg, mesh, train=False)
    )(params, batch_sh)
    np.testing.assert_allclose(float(loss_v), float(ref_loss), rtol=2e-4)
    np.testing.assert_allclose(
        float(metrics_v["mae_loss"]), float(ref_metrics["mae_loss"]), rtol=2e-4
    )
    assert "interp_loss" not in metrics_v


def _place_gnn_pg(pg, mesh):
    bs = NamedSharding(mesh, P("dp"))
    eg = NamedSharding(mesh, P("dp", "graph"))
    out = {}
    for gk in ("lr", "all"):
        g = dict(pg[gk])
        for k in ("senders", "recv_loc", "mask", "table"):
            g[k] = jax.device_put(g[k], eg)
        for k in ("senders_flat", "receivers_flat"):
            g[k] = jax.device_put(g[k], bs)
        out[gk] = g
    out["nbr"] = jax.device_put(pg["nbr"], bs)
    return out


def test_magnet_gnn_graph_parallel_matches_standard():
    """MAgNetGNN partitioned path (both graphs sharded over graph=4) ==
    standard path, train AND val losses + grads."""
    from magnet_tpu.models.factory import create_model

    rng = np.random.default_rng(17)
    B, nt, L, N, ts = 2, 12, 24, 10, 4
    batch = {
        "t": jnp.asarray(np.linspace(0, 1, nt, dtype=np.float32)[None].repeat(B, 0)),
        "lr_frames": jnp.asarray(rng.normal(size=(B, nt, 1, L)).astype(np.float32)),
        "hr_points": jnp.asarray(rng.normal(size=(B, nt, N, 1)).astype(np.float32)),
        "coords_lr": jnp.asarray(rng.uniform(-1, 1, (B, L, 2)).astype(np.float32)),
        "coords_hr": jnp.asarray(rng.uniform(-1, 1, (B, N, 2)).astype(np.float32)),
    }
    m = create_model(
        "magnet_gnn",
        dict(time_slice=ts, latent_dim=8, num_message_passing_steps=2,
             mlp_layers=2, mlp_hidden=16, n_chan=8, radius=0.7,
             codec_neighbors=2, noise=0.0, interpolation="area",
             teacher_forcing=True, loss="l1"),
    )
    g = m.build_graph(batch)
    params = m.init(jax.random.PRNGKey(0), batch, g)

    mesh = make_mesh(dp=2, graph=4)
    pg = _place_gnn_pg(m.build_graph_partitioned(batch, n_shards=4), mesh)
    bs = NamedSharding(mesh, P("dp"))
    batch_sh = {k: jax.device_put(v, bs) for k, v in batch.items()}

    for train in (True, False):
        ref_loss, ref_metrics = m.loss(params, batch, g, train=train)
        loss_p, metrics_p = jax.jit(
            lambda p, b, tr=train: m.loss_partitioned(p, b, pg, mesh, train=tr)
        )(params, batch_sh)
        np.testing.assert_allclose(float(loss_p), float(ref_loss), rtol=2e-4)
        np.testing.assert_allclose(
            float(metrics_p["mae_loss"]), float(ref_metrics["mae_loss"]),
            rtol=2e-4,
        )

    gref = jax.grad(lambda p: m.loss(p, batch, g, train=True)[0])(params)
    gpar = jax.jit(
        jax.grad(lambda p: m.loss_partitioned(p, batch_sh, pg, mesh,
                                              train=True)[0])
    )(params)
    ref_n = float(sum(jnp.sum(x**2) for x in jax.tree.leaves(gref)) ** 0.5)
    par_n = float(sum(jnp.sum(x**2) for x in jax.tree.leaves(gpar)) ** 0.5)
    np.testing.assert_allclose(par_n, ref_n, rtol=5e-3)


@pytest.mark.parametrize("name", ["mpnn", "mpnn_2d"])
def test_mpnn_graph_parallel_matches_standard(name):
    """MPNN partitioned path (incl. the GLOBAL psum'd InstanceNorm) ==
    standard path, train AND val losses + grads."""
    from magnet_tpu.models.factory import create_model

    rng = np.random.default_rng(19)
    tw = 10
    if name == "mpnn":
        B, N, nt = 2, 30, 2 * tw
        x = np.linspace(0, 16, N, dtype=np.float32)[None, :, None].repeat(B, 0)
        hp = dict(hidden_features=128, hidden_layer=2, time_window=tw,
                  neighbors=2, teacher_forcing=False, loss="l1")
    else:
        W = 6
        B, N, nt = 2, W * W, 2 * tw
        gx, gy = np.meshgrid(np.linspace(0, 2, W), np.linspace(0, 2, W),
                             indexing="ij")
        x = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)[
            None].repeat(B, 0)
        hp = dict(hidden_features=128, hidden_layer=2, time_window=tw,
                  neighbors=1, teacher_forcing=False, loss="l1")
    batch = {
        "u": jnp.asarray(rng.normal(size=(B, N, nt)).astype(np.float32)),
        "x": jnp.asarray(x),
        "t": jnp.asarray(
            np.linspace(0, 2, nt, dtype=np.float32)[None].repeat(B, 0)
        ),
    }
    m = create_model(name, hp)
    g = m.build_graph(batch)
    params = m.init(jax.random.PRNGKey(0), batch, g)

    mesh = make_mesh(dp=2, graph=4)
    pg = m.build_graph_partitioned(batch, n_shards=4)
    bs = NamedSharding(mesh, P("dp"))
    batch_sh = {k: jax.device_put(v, bs) for k, v in batch.items()}
    eg = NamedSharding(mesh, P("dp", "graph"))
    for k in ("senders", "recv_loc", "mask", "table"):
        pg[k] = jax.device_put(pg[k], eg)

    for train in (True, False):
        ref_loss, _ = m.loss(params, batch, g, train=train)
        loss_p, _ = jax.jit(
            lambda p, b, tr=train: m.loss_partitioned(p, b, pg, mesh, train=tr)
        )(params, batch_sh)
        np.testing.assert_allclose(float(loss_p), float(ref_loss), rtol=2e-4)

    gref = jax.grad(lambda p: m.loss(p, batch, g, train=True)[0])(params)
    gpar = jax.jit(
        jax.grad(lambda p: m.loss_partitioned(p, batch_sh, pg, mesh,
                                              train=True)[0])
    )(params)
    ref_n = float(sum(jnp.sum(v**2) for v in jax.tree.leaves(gref)) ** 0.5)
    par_n = float(sum(jnp.sum(v**2) for v in jax.tree.leaves(gpar)) ** 0.5)
    np.testing.assert_allclose(par_n, ref_n, rtol=5e-3)


@pytest.mark.parametrize("interpret", [False, True])
def test_flagship_fused_partitioned_matches_standard(interpret, monkeypatch):
    """The FUSED partitioned variant (per-shard blocked layout, real
    InteractionNetwork fused step under shard_map) == standard path.
    interpret=True runs the actual Pallas kernel bodies (interpret mode)
    inside shard_map on the CPU mesh."""
    import os

    from magnet_tpu.models.factory import create_model

    if interpret:
        monkeypatch.setenv("MAGNET_TPU_PALLAS_INTERPRET", "1")

    rng = np.random.default_rng(23)
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
    m = create_model(
        "magnet_cnn",
        dict(time_slice=16, latent_dim=8, num_message_passing_steps=2,
             mlp_layers=2, mlp_hidden=16, n_chan=16, res_layers=1,
             radius=0.3, teacher_forcing=True, loss="l1"),
    )
    g = m.build_graph(batch)
    params = m.init(jax.random.PRNGKey(0), batch, g)

    mesh = make_mesh(dp=2, graph=4)
    pg = m.build_graph_partitioned(batch, n_shards=4, halo="fused")
    assert "blk_rl" in pg
    bs = NamedSharding(mesh, P("dp"))
    batch_sh = {k: jax.device_put(v, bs) for k, v in batch.items()}
    eg = NamedSharding(mesh, P("dp", "graph"))
    from magnet_tpu.parallel.graph_partition import FUSED_PG_KEYS

    for k in FUSED_PG_KEYS:
        if k in pg:
            pg[k] = jax.device_put(pg[k], eg)
    for k in ("senders_flat", "receivers_flat"):
        pg[k] = jax.device_put(pg[k], bs)

    for train in (True, False):
        ref_loss, ref_metrics = m.loss(params, batch, g, train=train)
        loss_f, metrics_f = jax.jit(
            lambda p, b, tr=train: m.loss_partitioned(p, b, pg, mesh, train=tr)
        )(params, batch_sh)
        np.testing.assert_allclose(float(loss_f), float(ref_loss), rtol=2e-4)
        np.testing.assert_allclose(
            float(metrics_f["mae_loss"]), float(ref_metrics["mae_loss"]),
            rtol=2e-4,
        )

    gref = jax.grad(lambda p: m.loss(p, batch, g, train=True)[0])(params)
    gpar = jax.jit(
        jax.grad(lambda p: m.loss_partitioned(p, batch_sh, pg, mesh,
                                              train=True)[0])
    )(params)
    ref_n = float(sum(jnp.sum(v**2) for v in jax.tree.leaves(gref)) ** 0.5)
    par_n = float(sum(jnp.sum(v**2) for v in jax.tree.leaves(gpar)) ** 0.5)
    np.testing.assert_allclose(par_n, ref_n, rtol=5e-3)


def test_halo_processor_matches_allgather():
    """Halo-exchange (all_to_all, boundary rows only) == all-gather
    partitioned processor == single device."""
    from magnet_tpu.parallel.graph_partition import (
        interaction_step_halo,
        make_partitioned_processor_halo,
        partition_graph_halo,
    )

    s, t, n = _setup_graph(n=32, seed=3)
    B, G, DP = 2, 4, 2
    mesh = make_mesh(dp=DP, graph=G)
    rng = np.random.default_rng(5)

    hg = partition_graph_halo(s, t, n, G)
    n_pad = hg.n_node_pad
    e_shard = hg.senders.shape[1]
    x = rng.normal(size=(B, n_pad, LATENT)).astype(np.float32)
    e_feats = rng.normal(size=(B, G, e_shard, LATENT)).astype(np.float32)

    inet = InteractionNetwork(
        node_out=LATENT, edge_out=LATENT, mlp_layers=2, mlp_hidden=LATENT
    )
    from magnet_tpu.models.common import Graph as GraphNT

    g1 = pad_graph(s, t, n_pad, e_pad=len(s))
    gs1 = GraphNT(
        senders=jnp.asarray(g1.senders),
        receivers=jnp.asarray(g1.receivers),
        edge_mask=jnp.asarray(g1.edge_mask),
        recv_edge_ids=jnp.asarray(g1.recv_edge_ids),
    )
    step_params = [
        inet.init(jax.random.PRNGKey(i), jnp.asarray(x[0]),
                  jnp.zeros((len(s), LATENT)), gs1)
        for i in range(STEPS)
    ]

    # reference: all-gather runner
    def iapply_ag(params_i, x_full, ee, senders, recv_loc, mask, table):
        return interaction_step_local(
            inet, params_i, x_full, ee, senders, recv_loc, mask, table
        )

    runner_ag = make_partitioned_processor(iapply_ag, STEPS, mesh)
    ed = NamedSharding(mesh, P("dp", "graph"))
    xs = jax.device_put(jnp.asarray(x), ed)
    es = jax.device_put(jnp.asarray(e_feats), ed)
    bargs = lambda a: jax.device_put(
        jnp.broadcast_to(jnp.asarray(a)[None], (B,) + a.shape), ed
    )
    out_ag, _ = jax.jit(runner_ag)(
        step_params, xs, es,
        bargs(hg.senders), bargs(hg.receivers_loc), bargs(hg.edge_mask),
        bargs(hg.recv_edge_ids),
    )

    # halo runner
    def iapply_halo(params_i, x_local, x_ext, ee, remap, recv_loc, mask, table):
        return interaction_step_halo(
            inet, params_i, x_local, x_ext, ee, remap, recv_loc, mask, table
        )

    runner_halo = make_partitioned_processor_halo(iapply_halo, STEPS, mesh)
    hs = NamedSharding(mesh, P("graph"))
    out_halo, _ = jax.jit(runner_halo)(
        step_params, xs, es,
        bargs(hg.senders_remap), bargs(hg.receivers_loc), bargs(hg.edge_mask),
        bargs(hg.recv_edge_ids),
        jax.device_put(jnp.asarray(hg.halo_idx), hs),
    )
    np.testing.assert_allclose(
        np.asarray(out_halo), np.asarray(out_ag), rtol=2e-5, atol=2e-6
    )


def test_flagship_halo_matches_standard():
    """Flagship graph-parallel path with HALO exchange == standard path."""
    from magnet_tpu.models.factory import create_model

    rng = np.random.default_rng(7)
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
    m = create_model(
        "magnet_cnn",
        dict(time_slice=16, latent_dim=8, num_message_passing_steps=2,
             mlp_layers=2, mlp_hidden=16, n_chan=16, res_layers=1,
             radius=0.3, teacher_forcing=True, loss="l1"),
    )
    g = m.build_graph(batch)
    params = m.init(jax.random.PRNGKey(0), batch, g)
    ref_loss, _ = m.loss(params, batch, g, train=True)

    mesh = make_mesh(dp=2, graph=4)
    pg = m.build_graph_partitioned(batch, n_shards=4, halo=True)
    bs = NamedSharding(mesh, P("dp"))
    batch_sh = {k: jax.device_put(v, bs) for k, v in batch.items()}
    eg = NamedSharding(mesh, P("dp", "graph"))
    for k in ("senders", "recv_loc", "mask", "table", "senders_remap"):
        pg[k] = jax.device_put(pg[k], eg)
    pg["halo_idx"] = jax.device_put(
        pg["halo_idx"], NamedSharding(mesh, P("dp", "graph"))
    )

    loss_h, _ = jax.jit(
        lambda p, b: m.loss_partitioned(p, b, pg, mesh, train=True)
    )(params, batch_sh)
    np.testing.assert_allclose(float(loss_h), float(ref_loss), rtol=2e-4)


def test_flagship_2d_graph_parallel_matches_standard():
    """MAgNetCNN2D partitioned path == standard path on dp=2 x graph=4."""
    from magnet_tpu.models.factory import create_model

    rng = np.random.default_rng(9)
    B, nt, W, N, ts = 2, 12, 8, 12, 4
    batch = {
        "t": jnp.asarray(np.linspace(0, 1, nt, dtype=np.float32)[None].repeat(B, 0)),
        "lr_frames": jnp.asarray(
            rng.normal(size=(B, nt, 1, W, W)).astype(np.float32)
        ),
        "hr_points": jnp.asarray(rng.normal(size=(B, nt, N, 1)).astype(np.float32)),
        "coords": jnp.asarray(rng.uniform(-1, 1, (B, N, 2)).astype(np.float32)),
        "cells": jnp.asarray(np.full((B, N, 2), 2.0 / (2 * W), np.float32)),
    }
    m = create_model(
        "magnet_cnn_2d",
        dict(time_slice=ts, latent_dim=8, num_message_passing_steps=2,
             mlp_layers=2, mlp_hidden=16, n_chan=8, res_layers=1,
             radius=0.6, teacher_forcing=True, loss="l1"),
    )
    g = m.build_graph(batch)
    params = m.init(jax.random.PRNGKey(0), batch, g)
    ref_loss, _ = m.loss(params, batch, g, train=True)

    mesh = make_mesh(dp=2, graph=4)
    pg = m.build_graph_partitioned(batch, n_shards=4)
    bs = NamedSharding(mesh, P("dp"))
    batch_sh = {k: jax.device_put(v, bs) for k, v in batch.items()}
    eg = NamedSharding(mesh, P("dp", "graph"))
    for k in ("senders", "recv_loc", "mask", "table"):
        pg[k] = jax.device_put(pg[k], eg)

    loss_p, _ = jax.jit(
        lambda p, b: m.loss_partitioned(p, b, pg, mesh, train=True)
    )(params, batch_sh)
    np.testing.assert_allclose(float(loss_p), float(ref_loss), rtol=2e-4)


def test_flagship_halo_overlap_matches_standard():
    """Flagship graph-parallel path with the OVERLAP halo variant
    (interior/boundary edge split, all_to_all overlapped with interior
    compute) == standard path, loss and grads."""
    from magnet_tpu.models.factory import create_model

    rng = np.random.default_rng(11)
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
    m = create_model(
        "magnet_cnn",
        dict(time_slice=16, latent_dim=8, num_message_passing_steps=2,
             mlp_layers=2, mlp_hidden=16, n_chan=16, res_layers=1,
             radius=0.3, teacher_forcing=True, loss="l1"),
    )
    g = m.build_graph(batch)
    params = m.init(jax.random.PRNGKey(0), batch, g)
    ref_loss, _ = m.loss(params, batch, g, train=True)

    mesh = make_mesh(dp=2, graph=4)
    pg = m.build_graph_partitioned(batch, n_shards=4, halo="overlap")
    bs = NamedSharding(mesh, P("dp"))
    batch_sh = {k: jax.device_put(v, bs) for k, v in batch.items()}
    eg = NamedSharding(mesh, P("dp", "graph"))
    for k in ("remap_int", "recv_int", "mask_int", "t_int",
              "remap_bnd", "recv_bnd", "mask_bnd", "t_bnd",
              "degree", "halo_idx"):
        pg[k] = jax.device_put(pg[k], eg)
    for k in ("senders_flat_int", "receivers_flat_int",
              "senders_flat_bnd", "receivers_flat_bnd"):
        pg[k] = jax.device_put(pg[k], bs)

    loss_o, _ = jax.jit(
        lambda p, b: m.loss_partitioned(p, b, pg, mesh, train=True)
    )(params, batch_sh)
    np.testing.assert_allclose(float(loss_o), float(ref_loss), rtol=2e-4)

    gref = jax.grad(lambda p: m.loss(p, batch, g, train=True)[0])(params)
    gpar = jax.jit(
        jax.grad(lambda p: m.loss_partitioned(p, batch_sh, pg, mesh,
                                              train=True)[0])
    )(params)
    ref_n = float(sum(jnp.sum(x**2) for x in jax.tree.leaves(gref)) ** 0.5)
    par_n = float(sum(jnp.sum(x**2) for x in jax.tree.leaves(gpar)) ** 0.5)
    np.testing.assert_allclose(par_n, ref_n, rtol=5e-3)


def test_partitioned_scan_matches_unroll():
    """loss_partitioned scans the rollout (round 3); the retired per-window
    Python unroll is kept behind unroll=True as the oracle.  Exercise the
    no-TF train feedback (carry actually flows between windows) over 2
    windows for the flagship, plus magnet_gnn WITH noise (the scan threads
    the same PRNG key sequence, so noise must be bit-comparable)."""
    from magnet_tpu.models.factory import create_model

    rng = np.random.default_rng(23)
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
    m = create_model(
        "magnet_cnn",
        dict(time_slice=16, latent_dim=8, num_message_passing_steps=2,
             mlp_layers=2, mlp_hidden=16, n_chan=16, res_layers=1,
             radius=0.3, teacher_forcing=False, loss="l1"),
    )
    g = m.build_graph(batch)
    params = m.init(jax.random.PRNGKey(0), batch, g)
    mesh = make_mesh(dp=2, graph=4)
    pg = m.build_graph_partitioned(batch, n_shards=4)
    bs = NamedSharding(mesh, P("dp"))
    batch_sh = {k: jax.device_put(v, bs) for k, v in batch.items()}
    eg = NamedSharding(mesh, P("dp", "graph"))
    for k in ("senders", "recv_loc", "mask", "table"):
        pg[k] = jax.device_put(pg[k], eg)
    for train in (True, False):
        l_scan, _ = jax.jit(
            lambda p, b, tr=train: m.loss_partitioned(p, b, pg, mesh, train=tr)
        )(params, batch_sh)
        l_unr, _ = jax.jit(
            lambda p, b, tr=train: m.loss_partitioned(
                p, b, pg, mesh, train=tr, unroll=True
            )
        )(params, batch_sh)
        np.testing.assert_allclose(float(l_scan), float(l_unr), rtol=1e-5)


def test_partitioned_scan_matches_unroll_gnn_noise():
    from magnet_tpu.models.factory import create_model

    rng = np.random.default_rng(29)
    B, nt, L, N = 2, 24, 16, 12
    batch = {
        "t": jnp.asarray(np.linspace(0, 1, nt, dtype=np.float32)[None].repeat(B, 0)),
        "lr_frames": jnp.asarray(rng.normal(size=(B, nt, 1, L)).astype(np.float32)),
        "hr_points": jnp.asarray(rng.normal(size=(B, nt, N, 1)).astype(np.float32)),
        "coords_lr": jnp.asarray(
            np.sort(rng.uniform(-1, 1, (B, L, 1)).astype(np.float32), axis=1)
        ),
        "coords_hr": jnp.asarray(
            np.sort(rng.uniform(-1, 1, (B, N, 1)).astype(np.float32), axis=1)
        ),
    }
    m = create_model(
        "magnet_gnn",
        dict(time_slice=8, latent_dim=8, num_message_passing_steps=2,
             mlp_layers=2, mlp_hidden=16, radius=0.4, codec_neighbors=2,
             noise=0.01, interpolation="area", teacher_forcing=False,
             loss="l1"),
    )
    g = m.build_graph(batch)
    params = m.init(jax.random.PRNGKey(0), batch, g)
    mesh = make_mesh(dp=2, graph=4)
    pg = _place_gnn_pg(m.build_graph_partitioned(batch, n_shards=4), mesh)
    bs = NamedSharding(mesh, P("dp"))
    batch_sh = {k: jax.device_put(v, bs) for k, v in batch.items()}
    key = jax.random.PRNGKey(7)
    l_scan, _ = jax.jit(
        lambda p, b: m.loss_partitioned(p, b, pg, mesh, rng=key, train=True)
    )(params, batch_sh)
    l_unr, _ = jax.jit(
        lambda p, b: m.loss_partitioned(
            p, b, pg, mesh, rng=key, train=True, unroll=True
        )
    )(params, batch_sh)
    np.testing.assert_allclose(float(l_scan), float(l_unr), rtol=1e-5)


def test_mpnn2d_partitioned_scan_matches_unroll():
    """mpnn_2d's window-dependent time variable (mpnn_2d.py:265,281) is
    precomputed into the scan inputs — parity with the unrolled oracle."""
    from magnet_tpu.models.factory import create_model

    rng = np.random.default_rng(31)
    W, tw = 5, 10
    B, N, nt = 2, W * W, 3 * tw
    xs = np.linspace(0, 1, W, dtype=np.float32)
    gx, gy = np.meshgrid(xs, xs, indexing="xy")
    coords = np.stack([gx.ravel(), gy.ravel()], -1)
    batch = {
        "u": jnp.asarray(rng.normal(size=(B, N, nt)).astype(np.float32)),
        "x": jnp.asarray(np.broadcast_to(coords[None], (B, N, 2)).copy()),
        "t": jnp.asarray(np.linspace(0.1, 2, nt, dtype=np.float32)[None].repeat(B, 0)),
    }
    m = create_model(
        "mpnn_2d",
        # hidden_features=128 is required by the temporal-bundling decoder's
        # hand-picked conv table for tw=10 ((128-16)//6+1-10+1 == 10,
        # nn/gnn_layer.py:163-169 — reference mpnn.py:140-163 semantics)
        dict(hidden_features=128, hidden_layer=2, time_window=tw, neighbors=1,
             teacher_forcing=False, loss="l1"),
    )
    g = m.build_graph(batch)
    params = m.init(jax.random.PRNGKey(0), batch, g)
    mesh = make_mesh(dp=2, graph=4)
    pg = m.build_graph_partitioned(batch, n_shards=4)
    bs = NamedSharding(mesh, P("dp"))
    batch_sh = {k: jax.device_put(v, bs) for k, v in batch.items()}
    eg = NamedSharding(mesh, P("dp", "graph"))
    for k in ("senders", "recv_loc", "mask", "table"):
        pg[k] = jax.device_put(pg[k], eg)
    for train in (True, False):
        l_scan, _ = jax.jit(
            lambda p, b, tr=train: m.loss_partitioned(p, b, pg, mesh, train=tr)
        )(params, batch_sh)
        l_unr, _ = jax.jit(
            lambda p, b, tr=train: m.loss_partitioned(
                p, b, pg, mesh, train=tr, unroll=True
            )
        )(params, batch_sh)
        np.testing.assert_allclose(float(l_scan), float(l_unr), rtol=1e-5)


def test_halo_ring_matches_all_to_all(monkeypatch):
    """The ppermute-ring halo exchange (MAGNET_TPU_HALO_RING=1,
    graph_partition._halo_exchange_ring) must equal the monolithic
    all_to_all overlap path bit-for-bit — it moves the same blocks, as G-1
    independent offset-k rotations XLA can interleave with interior
    compute if the all_to_all serializes (docs/halo_overlap_hlo.md)."""
    from magnet_tpu.models.factory import create_model

    rng = np.random.default_rng(41)
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
    m = create_model(
        "magnet_cnn",
        dict(time_slice=16, latent_dim=8, num_message_passing_steps=2,
             mlp_layers=2, mlp_hidden=16, n_chan=16, res_layers=1,
             radius=0.3, teacher_forcing=True, loss="l1"),
    )
    g = m.build_graph(batch)
    params = m.init(jax.random.PRNGKey(0), batch, g)
    mesh = make_mesh(dp=2, graph=4)
    pg = m.build_graph_partitioned(batch, n_shards=4, halo="overlap")
    bs = NamedSharding(mesh, P("dp"))
    batch_sh = {k: jax.device_put(v, bs) for k, v in batch.items()}
    eg = NamedSharding(mesh, P("dp", "graph"))
    for k in ("remap_int", "recv_int", "mask_int", "t_int",
              "remap_bnd", "recv_bnd", "mask_bnd", "t_bnd",
              "degree", "halo_idx"):
        pg[k] = jax.device_put(pg[k], eg)
    for k in ("senders_flat_int", "receivers_flat_int",
              "senders_flat_bnd", "receivers_flat_bnd"):
        pg[k] = jax.device_put(pg[k], bs)

    loss_a2a, _ = jax.jit(
        lambda p, b: m.loss_partitioned(p, b, pg, mesh, train=True)
    )(params, batch_sh)
    monkeypatch.setenv("MAGNET_TPU_HALO_RING", "1")
    loss_ring, _ = jax.jit(
        lambda p, b: m.loss_partitioned(p, b, pg, mesh, train=True)
    )(params, batch_sh)
    np.testing.assert_allclose(float(loss_ring), float(loss_a2a), rtol=1e-6)
