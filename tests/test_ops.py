"""Op-level parity tests: aggregation vs dense reference, interpolation and
grid sampling vs torch (CPU), graph builders vs brute force."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from magnet_tpu.ops.graph import knn_np, pad_graph, radius_graph_np
from magnet_tpu.ops.segment import (
    aggregate_max,
    aggregate_mean,
    aggregate_sum,
    segment_instance_norm,
)
from magnet_tpu.ops.interp import (
    grid_sample_nearest_1d,
    grid_sample_nearest_2d,
    interpolate_bilinear_2d,
    interpolate_linear_1d,
)


def test_radius_graph_matches_bruteforce():
    rng = np.random.default_rng(0)
    pos = rng.uniform(-1, 1, size=(40, 2))
    r = 0.5
    s, t = radius_graph_np(pos, r, loop=False, max_num_neighbors=1000)
    edges = set(zip(s.tolist(), t.tolist()))
    for i in range(40):
        for j in range(40):
            if i == j:
                continue
            d = np.linalg.norm(pos[i] - pos[j])
            assert ((j, i) in edges) == (d <= r)


def test_radius_graph_neighbor_cap():
    pos = np.zeros((40, 1))  # all identical -> everyone within r
    s, t = radius_graph_np(pos, 0.1, loop=True, max_num_neighbors=8)
    deg = np.bincount(t, minlength=40)
    assert (deg == 8).all()


def test_knn_sorted_by_distance():
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (30, 2))
    y = rng.uniform(-1, 1, (7, 2))
    nbr = knn_np(x, y, 4)
    for qi in range(7):
        d = np.linalg.norm(x[nbr[qi]] - y[qi], axis=-1)
        assert (np.diff(d) >= -1e-12).all()
        full = np.sort(np.linalg.norm(x - y[qi], axis=-1))
        np.testing.assert_allclose(np.sort(d), full[:4], rtol=1e-12)


def _dense_aggregate(msgs, s, t, n, reduce):
    out = np.zeros((n, msgs.shape[-1]), np.float64)
    cnt = np.zeros(n)
    if reduce == "max":
        out[:] = -np.inf
    for e in range(len(s)):
        if reduce == "max":
            out[t[e]] = np.maximum(out[t[e]], msgs[e])
        else:
            out[t[e]] += msgs[e]
        cnt[t[e]] += 1
    if reduce == "mean":
        out = out / np.maximum(cnt, 1)[:, None]
    if reduce == "max":
        out[cnt == 0] = 0.0
    return out


@pytest.mark.parametrize("reduce", ["mean", "sum", "max"])
def test_aggregate_vs_dense(reduce):
    rng = np.random.default_rng(2)
    pos = rng.uniform(-1, 1, (25, 1))
    s, t = radius_graph_np(pos, 0.3, loop=True)
    g = pad_graph(s, t, 25, e_pad=len(s) + 13)
    msgs = rng.normal(size=(g.e_pad, 5)).astype(np.float32)
    fn = {"mean": aggregate_mean, "sum": aggregate_sum, "max": aggregate_max}[reduce]
    out = fn(jnp.asarray(msgs), jnp.asarray(g.recv_edge_ids), jnp.asarray(g.edge_mask))
    ref = _dense_aggregate(msgs[: len(s)], s, t, 25, reduce)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_instance_norm_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    x = rng.normal(size=(17, 6)).astype(np.float32)
    ours = segment_instance_norm(jnp.asarray(x))
    # torch instance_norm over a single graph == InstanceNorm1d on (1, C, N)
    xt = torch.from_numpy(x).T.unsqueeze(0)
    ref = torch.nn.functional.instance_norm(xt, eps=1e-5)[0].T.numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_interpolate_linear_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 3, 50)).astype(np.float32)
    for size in [25, 100, 37]:
        ours = interpolate_linear_1d(jnp.asarray(x), size)
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=size, mode="linear", align_corners=False
        ).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-6)


def test_interpolate_bilinear_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    for size in [(8, 8), (32, 32), (11, 13)]:
        ours = interpolate_bilinear_2d(jnp.asarray(x), size)
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=size, mode="bilinear", align_corners=False
        ).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-6)


def test_grid_sample_nearest_1d_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(6)
    feat = rng.normal(size=(4, 25)).astype(np.float32)
    # the coordinates the INR decoder actually uses: grid centers ± dx + 1e-6
    base = np.linspace(-1, 1, 31).astype(np.float32)
    gx = np.clip(base + (1.0 / 25) + 1e-6, -1 + 1e-6, 1 - 1e-6).astype(np.float32)
    ours = grid_sample_nearest_1d(jnp.asarray(feat), jnp.asarray(gx))
    grid = torch.zeros(1, 1, 31, 2)
    grid[0, 0, :, 0] = torch.from_numpy(gx)  # x (width) coordinate
    ref = torch.nn.functional.grid_sample(
        torch.from_numpy(feat).unsqueeze(0).unsqueeze(2),  # (1, C, 1, L)
        grid,
        mode="nearest",
        padding_mode="border",
        align_corners=False,
    )[0, :, 0].T.numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-6)


def test_grid_sample_nearest_2d_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(7)
    feat = rng.normal(size=(3, 12, 12)).astype(np.float32)
    n = 40
    coords = rng.uniform(-1.1, 1.1, (n, 2)).astype(np.float32)
    g0 = np.clip(coords[:, 0] + 1.0 / 12 + 1e-6, -1 + 1e-6, 1 - 1e-6)
    g1 = np.clip(coords[:, 1] - 1.0 / 12 + 1e-6, -1 + 1e-6, 1 - 1e-6)
    ours = grid_sample_nearest_2d(
        jnp.asarray(feat), jnp.asarray(g0), jnp.asarray(g1)
    )
    # torch convention: grid[..., 0]=x (W), grid[..., 1]=y (H); reference
    # flips its (dim0, dim1) coords, so dim0 -> y, dim1 -> x.
    grid = torch.zeros(1, 1, n, 2)
    grid[0, 0, :, 0] = torch.from_numpy(g1)
    grid[0, 0, :, 1] = torch.from_numpy(g0)
    ref = torch.nn.functional.grid_sample(
        torch.from_numpy(feat).unsqueeze(0),
        grid,
        mode="nearest",
        padding_mode="border",
        align_corners=False,
    )[0, :, 0].T.numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-6)


def test_blocked_aggregation_matches_table():
    """Blocked (one-hot matmul) aggregation == table aggregation == dense."""
    from magnet_tpu.ops.graph import block_graph
    from magnet_tpu.models.common import Graph
    from magnet_tpu.ops.segment import aggregate_mean_graph

    rng = np.random.default_rng(11)
    n = 200
    pos = rng.uniform(-1, 1, (n, 2))
    s, t = radius_graph_np(pos, 0.3, loop=True)
    bg = block_graph(s, t, n)
    msgs_raw = rng.normal(size=(len(s), 7)).astype(np.float32)

    # blocked-order messages: block_graph sorts edges by
    # (receiver tile, sender id) — sender-ascending within each tile
    order = np.lexsort((s, t // 128))
    e_flat = bg.senders.size
    msgs_blk = np.zeros((e_flat, 7), np.float32)
    # reconstruct packing: edges fill each tile bucket in sorted order
    tile_of = t[order] // 128
    offs = np.zeros(bg.senders.shape[0], np.int64)
    et = bg.senders.shape[1]
    for k, eid in enumerate(order):
        tt = tile_of[k]
        msgs_blk[tt * et + offs[tt]] = msgs_raw[eid]
        offs[tt] += 1

    gs = Graph(
        senders=jnp.asarray(bg.senders.reshape(-1)),
        receivers=jnp.asarray(bg.receivers),
        edge_mask=jnp.asarray(bg.mask.reshape(-1)),
        blk_recv_local=jnp.asarray(bg.recv_local),
        degree=jnp.asarray(bg.degree),
    )
    out = aggregate_mean_graph(jnp.asarray(msgs_blk), gs)
    ref = _dense_aggregate(msgs_raw, s, t, n, "mean")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)

    # gradient path (custom_vjp backward)
    def f(m):
        return jnp.sum(aggregate_mean_graph(m, gs) ** 2)

    g = jax.grad(f)(jnp.asarray(msgs_blk))
    assert np.isfinite(np.asarray(g)).all()
    # padded slots must get zero grad
    assert float(jnp.abs(g * (1 - gs.edge_mask[:, None])).max()) == 0.0


def test_pallas_kernel_interpret_matches_einsum(monkeypatch):
    """Run the actual Pallas kernel (interpret mode on CPU) against the
    einsum fallback."""
    import importlib

    from magnet_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(12)
    T, E, C = 2, 256, 8
    msgs = jnp.asarray(rng.normal(size=(T, E, C)).astype(np.float32))
    recv = jnp.asarray(rng.integers(0, 128, size=(T, E)).astype(np.int32))
    mask = jnp.asarray((rng.uniform(size=(T, E)) > 0.2).astype(np.float32))

    ref = pk._einsum_impl(msgs, recv, mask, 128)
    monkeypatch.setenv("MAGNET_TPU_PALLAS_INTERPRET", "1")
    out = pk._pallas_impl(msgs, recv, mask, 128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_pallas_kernel_chunked_large_tile(monkeypatch):
    """E-chunked accumulation path (E_TILE > MAX_E_CHUNK) in interpret
    mode."""
    from magnet_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(13)
    T, E, C = 2, 4096, 8           # E > MAX_E_CHUNK -> 2 chunks
    msgs = jnp.asarray(rng.normal(size=(T, E, C)).astype(np.float32))
    recv = jnp.asarray(rng.integers(0, 128, size=(T, E)).astype(np.int32))
    mask = jnp.asarray((rng.uniform(size=(T, E)) > 0.2).astype(np.float32))
    ref = pk._einsum_impl(msgs, recv, mask, 128)
    monkeypatch.setenv("MAGNET_TPU_PALLAS_INTERPRET", "1")
    out = pk._pallas_impl(msgs, recv, mask, 128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_block_graph_native_matches_numpy():
    """C++ mt_block_graph produces byte-identical layouts to the numpy
    packing (all fields, incl. sender-transpose blocks and the skew guard)."""
    import magnet_tpu.ops.graph as G

    if G._native is None:
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(7)

    def both(s, r, n, **kw):
        bg_nat = G.block_graph(s, r, n, **kw)
        nat = G._native
        G._native = None
        try:
            bg_np = G.block_graph(s, r, n, **kw)
        finally:
            G._native = nat
        for f in ("senders", "recv_local", "mask", "receivers", "degree"):
            np.testing.assert_array_equal(getattr(bg_nat, f), getattr(bg_np, f))
        assert bg_nat.n_node_pad == bg_np.n_node_pad
        assert (bg_nat.snd_edge_ids is None) == (bg_np.snd_edge_ids is None)
        if bg_nat.snd_edge_ids is not None:
            np.testing.assert_array_equal(bg_nat.snd_edge_ids, bg_np.snd_edge_ids)
            np.testing.assert_array_equal(bg_nat.snd_local, bg_np.snd_local)
        return bg_nat

    n, e = 700, 5000
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    both(s, r, n)
    both(s, r, n, build_snd=False)
    # extreme out-degree skew -> sender layout skipped by the guard
    bg = both(np.zeros(e, np.int32), r, n)
    assert bg.snd_edge_ids is None
    # duplicate edges + every receiver in one tile (stable-order stress)
    both(np.array([3, 1, 3, 1, 0], np.int32), np.array([2, 2, 2, 0, 2], np.int32), 130)


def _fused_rand_args(rng, T, E, H, C, L1, tile_n=128):
    return dict(
        h0=jnp.asarray(rng.normal(size=(T, E, H)).astype(np.float32)),
        pxi=jnp.asarray(rng.normal(size=(T, tile_n, H)).astype(np.float32)),
        wr=jnp.asarray(rng.normal(size=(L1, H, H)).astype(np.float32) * 0.2),
        br=jnp.asarray(rng.normal(size=(L1, H)).astype(np.float32) * 0.2),
        wo=jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.2),
        bo=jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.2),
        ls=jnp.asarray(rng.normal(size=(C,)).astype(np.float32)),
        lb=jnp.asarray(rng.normal(size=(C,)).astype(np.float32)),
        recv=jnp.asarray(rng.integers(0, tile_n, size=(T, E)).astype(np.int32)),
        mask=jnp.asarray((rng.uniform(size=(T, E)) > 0.2).astype(np.float32)),
    )


@pytest.mark.parametrize("E,L1", [(256, 2), (2048, 1), (256, 0)])
def test_fused_edge_tail_interpret_matches_ref(monkeypatch, E, L1):
    """Fused [gather+MLP tail+LN+agg] Pallas kernel (interpret mode) vs the
    jnp reference, incl. the E-chunked path (E=2048 -> 2 chunks) and the
    no-rest-layers edge case."""
    from magnet_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(21)
    a = _fused_rand_args(rng, T=3, E=E, H=64, C=32, L1=L1)
    if E == 2048:
        # multi-chunk layout with a fully-dead chunk (tile 1, chunk 2):
        # the kernel's occupancy skip must still zero-contribute it
        monkeypatch.setattr(pk, "_FUSED_CHUNK_ENV", "512")
        mask = np.asarray(a["mask"]).copy()
        mask[1, 2 * 512:3 * 512] = 0.0
        a["mask"] = jnp.asarray(mask)
    ref = pk._fused_ref_impl(a["h0"], a["pxi"], a["wr"], a["br"], a["wo"],
                             a["bo"], a["ls"], a["lb"], a["recv"], a["mask"])
    monkeypatch.setenv("MAGNET_TPU_PALLAS_INTERPRET", "1")
    out = pk._fused_fwd_pallas(a["h0"], a["pxi"], a["wr"], a["br"], a["wo"],
                               a["bo"], a["ls"], a["lb"], a["recv"], a["mask"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_fused_edge_tail_grads_interpret(monkeypatch):
    """Pallas backward kernel (interpret mode) vs autodiff of the jnp
    reference, all eight differentiable inputs."""
    from magnet_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(22)
    a = _fused_rand_args(rng, T=2, E=256, H=64, C=64, L1=2)
    # 2 chunks of 128; kill tile 1 chunk 1 to exercise the dead-chunk
    # skip in the backward (dh0 must come back zero there)
    monkeypatch.setattr(pk, "_FUSED_CHUNK_ENV", "128")
    mask = np.asarray(a["mask"]).copy()
    mask[1, 128:] = 0.0
    a["mask"] = jnp.asarray(mask)
    order = ("h0", "pxi", "wr", "br", "wo", "bo", "ls", "lb")
    g = jnp.asarray(rng.normal(size=(2, 128, 64)).astype(np.float32))

    def ref_loss(*p):
        return jnp.sum(pk._fused_ref_impl(*p, a["recv"], a["mask"]) * g)

    want = jax.grad(ref_loss, argnums=tuple(range(8)))(
        *[a[k] for k in order])
    monkeypatch.setenv("MAGNET_TPU_PALLAS_INTERPRET", "1")
    got = pk._fused_bwd_pallas(*[a[k] for k in order], a["recv"], a["mask"],
                               g)
    for name, w, h in zip(order, want, got):
        np.testing.assert_allclose(np.asarray(h), np.asarray(w), rtol=1e-3,
                                   atol=1e-4, err_msg=name)


def test_fused_mpnn_edge_agg_interpret(monkeypatch):
    """Fused MPNN message kernel (swish/Linear/swish/agg) fwd + bwd
    (interpret mode) vs the jnp reference."""
    from magnet_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(23)
    T, E, H = 2, 384, 64
    h0 = jnp.asarray(rng.normal(size=(T, E, H)).astype(np.float32))
    pr = jnp.asarray(rng.normal(size=(T, 128, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(H, H)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.2)
    recv = jnp.asarray(rng.integers(0, 128, size=(T, E)).astype(np.int32))
    # 3 chunks of 128 with tile 0 chunk 2 fully dead (occupancy skip)
    monkeypatch.setattr(pk, "_FUSED_CHUNK_ENV", "128")
    mask_np = (rng.uniform(size=(T, E)) > 0.2).astype(np.float32)
    mask_np[0, 256:] = 0.0
    mask = jnp.asarray(mask_np)

    ref = pk._mpnn_ref_impl(h0, pr, w, b, recv, mask)
    monkeypatch.setenv("MAGNET_TPU_PALLAS_INTERPRET", "1")
    out = pk._mpnn_fwd_pallas(h0, pr, w, b, recv, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)

    g = jnp.asarray(rng.normal(size=ref.shape).astype(np.float32))

    def ref_loss(h0_, pr_, w_, b_):
        return jnp.sum(pk._mpnn_ref_impl(h0_, pr_, w_, b_, recv, mask) * g)

    want = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(h0, pr, w, b)
    got = pk._mpnn_bwd_pallas(h0, pr, w, b, recv, mask, g)
    for name, wv, hv in zip(("h0", "pr", "w", "b"), want, got):
        np.testing.assert_allclose(np.asarray(hv), np.asarray(wv), rtol=1e-3,
                                   atol=1e-4, err_msg=name)


def test_fused_edge_tail_bf16_interpret(monkeypatch):
    """bf16-native fused kernel (interpret mode): fwd close to the f32
    reference within bf16 tolerance; bwd returns grads in the primal
    dtypes with values close to the f32 autodiff reference."""
    from magnet_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(31)
    a = _fused_rand_args(rng, T=2, E=256, H=64, C=32, L1=1)
    ref32 = pk._fused_ref_impl(a["h0"], a["pxi"], a["wr"], a["br"], a["wo"],
                               a["bo"], a["ls"], a["lb"], a["recv"],
                               a["mask"])
    bf = {k: (v.astype(jnp.bfloat16)
              if k in ("h0", "pxi", "wr", "br", "wo", "bo") else v)
          for k, v in a.items()}
    monkeypatch.setenv("MAGNET_TPU_PALLAS_INTERPRET", "1")
    out = pk._fused_fwd_pallas(bf["h0"], bf["pxi"], bf["wr"], bf["br"],
                               bf["wo"], bf["bo"], bf["ls"], bf["lb"],
                               bf["recv"], bf["mask"])
    assert out.dtype == jnp.float32
    # bf16 operands, f32 accumulation: ~2-3 decimal digits
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref32),
                               rtol=5e-2, atol=5e-2)

    g = jnp.asarray(rng.normal(size=np.asarray(ref32).shape)
                    .astype(np.float32))
    order = ("h0", "pxi", "wr", "br", "wo", "bo", "ls", "lb")

    def ref_loss(*p):
        return jnp.sum(pk._fused_ref_impl(*p, a["recv"], a["mask"]) * g)

    want = jax.grad(ref_loss, argnums=tuple(range(8)))(
        *[a[k] for k in order])
    got = pk._fused_bwd_pallas(*[bf[k] for k in order], a["recv"],
                               a["mask"], g)
    for name, wv, hv in zip(order, want, got):
        # relu-boundary sign flips make a handful of elements diverge in
        # bf16 — compare in relative L2, not element-wise
        wv = np.asarray(wv, np.float32)
        hv = np.asarray(hv, np.float32)
        rel = np.linalg.norm(hv - wv) / max(np.linalg.norm(wv), 1e-6)
        assert rel < 0.08, f"{name}: rel L2 {rel}"


def test_interaction_network_bf16_fused_runs(monkeypatch):
    """InteractionNetwork with dtype=bf16 engages the fused path and its
    loss/grads stay close to the unfused bf16 fallback."""
    import jax

    from magnet_tpu.models.common import build_radius_graph_batch
    from magnet_tpu.nn.graphnet import InteractionNetwork

    rng = np.random.default_rng(5)
    n, latent = 64, 32
    coords = rng.uniform(-1, 1, (1, n, 2)).astype(np.float32)
    g = build_radius_graph_batch(coords, 0.5, loop=True)
    gs = jax.tree.map(lambda x: x[0] if x is not None else None, g)
    x = jnp.asarray(rng.normal(size=(n, latent)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(gs.senders.shape[0], latent))
                    .astype(np.float32))
    net = InteractionNetwork(node_out=latent, edge_out=latent, mlp_layers=2,
                             mlp_hidden=latent, dtype=jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0), x, e, gs)

    def loss(p, mode):
        # mode: "fused2" | "fused1" | "unfused"
        if mode == "unfused":
            monkeypatch.setenv("MAGNET_TPU_NO_FUSED", "1")
        else:
            monkeypatch.delenv("MAGNET_TPU_NO_FUSED", raising=False)
        if mode == "fused1":
            monkeypatch.setenv("MAGNET_TPU_NO_FUSED2", "1")
        else:
            monkeypatch.delenv("MAGNET_TPU_NO_FUSED2", raising=False)
        xo, eo = net.apply(p, x, e, gs)
        return jnp.mean(xo.astype(jnp.float32) ** 2)

    monkeypatch.setenv("MAGNET_TPU_PALLAS_INTERPRET", "1")
    lf, gf = jax.value_and_grad(lambda p: loss(p, "fused1"))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss(p, "fused2"))(params)
    lu, gu = jax.value_and_grad(lambda p: loss(p, "unfused"))(params)
    np.testing.assert_allclose(float(lf), float(lu), rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(float(l2), float(lu), rtol=3e-2, atol=3e-2)

    def close(tol):
        def f(va, vb):
            va = np.asarray(va, np.float32)
            vb = np.asarray(vb, np.float32)
            rel = np.linalg.norm(va - vb) / max(np.linalg.norm(vb), 1e-6)
            assert rel < tol, f"grad rel L2 {rel}"

        return f

    jax.tree.map(close(0.1), gf, gu)
    # fused2 accumulates the first-layer sum in f32 (v1/unfused sum in
    # bf16), so relu-boundary flips shift grads a bit more at this size
    jax.tree.map(close(0.15), g2, gu)


def _fused2_args(rng, T=3, nc=2, chunk=256, H=64, C=64, L1=1, n=300, K=3):
    """Random args for fused_edge_tail_agg2 with the sender-TILE layout:
    per chunk up to K distinct sender tiles (pad -1), per-edge
    slot*128+offset index."""
    E = nc * chunk
    n_tiles = (n + 127) // 128
    n_pad = n_tiles * 128
    tids = np.full((T, nc, K), -1, np.int32)
    sl = np.full((T, E), -1, np.int32)
    mask = np.zeros((T, E), np.float32)
    for t in range(T):
        for c in range(nc):
            ku = rng.integers(1, K + 1)
            u = np.sort(rng.choice(n_tiles, size=ku, replace=False))
            tids[t, c, :ku] = u
            for j in range(c * chunk, (c + 1) * chunk):
                if rng.uniform() < 0.15:
                    continue  # padded slot
                slot = rng.integers(0, ku)
                off = rng.integers(0, 128)
                if u[slot] * 128 + off >= n:
                    continue
                sl[t, j] = slot * 128 + off
                mask[t, j] = 1.0
    return dict(
        pe=jnp.asarray(rng.normal(size=(T, E, H)).astype(np.float32) * 0.3),
        pxj=jnp.asarray(rng.normal(size=(n_pad, H)).astype(np.float32) * 0.3),
        pxi=jnp.asarray(rng.normal(size=(T, 128, H)).astype(np.float32) * 0.3),
        wr=jnp.asarray(rng.normal(size=(L1, H, H)).astype(np.float32) * 0.2),
        br=jnp.asarray(rng.normal(size=(L1, H)).astype(np.float32) * 0.2),
        wo=jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.2),
        bo=jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.2),
        ls=jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.5 + 1),
        lb=jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.2),
        tids=jnp.asarray(tids),
        sl=jnp.asarray(sl),
        recv=jnp.asarray(rng.integers(0, 128, size=(T, E)).astype(np.int32)),
        mask=jnp.asarray(mask),
    )


def test_fused2_interpret_matches_ref(monkeypatch):
    """fused_edge_tail_agg2 (in-kernel sender gather, interpret mode) vs
    the jnp reference."""
    from magnet_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(31)
    a = _fused2_args(rng)
    # force a fully-dead chunk (tile 1, last chunk): the kernel must skip
    # it and still produce the right aggregation
    tids = np.asarray(a["tids"]).copy()
    sl = np.asarray(a["sl"]).copy()
    mask = np.asarray(a["mask"]).copy()
    chunk = sl.shape[1] // tids.shape[1]
    tids[1, -1, :] = -1
    sl[1, -chunk:] = -1
    mask[1, -chunk:] = 0.0
    a["tids"], a["sl"], a["mask"] = map(jnp.asarray, (tids, sl, mask))
    args = (a["pe"], a["pxj"], a["pxi"], a["wr"], a["br"], a["wo"], a["bo"],
            a["ls"], a["lb"], a["tids"], a["sl"], a["recv"], a["mask"])
    ref = pk._fused2_ref_impl(*args)
    monkeypatch.setenv("MAGNET_TPU_PALLAS_INTERPRET", "1")
    out = pk._fused2_fwd_pallas(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_fused2_grads_interpret(monkeypatch):
    """fused2 Pallas backward (interpret) vs autodiff of the reference for
    the differentiable tensor inputs (d_pxj is reduced outside the kernel
    through the transpose layout in production)."""
    from magnet_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(32)
    a = _fused2_args(rng, T=2, nc=2, chunk=128, H=64, C=64, L1=2, K=2)
    order = ("pe", "pxj", "pxi", "wr", "br", "wo", "bo", "ls", "lb")
    g = jnp.asarray(rng.normal(size=(2, 128, 64)).astype(np.float32))

    def ref_loss(*p):
        return jnp.sum(pk._fused2_ref_impl(
            *p, a["tids"], a["sl"], a["recv"], a["mask"]) * g)

    want = jax.grad(ref_loss, argnums=tuple(range(9)))(
        *[a[k] for k in order])
    monkeypatch.setenv("MAGNET_TPU_PALLAS_INTERPRET", "1")
    got = pk._fused2_bwd_pallas(
        *[a[k] for k in order], a["tids"], a["sl"], a["recv"], a["mask"], g)
    names = ("pe", "pxi", "wr", "br", "wo", "bo", "ls", "lb")
    want_sel = (want[0], want[2], want[3], want[4], want[5], want[6],
                want[7], want[8])
    for name, w, h in zip(names, want_sel, got):
        np.testing.assert_allclose(np.asarray(h), np.asarray(w), rtol=1e-3,
                                   atol=1e-4, err_msg=name)


def test_interaction_network_fused2_path():
    """End-to-end: a graph whose packer emits the sender-tile layout
    takes the fused2 path (interpret mode) and matches the fused-v1 path
    on loss and grads."""
    import os

    from magnet_tpu.nn.graphnet import InteractionNetwork
    from magnet_tpu.models.common import batch_vmap, build_radius_graph_batch

    rng = np.random.default_rng(33)
    B, n, latent = 2, 260, 16
    # sorted 1D coords -> few sender tiles per chunk -> snd2 layout present
    coords = np.sort(rng.uniform(-1, 1, (B, n, 1)), axis=1)
    coords = np.concatenate([coords, np.zeros_like(coords)], -1)
    g = build_radius_graph_batch(coords.astype(np.float32), 0.05, loop=True)
    assert g.blk_snd2_tids is not None, "packer should emit snd2 layout"

    E = g.senders.shape[1]
    x = jnp.asarray(rng.normal(size=(B, n, latent)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(B, E, latent)).astype(np.float32))
    inet = batch_vmap(InteractionNetwork, in_axes=(0, 0, 0),
                      node_out=latent, edge_out=latent, mlp_layers=2,
                      mlp_hidden=latent)
    params = inet.init(jax.random.PRNGKey(0), x, e, g)

    def loss(p, graph):
        a, b = inet.apply(p, x, e, graph)
        return jnp.mean(a**2) + jnp.mean(b**2)

    os.environ["MAGNET_TPU_PALLAS_INTERPRET"] = "1"
    try:
        l2, g2 = jax.value_and_grad(loss)(params, g)
        os.environ["MAGNET_TPU_NO_FUSED2"] = "1"
        l1_, g1 = jax.value_and_grad(loss)(params, g)
    finally:
        os.environ.pop("MAGNET_TPU_PALLAS_INTERPRET", None)
        os.environ.pop("MAGNET_TPU_NO_FUSED2", None)
    np.testing.assert_allclose(float(l2), float(l1_), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4),
        g1, g2,
    )


def _chunk_list_args(a):
    """Visit list (ct, cc, flag) for fused2r from _fused2_args tids."""
    from magnet_tpu.models.common import _chunk_list

    tids = np.asarray(a["tids"])
    lists = [_chunk_list(tids)]  # single "sample"
    ct, cc, fl = lists[0]
    return jnp.asarray(ct), jnp.asarray(cc), jnp.asarray(fl)


def test_fused2r_interpret_matches_ref(monkeypatch):
    """Ragged-grid fused kernel (scalar-prefetch flat live-chunk list,
    interpret mode) vs the jnp reference, incl. a fully-dead chunk (left
    out of the visit list), a dead TILE (flag=0 zero-init entry), and
    flag=2 batch-pad repeats."""
    from magnet_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(41)
    a = _fused2_args(rng, T=3, nc=2, chunk=256, H=64, C=64, L1=1, K=3)
    tids = np.asarray(a["tids"]).copy()
    sl = np.asarray(a["sl"]).copy()
    mask = np.asarray(a["mask"]).copy()
    chunk = sl.shape[1] // tids.shape[1]
    # dead chunk (tile 1, chunk 1) and fully-dead tile 2
    tids[1, -1, :] = -1
    sl[1, -chunk:] = -1
    mask[1, -chunk:] = 0.0
    tids[2, :, :] = -1
    sl[2, :] = -1
    mask[2, :] = 0.0
    a["tids"], a["sl"], a["mask"] = map(jnp.asarray, (tids, sl, mask))
    ct, cc, fl = _chunk_list_args(a)
    # append 2 flag=2 pad repeats of the last entry
    ct = jnp.concatenate([ct, ct[-1:], ct[-1:]])
    cc = jnp.concatenate([cc, cc[-1:], cc[-1:]])
    fl = jnp.concatenate([fl, jnp.array([2, 2], jnp.int32)])

    args = (a["pe"], a["pxj"], a["pxi"], a["wr"], a["br"], a["wo"], a["bo"],
            a["ls"], a["lb"], a["tids"], a["sl"], a["recv"], a["mask"])
    ref = pk._fused2_ref_impl(*args)
    monkeypatch.setenv("MAGNET_TPU_PALLAS_INTERPRET", "1")
    out = pk._fused2r_fwd_pallas(*args, ct, cc, fl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_fused2r_grads_interpret(monkeypatch):
    """fused2r Pallas backward (interpret) vs autodiff of the reference;
    unvisited dead-chunk d_z rows must come back zero."""
    from magnet_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(42)
    a = _fused2_args(rng, T=2, nc=2, chunk=128, H=64, C=64, L1=2, K=2)
    tids = np.asarray(a["tids"]).copy()
    sl = np.asarray(a["sl"]).copy()
    mask = np.asarray(a["mask"]).copy()
    chunk = sl.shape[1] // tids.shape[1]
    tids[0, 1, :] = -1
    sl[0, chunk:] = -1
    mask[0, chunk:] = 0.0
    a["tids"], a["sl"], a["mask"] = map(jnp.asarray, (tids, sl, mask))
    ct, cc, fl = _chunk_list_args(a)
    order = ("pe", "pxj", "pxi", "wr", "br", "wo", "bo", "ls", "lb")
    g = jnp.asarray(rng.normal(size=(2, 128, 64)).astype(np.float32))

    def ref_loss(*p):
        return jnp.sum(pk._fused2_ref_impl(
            *p, a["tids"], a["sl"], a["recv"], a["mask"]) * g)

    want = jax.grad(ref_loss, argnums=tuple(range(9)))(
        *[a[k] for k in order])
    monkeypatch.setenv("MAGNET_TPU_PALLAS_INTERPRET", "1")
    got = pk._fused2r_bwd_pallas(
        *[a[k] for k in order], a["tids"], a["sl"], a["recv"], a["mask"],
        ct, cc, fl, g, dpxj_in_kernel=True)
    names = ("pe", "pxi", "wr", "br", "wo", "bo", "ls", "lb")
    want_sel = (want[0], want[2], want[3], want[4], want[5], want[6],
                want[7], want[8])
    for name, w, h in zip(names, want_sel, got[:8]):
        np.testing.assert_allclose(np.asarray(h), np.asarray(w), rtol=1e-3,
                                   atol=1e-4, err_msg=name)
    # in-kernel d_pxj (transposed one-hot accumulation) matches autodiff
    np.testing.assert_allclose(np.asarray(got[8]), np.asarray(want[1]),
                               rtol=1e-3, atol=1e-4, err_msg="pxj")
    # the dead chunk's d_z rows are exactly zero
    np.testing.assert_array_equal(np.asarray(got[0][0, chunk:]), 0.0)


def test_fused2r_bwd_fallback_emits_f32_dz(monkeypatch):
    """With d_pxj NOT accumulated in-kernel (transpose-blocking fallback),
    bf16 inputs must still emit d_z in f32 — the fallback segment-sums
    d_z addends into d_pxj, so bf16 quantization there would degrade
    gradients exactly where per-node edge counts are highest (ADVICE
    round 1).  The in-kernel path keeps the bf16 emission (traffic win)."""
    from magnet_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(44)
    a = _fused2_args(rng, T=2, nc=2, chunk=128, H=64, C=64, L1=1, K=2)
    ct, cc, fl = _chunk_list_args(a)
    order = ("pe", "pxj", "pxi", "wr", "br", "wo", "bo", "ls", "lb")
    bf = {k: (a[k].astype(jnp.bfloat16)
              if k in ("pe", "pxj", "pxi", "wr", "br", "wo", "bo") else a[k])
          for k in order}
    g = jnp.asarray(rng.normal(size=(2, 128, 64)).astype(np.float32))
    monkeypatch.setenv("MAGNET_TPU_PALLAS_INTERPRET", "1")
    got_fb = pk._fused2r_bwd_pallas(
        *[bf[k] for k in order], a["tids"], a["sl"], a["recv"], a["mask"],
        ct, cc, fl, g, dpxj_in_kernel=False)
    assert got_fb[0].dtype == jnp.float32, "fallback d_z must be f32"
    assert got_fb[8] is None
    got_ik = pk._fused2r_bwd_pallas(
        *[bf[k] for k in order], a["tids"], a["sl"], a["recv"], a["mask"],
        ct, cc, fl, g, dpxj_in_kernel=True)
    assert got_ik[0].dtype == jnp.bfloat16, "in-kernel path keeps bf16 d_z"
    # both paths' d_z agree within bf16 tolerance of each other
    np.testing.assert_allclose(
        np.asarray(got_fb[0], np.float32), np.asarray(got_ik[0], np.float32),
        rtol=2e-2, atol=2e-2,
    )
    # f32 fallback d_z matches f32 autodiff within bf16-compute tolerance
    def ref_loss(*p):
        return jnp.sum(pk._fused2_ref_impl(
            *p, a["tids"], a["sl"], a["recv"], a["mask"]) * g)

    want = jax.grad(ref_loss, argnums=(0,))(*[a[k] for k in order])[0]
    rel = (np.linalg.norm(np.asarray(got_fb[0]) - np.asarray(want))
           / np.linalg.norm(np.asarray(want)))
    assert rel < 0.08, rel  # bf16 compute vs f32 autodiff


def test_fused2h_hbm_table_interpret(monkeypatch):
    """HBM-table variant (per-chunk sender-window DMAs, interpret mode):
    fwd matches the reference; bwd matches autodiff."""
    from magnet_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(43)
    a = _fused2_args(rng, T=2, nc=2, chunk=128, H=64, C=64, L1=1, K=3,
                     n=500)
    ct, cc, fl = _chunk_list_args(a)
    args = (a["pe"], a["pxj"], a["pxi"], a["wr"], a["br"], a["wo"], a["bo"],
            a["ls"], a["lb"], a["tids"], a["sl"], a["recv"], a["mask"])
    ref = pk._fused2_ref_impl(*args)
    monkeypatch.setenv("MAGNET_TPU_PALLAS_INTERPRET", "1")
    out = pk._fused2r_fwd_pallas(*args, ct, cc, fl, hbm_table=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)

    order = ("pe", "pxj", "pxi", "wr", "br", "wo", "bo", "ls", "lb")
    g = jnp.asarray(rng.normal(size=ref.shape).astype(np.float32))

    def ref_loss(*p):
        return jnp.sum(pk._fused2_ref_impl(
            *p, a["tids"], a["sl"], a["recv"], a["mask"]) * g)

    want = jax.grad(ref_loss, argnums=tuple(range(9)))(
        *[a[k] for k in order])
    got = pk._fused2r_bwd_pallas(
        *[a[k] for k in order], a["tids"], a["sl"], a["recv"], a["mask"],
        ct, cc, fl, g, hbm_table=True)
    names = ("pe", "pxi", "wr", "br", "wo", "bo", "ls", "lb")
    want_sel = (want[0], want[2], want[3], want[4], want[5], want[6],
                want[7], want[8])
    for name, w, h in zip(names, want_sel, got[:8]):
        np.testing.assert_allclose(np.asarray(h), np.asarray(w), rtol=1e-3,
                                   atol=1e-4, err_msg=name)
    assert got[8] is None  # HBM mode keeps the transpose-reduce d_pxj


def test_chunk_list_sticky_across_batches():
    """The flat live-chunk list length (NCL) is sticky across batches of
    the same workload key, so the compiled fused2r kernel keeps a stable
    shape; batch-pad entries carry flag=2 and repeat the last entry's
    tile (no output-block revisiting breakage)."""
    from magnet_tpu.models.common import (
        _E_TILE_CACHE, build_radius_graph_batch)

    rng = np.random.default_rng(44)
    B, n = 2, 300
    c1 = np.sort(rng.uniform(-1, 1, (B, n, 1)), axis=1)
    c2 = np.sort(rng.uniform(-1, 1, (B, n, 1)), axis=1)
    c1 = np.concatenate([c1, np.zeros_like(c1)], -1).astype(np.float32)
    c2 = np.concatenate([c2, np.zeros_like(c2)], -1).astype(np.float32)
    g1 = build_radius_graph_batch(c1, 0.05, loop=True)
    g2 = build_radius_graph_batch(c2, 0.05, loop=True)
    if g1.blk_chunk_ct is None or g2.blk_chunk_ct is None:
        pytest.skip("snd2 layout absent at this size")
    assert g1.blk_chunk_ct.shape == g2.blk_chunk_ct.shape
    for g in (g1, g2):
        ct = np.asarray(g.blk_chunk_ct)
        fl = np.asarray(g.blk_chunk_flag)
        for b in range(B):
            # tiles appear in non-decreasing runs (accumulation contract)
            real = fl[b] != 2
            assert (np.diff(ct[b][real]) >= 0).all()
            # pad entries repeat the last real entry's tile
            if (~real).any():
                last = ct[b][real][-1]
                assert (ct[b][~real] == last).all()


@pytest.mark.parametrize("h0cache", [False, True])
def test_fused2rf_folde_interpret_matches_ref(monkeypatch, h0cache):
    """fold-e variant (in-kernel edge projection e0 @ we + be, interpret
    mode): the public custom_vjp wrapper matches the jnp reference on the
    forward and full autodiff on every differentiable input, with
    Ce != H.  h0cache=True additionally exercises the opt-in forward
    activation cache (MAGNET_TPU_H0CACHE): the fwd kernel emits the
    post-relu first activation and the bwd kernel consumes it instead of
    recomputing the gathers/projection — results must be identical."""
    from magnet_tpu.ops import pallas_kernels as pk

    if h0cache:
        monkeypatch.setenv("MAGNET_TPU_H0CACHE", "1")

    rng = np.random.default_rng(45)
    Ce = 32
    a = _fused2_args(rng, T=2, nc=2, chunk=128, H=64, C=64, L1=1, K=2)
    a["e0"] = jnp.asarray(
        rng.normal(size=(2, 256, Ce)).astype(np.float32) * 0.3)
    a["we"] = jnp.asarray(rng.normal(size=(Ce, 64)).astype(np.float32) * 0.2)
    a["be"] = jnp.asarray(rng.normal(size=(64,)).astype(np.float32) * 0.2)
    ct, cc, fl = _chunk_list_args(a)
    order = ("e0", "we", "be", "pxj", "pxi", "wr", "br", "wo", "bo",
             "ls", "lb")
    dummy_ids = jnp.zeros((1, 128), jnp.int32)
    dummy_loc = jnp.zeros((1, 128), jnp.int32)
    g = jnp.asarray(rng.normal(size=(2, 128, 64)).astype(np.float32))

    def ref_loss(*p):
        return jnp.sum(pk._fused2re_ref_impl(
            *p, a["tids"], a["sl"], a["recv"], a["mask"]) * g)

    def pallas_loss(*p):
        return jnp.sum(pk.fused_edge_tail_agg2rf(
            *p, a["tids"], a["sl"], a["recv"], a["mask"],
            ct, cc, fl, dummy_ids, dummy_loc) * g)

    args = [a[k] for k in order]
    want_out = pk._fused2re_ref_impl(
        *args, a["tids"], a["sl"], a["recv"], a["mask"])
    want = jax.grad(ref_loss, argnums=tuple(range(len(order))))(*args)
    monkeypatch.setenv("MAGNET_TPU_PALLAS_INTERPRET", "1")
    got_out = pk.fused_edge_tail_agg2rf(
        *args, a["tids"], a["sl"], a["recv"], a["mask"],
        ct, cc, fl, dummy_ids, dummy_loc)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               rtol=1e-4, atol=1e-4)
    got = jax.grad(pallas_loss, argnums=tuple(range(len(order))))(*args)
    for name, w, h in zip(order, want, got):
        np.testing.assert_allclose(np.asarray(h), np.asarray(w), rtol=1e-3,
                                   atol=1e-4, err_msg=name)


def test_interaction_network_folde_path():
    """End-to-end: the fold-e kernel path (raw e0 + in-kernel projection)
    matches the pre-projected fused2r path on loss and grads, including
    the e_scale power-of-two folding."""
    import os

    from magnet_tpu.nn.graphnet import InteractionNetwork
    from magnet_tpu.models.common import batch_vmap, build_radius_graph_batch

    rng = np.random.default_rng(46)
    B, n, latent = 2, 260, 16
    coords = np.sort(rng.uniform(-1, 1, (B, n, 1)), axis=1)
    coords = np.concatenate([coords, np.zeros_like(coords)], -1)
    g = build_radius_graph_batch(coords.astype(np.float32), 0.05, loop=True)
    assert g.blk_chunk_ct is not None, "ragged chunk list should be present"

    E = g.senders.shape[1]
    x = jnp.asarray(rng.normal(size=(B, n, latent)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(B, E, latent)).astype(np.float32))
    inet = batch_vmap(InteractionNetwork, in_axes=(0, 0, 0, None),
                      node_out=latent, edge_out=latent, mlp_layers=2,
                      mlp_hidden=latent)
    params = inet.init(jax.random.PRNGKey(0), x, e, g, 2.0)

    def loss(p, graph):
        a, b = inet.apply(p, x, e, graph, 2.0)
        return jnp.mean(a**2) + jnp.mean(b**2)

    os.environ["MAGNET_TPU_PALLAS_INTERPRET"] = "1"
    try:
        l_fold, g_fold = jax.value_and_grad(loss)(params, g)
        os.environ["MAGNET_TPU_NO_FOLDE"] = "1"
        l_ref, g_ref = jax.value_and_grad(loss)(params, g)
    finally:
        os.environ.pop("MAGNET_TPU_PALLAS_INTERPRET", None)
        os.environ.pop("MAGNET_TPU_NO_FOLDE", None)
    np.testing.assert_allclose(float(l_fold), float(l_ref), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4),
        g_ref, g_fold,
    )


def test_mpnn2r_interpret_matches_ref(monkeypatch):
    """fused_mpnn_edge_agg2r (both gathers in-kernel, ragged grid,
    interpret mode): fwd matches the jnp oracle; bwd matches autodiff on
    every differentiable input, incl. the in-kernel d_send table."""
    from magnet_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(47)
    H = 64
    a = _fused2_args(rng, T=2, nc=2, chunk=128, H=H, C=H, L1=1, K=2)
    w = jnp.asarray(rng.normal(size=(H, H)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.2)
    ct, cc, fl = _chunk_list_args(a)
    g = jnp.asarray(rng.normal(size=(2, 128, H)).astype(np.float32))
    order = ("pxj", "pxi", "w", "b")
    args = (a["pxj"], a["pxi"], w, b)

    def ref_loss(*p):
        return jnp.sum(pk._mpnn2r_ref_impl(
            *p, a["tids"], a["sl"], a["recv"], a["mask"]) * g)

    def pallas_loss(*p):
        return jnp.sum(pk.fused_mpnn_edge_agg2r(
            *p, a["tids"], a["sl"], a["recv"], a["mask"], ct, cc, fl) * g)

    want_out = pk._mpnn2r_ref_impl(
        *args, a["tids"], a["sl"], a["recv"], a["mask"])
    want = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(*args)
    monkeypatch.setenv("MAGNET_TPU_PALLAS_INTERPRET", "1")
    got_out = pk.fused_mpnn_edge_agg2r(
        *args, a["tids"], a["sl"], a["recv"], a["mask"], ct, cc, fl)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               rtol=1e-4, atol=1e-4)
    got = jax.grad(pallas_loss, argnums=(0, 1, 2, 3))(*args)
    for name, wnt, h in zip(order, want, got):
        np.testing.assert_allclose(np.asarray(h), np.asarray(wnt),
                                   rtol=1e-3, atol=1e-4, err_msg=name)


def test_mpnn_layer_v2r_path():
    """End-to-end: MPNNLayer's v2r kernel path (both gathers in-kernel)
    matches the v1 fused path on output and grads."""
    import os

    from magnet_tpu.nn.gnn_layer import MPNNLayer
    from magnet_tpu.models.common import batch_vmap, build_radius_graph_batch

    rng = np.random.default_rng(48)
    B, n, hidden = 2, 260, 32
    coords = np.sort(rng.uniform(-1, 1, (B, n, 1)), axis=1)
    coords2 = np.concatenate([coords, np.zeros_like(coords)], -1)
    g = build_radius_graph_batch(coords2.astype(np.float32), 0.05, loop=True)
    assert g.blk_snd2_tids is not None and g.blk_chunk_ct is not None

    x = jnp.asarray(rng.normal(size=(B, n, hidden)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(B, n, 8)).astype(np.float32))
    pos = jnp.asarray(coords.astype(np.float32))
    var = jnp.asarray(rng.normal(size=(B, n, 1)).astype(np.float32))
    layer = batch_vmap(MPNNLayer, in_axes=(0, 0, 0, 0, 0),
                       hidden_features=hidden, out_features=hidden)
    params = layer.init(jax.random.PRNGKey(0), x, u, pos, var, g)

    def loss(p, graph):
        return jnp.mean(layer.apply(p, x, u, pos, var, graph) ** 2)

    os.environ["MAGNET_TPU_PALLAS_INTERPRET"] = "1"
    try:
        l2, g2 = jax.value_and_grad(loss)(params, g)
        os.environ["MAGNET_TPU_NO_FUSED2"] = "1"
        l1_, g1 = jax.value_and_grad(loss)(params, g)
    finally:
        os.environ.pop("MAGNET_TPU_PALLAS_INTERPRET", None)
        os.environ.pop("MAGNET_TPU_NO_FUSED2", None)
    np.testing.assert_allclose(float(l2), float(l1_), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4),
        g1, g2,
    )


# ---------------------------------------------------------------------------
# LayerNorm / InstanceNorm near-constant-row NaN regression (commit e435e7a:
# the fast E[y^2]-mu^2 variance cancelled NEGATIVE at epoch 30 of the B1-64
# magnet_cnn_2d campaign and NaN'd the rsqrt; torch computes the two-pass
# E[(y-mu)^2] >= 0 and survives).  These tests pin every LN site — the jnp
# graphnet path, flax-core LayerNorm, segment InstanceNorm, and each fused
# Pallas kernel variant (interpret mode), forward AND recompute-backward.
# ---------------------------------------------------------------------------
def _ln_killer(n, scale=1e4, jitter=1e-2, want=-1e-4):
    """A near-constant f32 vector whose FAST-form variance E[v^2]-mu^2 is
    negative below ``want`` (rsqrt would NaN) while the two-pass variance is
    a tiny positive number.  Searched deterministically so the premise is
    verified on the platform actually running the test."""
    for s in range(500):
        v = (scale + np.random.default_rng(s).normal(size=n) * jitter
             ).astype(np.float32)
        m = jnp.mean(jnp.asarray(v))
        fast = float(jnp.mean(jnp.asarray(v) ** 2) - m * m)
        two = float(jnp.mean((jnp.asarray(v) - m) ** 2))
        if fast < want and two >= 0.0:
            return v
    raise AssertionError("no fast-variance-negative vector found")


def test_instance_norm_near_constant_rows_finite():
    from magnet_tpu.ops.segment import segment_instance_norm

    v = _ln_killer(64)
    x = jnp.stack([jnp.asarray(v), jnp.asarray(v) * 0.5 + 7.0], axis=1)
    out = segment_instance_norm(x)
    assert bool(jnp.all(jnp.isfinite(out))), "InstanceNorm NaN'd"


def test_core_layernorm_near_constant_rows_finite():
    from magnet_tpu.nn.core import LayerNorm

    v = _ln_killer(64)
    ln = LayerNorm()
    p = ln.init(jax.random.PRNGKey(0), jnp.asarray(v)[None, :])
    out = ln.apply(p, jnp.tile(jnp.asarray(v)[None, :], (4, 1)))
    assert bool(jnp.all(jnp.isfinite(out))), "core LayerNorm NaN'd"


def test_fused_kernels_layernorm_near_constant_rows_finite(monkeypatch):
    """wo=0 / bo=killer makes every edge-MLP output row exactly the killer
    vector, so the kernels' in-VMEM LayerNorm sees a row whose fast-form
    variance is negative.  Forward outputs and all backward cotangents must
    stay finite in every variant (ref jnp, fused1, fused2r)."""
    from magnet_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(7)
    v = _ln_killer(64)

    # --- fused1 (fused_edge_tail_agg) fwd + bwd, interpret mode
    a = _fused_rand_args(rng, T=2, E=256, H=64, C=64, L1=1)
    a["wo"] = jnp.zeros_like(a["wo"])
    a["bo"] = jnp.asarray(v)
    order = ("h0", "pxi", "wr", "br", "wo", "bo", "ls", "lb")
    args = [a[k] for k in order]
    ref = pk._fused_ref_impl(*args, a["recv"], a["mask"])
    assert bool(jnp.all(jnp.isfinite(ref))), "jnp reference LN NaN'd"
    monkeypatch.setenv("MAGNET_TPU_PALLAS_INTERPRET", "1")
    out = pk._fused_fwd_pallas(*args, a["recv"], a["mask"])
    assert bool(jnp.all(jnp.isfinite(out))), "fused1 forward LN NaN'd"
    g = jnp.asarray(rng.normal(size=(2, 128, 64)).astype(np.float32))
    grads = pk._fused_bwd_pallas(*args, a["recv"], a["mask"], g)
    for name, gr in zip(order, grads):
        assert bool(jnp.all(jnp.isfinite(gr))), f"fused1 bwd d{name} NaN'd"

    # --- fused2r (ragged live-chunk grid) fwd + bwd, interpret mode
    a2 = _fused2_args(rng, T=2, nc=2, chunk=128, H=64, C=64, L1=1, K=2)
    a2["wo"] = jnp.zeros_like(a2["wo"])
    a2["bo"] = jnp.asarray(v)
    ct, cc, fl = _chunk_list_args(a2)
    args2 = (a2["pe"], a2["pxj"], a2["pxi"], a2["wr"], a2["br"], a2["wo"],
             a2["bo"], a2["ls"], a2["lb"], a2["tids"], a2["sl"], a2["recv"],
             a2["mask"])
    out2 = pk._fused2r_fwd_pallas(*args2, ct, cc, fl)
    assert bool(jnp.all(jnp.isfinite(out2))), "fused2r forward LN NaN'd"
    g2 = jnp.asarray(rng.normal(size=(2, 128, 64)).astype(np.float32))
    grads2 = pk._fused2r_bwd_pallas(*args2, ct, cc, fl, g2)
    for i, gr in enumerate(grads2):
        if gr is None:  # dwe/dbe only exist on the fold-e variant
            continue
        assert bool(jnp.all(jnp.isfinite(gr))), f"fused2r bwd arg{i} NaN'd"


def test_interaction_network_layernorm_near_constant_finite(monkeypatch):
    """Module-level pin for nn/graphnet.py's inline two-pass LayerNorm:
    overriding w_out=0 / b_out=killer drives the edge LN with a row whose
    fast-form variance is negative, in all three execution modes."""
    from magnet_tpu.models.common import build_radius_graph_batch
    from magnet_tpu.nn.graphnet import InteractionNetwork

    rng = np.random.default_rng(9)
    n, latent = 64, 32
    v = _ln_killer(latent)
    coords = rng.uniform(-1, 1, (1, n, 2)).astype(np.float32)
    g = build_radius_graph_batch(coords, 0.5, loop=True)
    gs = jax.tree.map(lambda x: x[0] if x is not None else None, g)
    x = jnp.asarray(rng.normal(size=(n, latent)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(gs.senders.shape[0], latent))
                    .astype(np.float32))
    net = InteractionNetwork(node_out=latent, edge_out=latent, mlp_layers=2,
                             mlp_hidden=latent)
    params = jax.device_get(net.init(jax.random.PRNGKey(0), x, e, gs))
    params["params"]["w_out"] = np.zeros_like(params["params"]["w_out"])
    params["params"]["b_out"] = v

    def run(mode):
        if mode == "unfused":
            monkeypatch.setenv("MAGNET_TPU_NO_FUSED", "1")
        else:
            monkeypatch.delenv("MAGNET_TPU_NO_FUSED", raising=False)
        if mode == "fused1":
            monkeypatch.setenv("MAGNET_TPU_NO_FUSED2", "1")
        else:
            monkeypatch.delenv("MAGNET_TPU_NO_FUSED2", raising=False)
        xo, eo = net.apply(params, x, e, gs)
        return xo, eo

    monkeypatch.setenv("MAGNET_TPU_PALLAS_INTERPRET", "1")
    try:
        for mode in ("unfused", "fused1", "fused2"):
            xo, eo = run(mode)
            assert bool(jnp.all(jnp.isfinite(xo))), f"{mode}: node out NaN"
            assert bool(jnp.all(jnp.isfinite(eo))), f"{mode}: edge out NaN"
    finally:
        monkeypatch.delenv("MAGNET_TPU_NO_FUSED", raising=False)
        monkeypatch.delenv("MAGNET_TPU_NO_FUSED2", raising=False)


def test_interaction_network_fused2_snd2_only():
    """Large-mesh lane (VERDICT r2 item 4): when out-degree skew kills the
    sender-transpose layout (blk_snd_edge_ids=None) the snd2 in-kernel
    gather must still engage — the backward then uses the in-kernel d_pxj
    accumulator exclusively.  Loss/grads must match the unfused path."""
    import os

    from magnet_tpu.nn.graphnet import InteractionNetwork
    from magnet_tpu.models.common import batch_vmap, build_radius_graph_batch

    rng = np.random.default_rng(34)
    B, n, latent = 2, 260, 16
    coords = np.sort(rng.uniform(-1, 1, (B, n, 1)), axis=1)
    coords = np.concatenate([coords, np.zeros_like(coords)], -1)
    g = build_radius_graph_batch(coords.astype(np.float32), 0.05, loop=True)
    assert g.blk_snd2_tids is not None
    # simulate the 256²-grid packer outcome: snd2 present, transpose absent
    g = g._replace(blk_snd_edge_ids=None, blk_snd_local=None)

    inet_probe = InteractionNetwork(node_out=latent, edge_out=latent,
                                    mlp_layers=2, mlp_hidden=latent)
    t = g.blk_recv_local.shape[1]
    assert inet_probe._fused2_mode(g, t * 128, latent) == "vmem"

    E = g.senders.shape[1]
    x = jnp.asarray(rng.normal(size=(B, n, latent)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(B, E, latent)).astype(np.float32))
    inet = batch_vmap(InteractionNetwork, in_axes=(0, 0, 0),
                      node_out=latent, edge_out=latent, mlp_layers=2,
                      mlp_hidden=latent)
    params = inet.init(jax.random.PRNGKey(0), x, e, g)

    def loss(p, graph):
        a, b = inet.apply(p, x, e, graph)
        return jnp.mean(a**2) + jnp.mean(b**2)

    os.environ["MAGNET_TPU_PALLAS_INTERPRET"] = "1"
    try:
        l2, g2 = jax.value_and_grad(loss)(params, g)
        os.environ["MAGNET_TPU_NO_FUSED2"] = "1"
        l1_, g1 = jax.value_and_grad(loss)(params, g)
    finally:
        os.environ.pop("MAGNET_TPU_PALLAS_INTERPRET", None)
        os.environ.pop("MAGNET_TPU_NO_FUSED2", None)
    np.testing.assert_allclose(float(l2), float(l1_), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4),
        g1, g2,
    )


def test_interaction_network_fused2_hbm_h0_snd2_only():
    """Snd-less HBM-window lane (256²-scale meshes where the VMEM table +
    d_pxj accumulator exceed chip VMEM): with the h0 forward-activation
    cache the forward windows the table from HBM and the backward skips
    the table entirely (stub) while accumulating d_pxj in-kernel.
    Loss/grads must match the unfused path."""
    import os

    from magnet_tpu.nn.graphnet import InteractionNetwork
    from magnet_tpu.models.common import batch_vmap, build_radius_graph_batch

    rng = np.random.default_rng(35)
    B, n, latent = 2, 260, 16
    coords = np.sort(rng.uniform(-1, 1, (B, n, 1)), axis=1)
    coords = np.concatenate([coords, np.zeros_like(coords)], -1)
    g = build_radius_graph_batch(coords.astype(np.float32), 0.05, loop=True)
    assert g.blk_snd2_tids is not None
    g = g._replace(blk_snd_edge_ids=None, blk_snd_local=None)

    E = g.senders.shape[1]
    x = jnp.asarray(rng.normal(size=(B, n, latent)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(B, E, latent)).astype(np.float32))
    inet = batch_vmap(InteractionNetwork, in_axes=(0, 0, 0),
                      node_out=latent, edge_out=latent, mlp_layers=2,
                      mlp_hidden=latent)
    params = inet.init(jax.random.PRNGKey(0), x, e, g)

    def loss(p, graph):
        a, b = inet.apply(p, x, e, graph)
        return jnp.mean(a**2) + jnp.mean(b**2)

    inet_probe = InteractionNetwork(node_out=latent, edge_out=latent,
                                    mlp_layers=2, mlp_hidden=latent)
    t = g.blk_recv_local.shape[1]
    os.environ["MAGNET_TPU_PALLAS_INTERPRET"] = "1"
    os.environ["MAGNET_TPU_H0CACHE"] = "1"
    # force the table out of VMEM (the gate is a class attribute read at
    # import time, so patch it rather than the env); keep the d_pxj budget
    saved_gate = InteractionNetwork._FUSED2_TABLE_BYTES
    InteractionNetwork._FUSED2_TABLE_BYTES = 1024
    try:
        assert inet_probe._fused2_mode(g, t * 128, latent) == "hbm"
        l2, g2 = jax.value_and_grad(loss)(params, g)
        os.environ["MAGNET_TPU_NO_FUSED2"] = "1"
        l1_, g1 = jax.value_and_grad(loss)(params, g)
    finally:
        InteractionNetwork._FUSED2_TABLE_BYTES = saved_gate
        os.environ.pop("MAGNET_TPU_PALLAS_INTERPRET", None)
        os.environ.pop("MAGNET_TPU_H0CACHE", None)
        os.environ.pop("MAGNET_TPU_NO_FUSED2", None)
    np.testing.assert_allclose(float(l2), float(l1_), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4),
        g1, g2,
    )


@pytest.mark.parametrize("bucketk", ["0", "1,2", "2,3"])
def test_fused2r_bucketed_bwd_matches_ref(monkeypatch, bucketk):
    """Bucketed-K backward (ledger #15): per-chunk width-specialized
    branches must be bit-equivalent to the single-width kernel for every
    cut configuration.  K=4 with random K_live in [1, 4] exercises every
    branch, including chunks whose K_live is strictly below the branch
    width (zero-padded windows)."""
    from magnet_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(77)
    a = _fused2_args(rng, T=2, nc=3, chunk=128, H=64, C=64, L1=1, n=700, K=4)
    ct, cc, fl = _chunk_list_args(a)
    order = ("pe", "pxj", "pxi", "wr", "br", "wo", "bo", "ls", "lb")
    g = jnp.asarray(rng.normal(size=(2, 128, 64)).astype(np.float32))

    def ref_loss(*p):
        return jnp.sum(pk._fused2_ref_impl(
            *p, a["tids"], a["sl"], a["recv"], a["mask"]) * g)

    want = jax.grad(ref_loss, argnums=tuple(range(9)))(
        *[a[k] for k in order])
    monkeypatch.setenv("MAGNET_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("MAGNET_TPU_BUCKETK", bucketk)
    got = pk._fused2r_bwd_pallas(
        *[a[k] for k in order], a["tids"], a["sl"], a["recv"], a["mask"],
        ct, cc, fl, g, dpxj_in_kernel=True)
    names = ("pe", "pxi", "wr", "br", "wo", "bo", "ls", "lb")
    want_sel = (want[0], want[2], want[3], want[4], want[5], want[6],
                want[7], want[8])
    for name, w, h in zip(names, want_sel, got[:8]):
        np.testing.assert_allclose(np.asarray(h), np.asarray(w), rtol=1e-3,
                                   atol=1e-4, err_msg=name)
    np.testing.assert_allclose(np.asarray(got[8]), np.asarray(want[1]),
                               rtol=1e-3, atol=1e-4, err_msg="pxj")


@pytest.mark.parametrize("bucketk_fwd", ["1,2", "3"])
def test_fused2r_bucketed_fwd_matches_ref(monkeypatch, bucketk_fwd):
    """Opt-in bucketed forward (narrow chunks take the merged one-hot at
    width Kb) must match the reference for every cut configuration."""
    from magnet_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(78)
    a = _fused2_args(rng, T=2, nc=3, chunk=128, H=64, C=64, L1=1, n=700, K=4)
    ct, cc, fl = _chunk_list_args(a)
    args = (a["pe"], a["pxj"], a["pxi"], a["wr"], a["br"], a["wo"], a["bo"],
            a["ls"], a["lb"], a["tids"], a["sl"], a["recv"], a["mask"])
    ref = pk._fused2_ref_impl(*args)
    monkeypatch.setenv("MAGNET_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("MAGNET_TPU_BUCKETK_FWD", bucketk_fwd)
    out = pk._fused2r_fwd_pallas(*args, ct, cc, fl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)
