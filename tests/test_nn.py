"""Per-layer numerical parity vs torch with copied weights (BASELINE.md:
"per-layer activations allclose vs the PyTorch reference").

Each test builds the flax module, copies its initialized weights into the
equivalent torch functional computation (or vice versa), and compares
activations.  torch modules are used via their public API only.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from magnet_tpu.nn.core import MLP, Linear, gelu, swish
from magnet_tpu.nn.gnn_layer import TemporalBundlingDecoder
from magnet_tpu.nn.lstm import LSTM
from magnet_tpu.nn.spectral import SpectralConv1d

torch = pytest.importorskip("torch")


def test_linear_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 7)).astype(np.float32)
    mod = Linear(11)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    kernel = np.asarray(params["params"]["Dense_0"]["kernel"])   # (in, out)
    bias = np.asarray(params["params"]["Dense_0"]["bias"])
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))
    ref = torch.nn.functional.linear(
        torch.from_numpy(x), torch.from_numpy(kernel.T), torch.from_numpy(bias)
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_linear_init_bounds():
    mod = Linear(64)
    x = jnp.zeros((1, 100))
    params = mod.init(jax.random.PRNGKey(1), x)
    k = np.asarray(params["params"]["Dense_0"]["kernel"])
    b = np.asarray(params["params"]["Dense_0"]["bias"])
    bound = 1.0 / np.sqrt(100)
    assert abs(k).max() <= bound + 1e-7 and abs(b).max() <= bound + 1e-7
    # roughly uniform: std close to bound/sqrt(3)
    assert abs(k.std() - bound / np.sqrt(3)) < 0.15 * bound


def test_gelu_exact_matches_torch():
    x = np.linspace(-4, 4, 101).astype(np.float32)
    ours = np.asarray(gelu(jnp.asarray(x)))
    ref = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()  # exact erf
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_swish_matches_torch_silu():
    x = np.linspace(-4, 4, 101).astype(np.float32)
    ours = np.asarray(swish(jnp.asarray(x)))
    ref = torch.nn.functional.silu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def test_strided_conv_decoder_matches_torch():
    """TemporalBundlingDecoder conv arithmetic == torch Conv1d chain
    (reference mpnn.py:144-148, tw=16: k16 s5, Swish, k8 s1)."""
    rng = np.random.default_rng(2)
    h = rng.normal(size=(3, 128)).astype(np.float32)
    dec = TemporalBundlingDecoder(time_window=16, with_mid_swish=True)
    params = dec.init(jax.random.PRNGKey(0), jnp.asarray(h))
    ours = np.asarray(dec.apply(params, jnp.asarray(h)))
    assert ours.shape == (3, 16)

    p = params["params"]
    # flax Conv kernel: (k, in, out) -> torch (out, in, k)
    w1 = np.asarray(p["Conv_0"]["Conv_0"]["kernel"]).transpose(2, 1, 0)
    b1 = np.asarray(p["Conv_0"]["Conv_0"]["bias"])
    w2 = np.asarray(p["Conv_1"]["Conv_0"]["kernel"]).transpose(2, 1, 0)
    b2 = np.asarray(p["Conv_1"]["Conv_0"]["bias"])
    xt = torch.from_numpy(h).unsqueeze(1)                       # (N, 1, 128)
    y = torch.nn.functional.conv1d(xt, torch.from_numpy(w1),
                                   torch.from_numpy(b1), stride=5)
    y = torch.nn.functional.silu(y)
    y = torch.nn.functional.conv1d(y, torch.from_numpy(w2),
                                   torch.from_numpy(b2), stride=1)
    np.testing.assert_allclose(ours, y.squeeze(1).numpy(), rtol=1e-4, atol=1e-5)


def test_lstm_matches_torch():
    rng = np.random.default_rng(3)
    T, C, H, L = 6, 4, 8, 2
    x = rng.normal(size=(T, C)).astype(np.float32)
    mod = LSTM(hidden=H, num_layers=L)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours, (h_n, c_n) = mod.apply(params, jnp.asarray(x))

    ref = torch.nn.LSTM(C, H, L, batch_first=False)
    with torch.no_grad():
        for layer in range(L):
            cell = params["params"][f"layer_{layer}"]
            getattr(ref, f"weight_ih_l{layer}").copy_(
                torch.from_numpy(np.asarray(cell["w_ih"]).T)
            )
            getattr(ref, f"weight_hh_l{layer}").copy_(
                torch.from_numpy(np.asarray(cell["w_hh"]).T)
            )
            getattr(ref, f"bias_ih_l{layer}").copy_(
                torch.from_numpy(np.asarray(cell["b_ih"]))
            )
            getattr(ref, f"bias_hh_l{layer}").copy_(
                torch.from_numpy(np.asarray(cell["b_hh"]))
            )
        out, (h_ref, c_ref) = ref(torch.from_numpy(x).unsqueeze(1))
    np.testing.assert_allclose(np.asarray(ours), out.squeeze(1).numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_n), h_ref.squeeze(1).numpy(),
                               rtol=1e-4, atol=1e-5)


def test_spectral_conv1d_matches_torch_fft():
    rng = np.random.default_rng(4)
    B, Ci, Co, L, modes = 2, 3, 5, 32, 8
    x = rng.normal(size=(B, Ci, L)).astype(np.float32)
    mod = SpectralConv1d(Ci, Co, modes)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))

    wr = np.asarray(params["params"]["weights_real"])
    wi = np.asarray(params["params"]["weights_imag"])
    w = torch.from_numpy(wr) + 1j * torch.from_numpy(wi)
    xt = torch.from_numpy(x)
    x_ft = torch.fft.rfft(xt)
    out_ft = torch.zeros(B, Co, L // 2 + 1, dtype=torch.cfloat)
    out_ft[:, :, :modes] = torch.einsum("bix,iox->box", x_ft[:, :, :modes], w)
    ref = torch.fft.irfft(out_ft, n=L).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_same_padding_conv_matches_torch():
    """flax 'SAME' == torch padding=k//2 for odd k (EDSR blocks)."""
    from magnet_tpu.nn.core import Conv

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 16, 4)).astype(np.float32)          # (B, L, C)
    mod = Conv(6, (3,))
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))
    w = np.asarray(params["params"]["Conv_0"]["kernel"]).transpose(2, 1, 0)
    b = np.asarray(params["params"]["Conv_0"]["bias"])
    ref = torch.nn.functional.conv1d(
        torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(w),
        torch.from_numpy(b), padding=1,
    ).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_interaction_network_split_equals_concat():
    """The pre-projected (split-weight) edge MLP == explicit concat path."""
    from magnet_tpu.models.common import Graph
    from magnet_tpu.nn.graphnet import InteractionNetwork
    from magnet_tpu.ops.graph import block_graph, radius_graph_np

    rng = np.random.default_rng(6)
    n, c = 50, 8
    pos = rng.uniform(-1, 1, (n, 2))
    s, t = radius_graph_np(pos, 0.5, loop=True)
    bg = block_graph(s, t, n)
    e_flat = bg.senders.size
    gs = Graph(
        senders=jnp.asarray(bg.senders.reshape(-1)),
        receivers=jnp.asarray(bg.receivers),
        edge_mask=jnp.asarray(bg.mask.reshape(-1)),
        blk_recv_local=jnp.asarray(bg.recv_local),
        degree=jnp.asarray(bg.degree),
    )
    x = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(e_flat, c)).astype(np.float32))
    mod = InteractionNetwork(node_out=c, edge_out=c, mlp_layers=2, mlp_hidden=c)
    params = mod.init(jax.random.PRNGKey(0), x, e, gs)

    x_i = jnp.take(x, gs.receivers, axis=0)
    x_j = jnp.take(x, gs.senders, axis=0)
    concat_msg = mod.apply(
        params, jnp.concatenate([x_i, x_j, e], axis=-1), method="edge_mlp"
    )

    # recompute the split path's messages by re-running __call__ internals:
    # compare aggregated node output instead (covers the whole step)
    out_x, out_e = mod.apply(params, x, e, gs)
    from magnet_tpu.ops.segment import aggregate_mean_graph

    agg = aggregate_mean_graph(concat_msg, gs)
    upd = mod.apply(params, jnp.concatenate([agg, x], axis=-1), method="node_mlp")
    np.testing.assert_allclose(
        np.asarray(out_x), np.asarray(x + upd), rtol=2e-4, atol=2e-5
    )


@pytest.mark.parametrize("tw", [10, 16, 20, 25, 50])
def test_temporal_decoder_table_all_windows(tw):
    """Every reference time_window decoder variant maps 128 -> tw
    (reference mpnn.py:140-163 kernel/stride table)."""
    import jax as _jax
    import jax.numpy as _jnp

    dec = TemporalBundlingDecoder(time_window=tw, with_mid_swish=tw != 10)
    h = _jnp.zeros((3, 128))
    params = dec.init(_jax.random.PRNGKey(0), h)
    out = dec.apply(params, h)
    assert out.shape == (3, tw)


def test_interaction_network_fused_matches_unfused():
    """The fused Pallas edge-pipeline path == the legacy gather/MLP/agg
    path, values AND grads (CPU: fused runs the jnp reference impl)."""
    from magnet_tpu.models.common import Graph
    from magnet_tpu.nn.graphnet import InteractionNetwork
    from magnet_tpu.ops.graph import block_graph, radius_graph_np

    rng = np.random.default_rng(7)
    n, c = 70, 8
    pos = rng.uniform(-1, 1, (n, 2))
    s, t = radius_graph_np(pos, 0.5, loop=True)
    bg = block_graph(s, t, n)
    gs = Graph(
        senders=jnp.asarray(bg.senders.reshape(-1)),
        receivers=jnp.asarray(bg.receivers),
        edge_mask=jnp.asarray(bg.mask.reshape(-1)),
        blk_recv_local=jnp.asarray(bg.recv_local),
        degree=jnp.asarray(bg.degree),
        blk_snd_edge_ids=(jnp.asarray(bg.snd_edge_ids)
                          if bg.snd_edge_ids is not None else None),
        blk_snd_local=(jnp.asarray(bg.snd_local)
                       if bg.snd_local is not None else None),
    )
    x = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(bg.senders.size, c)).astype(np.float32))
    mod = InteractionNetwork(node_out=c, edge_out=c, mlp_layers=2,
                             mlp_hidden=c)
    params = mod.init(jax.random.PRNGKey(0), x, e, gs)

    def loss(p, x_, e_):
        ox, oe = mod.apply(p, x_, e_, gs)
        return jnp.sum(ox**2) + jnp.sum(jnp.abs(oe))

    import os

    vf, gf = jax.value_and_grad(loss, argnums=(0, 1, 2))(params, x, e)
    os.environ["MAGNET_TPU_NO_FUSED"] = "1"
    try:
        vu, gu = jax.value_and_grad(loss, argnums=(0, 1, 2))(params, x, e)
    finally:
        del os.environ["MAGNET_TPU_NO_FUSED"]
    np.testing.assert_allclose(float(vf), float(vu), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-5)


def test_mpnn_layer_fused_matches_unfused():
    """MPNNLayer fused message path == legacy path, values and grads."""
    from magnet_tpu.models.common import Graph
    from magnet_tpu.nn.gnn_layer import MPNNLayer
    from magnet_tpu.ops.graph import block_graph, radius_graph_np

    rng = np.random.default_rng(9)
    n, h, tw = 60, 16, 8
    pos = rng.uniform(0, 1, (n, 1))
    s, t = radius_graph_np(pos, 0.15, loop=False)
    bg = block_graph(s, t, n)
    gs = Graph(
        senders=jnp.asarray(bg.senders.reshape(-1)),
        receivers=jnp.asarray(bg.receivers),
        edge_mask=jnp.asarray(bg.mask.reshape(-1)),
        blk_recv_local=jnp.asarray(bg.recv_local),
        degree=jnp.asarray(bg.degree),
        blk_snd_edge_ids=(jnp.asarray(bg.snd_edge_ids)
                          if bg.snd_edge_ids is not None else None),
        blk_snd_local=(jnp.asarray(bg.snd_local)
                       if bg.snd_local is not None else None),
    )
    x = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(n, tw)).astype(np.float32))
    posj = jnp.asarray(pos.astype(np.float32))
    varis = jnp.asarray(rng.normal(size=(n, 1)).astype(np.float32))
    mod = MPNNLayer(hidden_features=h, out_features=h)
    params = mod.init(jax.random.PRNGKey(0), x, u, posj, varis, gs)

    def loss(p, x_):
        return jnp.sum(mod.apply(p, x_, u, posj, varis, gs) ** 2)

    import os

    vf, gf = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
    os.environ["MAGNET_TPU_NO_FUSED"] = "1"
    try:
        vu, gu = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
    finally:
        del os.environ["MAGNET_TPU_NO_FUSED"]
    np.testing.assert_allclose(float(vf), float(vu), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=1e-5)
