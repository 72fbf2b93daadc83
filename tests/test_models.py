"""End-to-end model smoke tests: every family builds, computes a finite
train loss + gradient and a finite val loss on tiny synthetic data."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from magnet_tpu.data import synthetic
from magnet_tpu.data.datasets import (
    Dataset1D,
    Dataset2D,
    DatasetGraph1D,
    DatasetGraph2D,
    DatasetImplicit1D,
    DatasetImplicit2D,
    DatasetImplicitGNN1D,
    DatasetImplicitGNN2D,
)
from magnet_tpu.data.loader import DataLoader
from magnet_tpu.models.factory import create_model

DATA = "/tmp/magnet_test_data"


@pytest.fixture(scope="session")
def f1d():
    path = os.path.join(DATA, "ce_30x64.h5")
    if not os.path.exists(path):
        synthetic.generate_1d_file(
            path, n_train=4, n_valid=2, n_test=2, nt=30, nx=64, seed=0
        )
    return path


@pytest.fixture(scope="session")
def f1d48():
    path = os.path.join(DATA, "ce_48x64.h5")
    if not os.path.exists(path):
        synthetic.generate_1d_file(
            path, n_train=4, n_valid=2, n_test=2, nt=48, nx=64, seed=1
        )
    return path


@pytest.fixture(scope="session")
def f2d():
    path = os.path.join(DATA, "b_12x16.h5")
    if not os.path.exists(path):
        synthetic.generate_2d_file(
            path, n_train=4, n_valid=2, n_test=2, nt=12, res=16, seed=0
        )
    return path


@pytest.fixture(scope="session")
def f2d_irr():
    path = os.path.join(DATA, "b_12x16_irr.h5")
    if not os.path.exists(path):
        synthetic.generate_2d_file(
            path, n_train=4, n_valid=2, n_test=2, nt=12, res=16, seed=0,
            irregular=True, n_nodes=128,
        )
    return path


def _check(model, batch, graph, val_batch=None, val_graph=None):
    jb = {
        k: jnp.asarray(v)
        for k, v in batch.items()
        if k != "sample_idx" or model.name == "magnet_cnn_no_interaction"
    }
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jb, graph)

    def lfn(p):
        return model.loss(p, jb, graph, rng=rng, train=True)[0]

    loss, grads = jax.value_and_grad(lfn)(params)
    assert np.isfinite(float(loss)), f"{model.name} train loss not finite"
    gn = sum(float(jnp.sum(g**2)) for g in jax.tree.leaves(grads))
    assert np.isfinite(gn) and gn > 0, f"{model.name} grad degenerate"
    if val_batch is None:
        val_batch, val_graph = jb, graph
    else:
        val_batch = {k: jnp.asarray(v) for k, v in val_batch.items()}
    vloss, _ = model.loss(params, val_batch, val_graph, train=False)
    assert np.isfinite(float(vloss)), f"{model.name} val loss not finite"
    # eval contract: rollout_target must align with predict's primary output
    pred = model.predict(params, val_batch, val_graph)
    pred0 = pred[0] if isinstance(pred, tuple) else pred
    tgt = model.rollout_target(val_batch, int(pred0.shape[1]))
    assert tgt.shape == pred0.shape, (
        f"{model.name} rollout_target {tgt.shape} != predict {pred0.shape}"
    )
    return params


def test_fno_1d(f1d):
    ds = Dataset1D(f1d, "train", nt=30, nx=64)
    batch = next(iter(DataLoader(ds, 2, prefetch=0)))
    m = create_model(
        "fno_1d",
        dict(modes=6, width=16, num_layers=2, time_history=10, time_future=10,
             teacher_forcing=True, loss="l1"),
    )
    _check(m, batch, None)


def test_fno_rejects_mismatched_windows():
    # the rollout scan swaps a (B, th, L) carry for a (B, tf, L) prediction;
    # th != tf must fail loudly at construction, not as a scan shape error
    import pytest

    with pytest.raises(ValueError, match="time_history == time_future"):
        create_model(
            "fno_1d",
            dict(modes=6, width=16, num_layers=2, time_history=10,
                 time_future=5, teacher_forcing=True, loss="l1"),
        )


def test_fno_2d(f2d):
    ds = Dataset2D(f2d, "train", nt=12, res=16)
    batch = next(iter(DataLoader(ds, 2, prefetch=0)))
    m = create_model(
        "fno_2d",
        dict(modes_1=4, modes_2=4, width=8, num_layers=2, time_history=4,
             time_future=4, teacher_forcing=True, loss="l1"),
    )
    _check(m, batch, None)


def test_mpnn_1d(f1d):
    ds = DatasetGraph1D(f1d, "train", nt=30, nx=64)
    batch = next(iter(DataLoader(ds, 2, prefetch=0)))
    m = create_model(
        "mpnn",
        dict(hidden_features=128, hidden_layer=2, time_window=10,
             teacher_forcing=False, neighbors=3, loss="l1"),
    )
    g = m.build_graph(batch)
    _check(m, batch, g)


def test_mpnn_2d(f2d):
    ds = DatasetGraph2D(f2d, "train", nt=12, res=16)
    # time_window=10 needs nt >= 20; trim via a wrapper dataset
    class Trim:
        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            d = ds[i]
            return d

        def set_epoch(self, s):
            ds.set_epoch(s)

    batch = next(iter(DataLoader(Trim(), 2, prefetch=0)))
    # nt=12 < 2*10 -> use a synthetic longer t by repeating frames
    batch["u"] = np.concatenate([batch["u"]] * 2, axis=-1)[:, :, :20]
    batch["t"] = np.linspace(0, 1, 20, dtype=np.float32)[None].repeat(2, 0)
    m = create_model(
        "mpnn_2d",
        dict(hidden_features=128, hidden_layer=2, time_window=10,
             teacher_forcing=False, neighbors=2, loss="l1"),
    )
    g = m.build_graph(batch)
    _check(m, batch, g)


def test_magnet_cnn_1d(f1d48):
    ds = DatasetImplicit1D(f1d48, "train", nt=48, nx=64, samples=16)
    batch = next(iter(DataLoader(ds, 2, prefetch=0)))
    m = create_model(
        "magnet_cnn",
        dict(time_slice=16, latent_dim=8, num_message_passing_steps=2,
             mlp_layers=2, mlp_hidden=16, n_chan=16, res_layers=1,
             radius=0.3, teacher_forcing=True, loss="l1"),
    )
    g = m.build_graph(batch)
    _check(m, batch, g)


def test_magnet_cnn_1d_graph_dtype_bf16(f1d48):
    """model.params.graph_dtype=bf16 engages the mixed-precision GraphNet
    stage; loss stays close to the f32 path (same params: the knob only
    changes compute dtype, not the param tree)."""
    ds = DatasetImplicit1D(f1d48, "train", nt=48, nx=64, samples=16)
    batch = next(iter(DataLoader(ds, 2, prefetch=0)))
    hp = dict(time_slice=16, latent_dim=8, num_message_passing_steps=2,
              mlp_layers=2, mlp_hidden=16, n_chan=16, res_layers=1,
              radius=0.3, teacher_forcing=True, loss="l1")
    m32 = create_model("magnet_cnn", hp)
    mbf = create_model("magnet_cnn", dict(hp, graph_dtype="bf16"))
    g = m32.build_graph(batch)
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "sample_idx"}
    rng = jax.random.PRNGKey(0)
    params = m32.init(rng, jb, g)
    # identical param tree: the bf16 core must accept the f32 params as-is
    l32, _ = m32.loss(params, jb, g, rng=rng, train=True)
    lbf, _ = mbf.loss(params, jb, g, rng=rng, train=True)
    assert np.isfinite(float(lbf))
    assert abs(float(lbf) - float(l32)) < 5e-2 * max(1.0, abs(float(l32)))
    # and it must be trainable: finite, nonzero grads
    gbf = jax.grad(lambda p: mbf.loss(p, jb, g, rng=rng, train=True)[0])(params)
    gn = sum(float(jnp.sum(g_**2)) for g_ in jax.tree.leaves(gbf))
    assert np.isfinite(gn) and gn > 0


def test_magnet_cnn_1d_val_full_grid(f1d48):
    ds = DatasetImplicit1D(f1d48, "valid", nt=48, nx=64)
    batch = next(iter(DataLoader(ds, 2, prefetch=0, shuffle=False)))
    m = create_model(
        "magnet_cnn",
        dict(time_slice=16, latent_dim=8, num_message_passing_steps=1,
             mlp_layers=1, mlp_hidden=8, n_chan=8, res_layers=1,
             radius=0.3, teacher_forcing=True, loss="l1"),
    )
    g = m.build_graph(batch)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    params = m.init(jax.random.PRNGKey(0), jb, g)
    vloss, _ = m.loss(params, jb, g, train=False)
    assert np.isfinite(float(vloss))


def test_magnet_gnn_1d(f1d48):
    ds = DatasetImplicitGNN1D(f1d48, "train", nt=48, nx=64, samples=16)
    batch = next(iter(DataLoader(ds, 2, prefetch=0)))
    m = create_model(
        "magnet_gnn",
        dict(time_slice=16, latent_dim=16, num_message_passing_steps=2,
             mlp_layers=2, mlp_hidden=16, n_chan=16, radius=0.3,
             teacher_forcing=True, codec_neighbors=4, noise=0.01,
             interpolation="area", loss="l1"),
    )
    g = m.build_graph(batch)
    _check(m, batch, g)


def test_magnet_gnn_2d_irregular(f2d_irr):
    ds = DatasetImplicitGNN2D(
        f2d_irr, "train", nt=12, res=16, regular=False, samples=16, n_nodes=128
    )
    batch = next(iter(DataLoader(ds, 2, prefetch=0)))
    m = create_model(
        "magnet_gnn",
        dict(time_slice=4, latent_dim=16, num_message_passing_steps=2,
             mlp_layers=2, mlp_hidden=16, n_chan=16, radius=0.4,
             teacher_forcing=True, codec_neighbors=4, noise=0.0,
             interpolation="area", loss="l1"),
    )
    g = m.build_graph(batch)
    _check(m, batch, g)


def test_magnet_cnn_2d(f2d):
    ds = DatasetImplicit2D(f2d, "train", nt=12, res=16, samples=16)
    batch = next(iter(DataLoader(ds, 2, prefetch=0)))
    m = create_model(
        "magnet_cnn_2d",
        dict(time_slice=4, latent_dim=8, num_message_passing_steps=2,
             mlp_layers=2, mlp_hidden=16, n_chan=8, res_layers=1,
             radius=0.5, teacher_forcing=True, loss="l1"),
    )
    g = m.build_graph(batch)
    _check(m, batch, g)


def test_magnet_cnn_no_interaction(f1d48):
    ds = DatasetImplicit1D(f1d48, "train", nt=48, nx=64, samples=8)
    batch = next(iter(DataLoader(ds, 2, prefetch=0)))
    # val path needs full-grid coords (N == L), as the valid split provides
    dsv = DatasetImplicit1D(f1d48, "valid", nt=48, nx=64)
    vbatch = next(iter(DataLoader(dsv, 2, prefetch=0, shuffle=False)))
    m = create_model(
        "magnet_cnn_no_interaction",
        dict(time_slice=16, use_lstm=True, lstm_hidden=16, lstm_layers=1,
             mlp_layers=1, mlp_hidden=8, scales=1, n_chan=8, res_layers=1,
             teacher_forcing=False, loss="l1"),
    )
    _check(m, batch, None, val_batch=vbatch)


def test_magnet_gnn_noise_rng(f1d48):
    """Training noise (reference magnet_gnn.py:401-426) is PRNG-driven:
    same key reproduces the loss, different keys differ."""
    ds = DatasetImplicitGNN1D(f1d48, "train", nt=48, nx=64, samples=8)
    batch = next(iter(DataLoader(ds, 2, prefetch=0)))
    m = create_model(
        "magnet_gnn",
        dict(time_slice=16, latent_dim=8, num_message_passing_steps=1,
             mlp_layers=1, mlp_hidden=8, n_chan=8, radius=0.3,
             teacher_forcing=True, codec_neighbors=2, noise=0.1,
             interpolation="area", loss="l1"),
    )
    g = m.build_graph(batch)
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "sample_idx"}
    p = m.init(jax.random.PRNGKey(0), jb, g)
    l1a, _ = m.loss(p, jb, g, rng=jax.random.PRNGKey(7), train=True)
    l1b, _ = m.loss(p, jb, g, rng=jax.random.PRNGKey(7), train=True)
    l2, _ = m.loss(p, jb, g, rng=jax.random.PRNGKey(8), train=True)
    assert float(l1a) == float(l1b)
    assert float(l1a) != float(l2)


@pytest.mark.parametrize("interp", ["knn", "sph"])
def test_knn_decoder_other_interpolations(f1d48, interp):
    ds = DatasetImplicitGNN1D(f1d48, "train", nt=48, nx=64, samples=8)
    batch = next(iter(DataLoader(ds, 2, prefetch=0)))
    m = create_model(
        "magnet_gnn",
        dict(time_slice=16, latent_dim=8, num_message_passing_steps=1,
             mlp_layers=1, mlp_hidden=8, n_chan=8, radius=0.3,
             teacher_forcing=True, codec_neighbors=2, noise=0.0,
             interpolation=interp, loss="l1"),
    )
    g = m.build_graph(batch)
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "sample_idx"}
    p = m.init(jax.random.PRNGKey(0), jb, g)
    loss, _ = m.loss(p, jb, g, train=True)
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("interp", ["area", "knn", "sph"])
def test_knn_decoder_degenerate_distance_guard(interp):
    """ADVICE r3: a query coinciding with its nearest support node
    (eval_support='full': d2 == 0 exactly) must not NaN the blend — 'knn'
    forms 1/d2 = inf and inf/inf = NaN without the guard; duplicate mesh
    coordinates zero the 'area' denominator.  Output AND grads stay
    finite, and the degenerate query resolves to the nearest latent."""
    from magnet_tpu.nn.inr import KNNDecoder

    T, C, L, N, K = 2, 1, 6, 4, 2
    rng = np.random.default_rng(0)
    x_lr = jnp.asarray(rng.normal(size=(T, C, L)), jnp.float32)
    enc = jnp.asarray(rng.normal(size=(L, 8)), jnp.float32)
    lr_coords = jnp.linspace(-1, 1, L, dtype=jnp.float32)[:, None]
    # query 0 coincides with support node 2; query 1 sits between nodes;
    # query 2 hits a DUPLICATE pair (nodes 4 and 5 same coord -> den=0
    # for 'area'); query 3 is generic
    lr_coords = lr_coords.at[5].set(lr_coords[4])
    hr = jnp.stack([lr_coords[2], lr_coords[2] + 0.07,
                    lr_coords[4], lr_coords[0] + 0.11])
    nbr = jnp.asarray([[2, 3], [2, 3], [4, 5], [0, 1]], jnp.int32)
    dec = KNNDecoder(n_chan=C, codec_neighbors=K, interpolation=interp)
    params = dec.init(jax.random.PRNGKey(0), x_lr, enc, lr_coords, hr,
                      jnp.linspace(0, 1, T), nbr)

    def f(p):
        out = dec.apply(p, x_lr, enc, lr_coords, hr, jnp.linspace(0, 1, T),
                        nbr)
        return jnp.sum(out**2), out

    (val, out), grads = jax.value_and_grad(f, has_aux=True)(params)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(out)))
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree.leaves(grads))


def test_losses_l2_smooth_l1(f1d):
    """The reference's alternative criteria (fno_1d.py:83-88) work."""
    ds = Dataset1D(f1d, "train", nt=30, nx=64)
    batch = next(iter(DataLoader(ds, 2, prefetch=0)))
    for lname in ("l2", "smooth_l1"):
        m = create_model(
            "fno_1d",
            dict(modes=4, width=8, num_layers=1, time_history=10,
                 time_future=10, teacher_forcing=True, loss=lname),
        )
        p = m.init(jax.random.PRNGKey(0), {k: jnp.asarray(v) for k, v in batch.items()})
        loss, _ = m.loss(p, {k: jnp.asarray(v) for k, v in batch.items()}, None, train=True)
        assert np.isfinite(float(loss))
