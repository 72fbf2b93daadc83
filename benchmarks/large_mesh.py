#!/usr/bin/env python
"""Stretch-scale demo: the reference's largest mesh (256^2 = 65,536 nodes,
~1.4M-edge radius graph — its single-GPU cap, SURVEY.md §2.3) as a full
message-passing train step on ONE TPU chip.

Exercises the native C++ graph builder at scale and the blocked-Pallas
aggregation path, and reports edges/s.  Run: ./tpu.sh python
benchmarks/large_mesh.py  (BENCH_SIDE=128 for a quicker check).
"""
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import linen as fnn

from magnet_tpu.models.common import batch_vmap, build_radius_graph_batch
from magnet_tpu.nn.graphnet import GraphDecoder, GraphEncoder, GraphProcessor
from magnet_tpu.train.optim import make_optimizer
from magnet_tpu.utils import make_coord_np


def main():
    side = int(os.environ.get("BENCH_SIDE", 256))
    latent = int(os.environ.get("BENCH_LATENT", 32))
    mp_steps = int(os.environ.get("BENCH_MP", 4))
    dtype = {"f32": None, "bf16": jnp.bfloat16}[
        os.environ.get("BENCH_DTYPE", "f32")]
    B, T_IN = 1, 10

    coords = make_coord_np([side, side])[None]               # (1, N, 2)
    n = side * side
    # reference 2D radius 0.1 in [-1,1] coords (magnet_cnn_2d.yaml), capped
    # at 32 neighbors like torch_cluster
    t0 = time.time()
    radius = 0.1 if side >= 64 else 0.3
    # the 65k-node blocked packing takes minutes host-side; cache the
    # finished Graph across benchmark invocations (pure benchmark-speed aid
    # — training runs keep the in-process cache in models/common.py)
    # the blocked layout (snd2 chunk metadata) depends on the re-bucketing
    # env knob — key the cache on it so chunk experiments don't read a
    # layout built for a different chunk size
    c2 = os.environ.get("MAGNET_TPU_CHUNK2", "0")
    # key the cache on the PACKING CODE itself too (ADVICE r3): a stale
    # cached Graph must not survive changes to the blocked-packing logic
    # or the radius knob — hash the module that builds the layout
    import hashlib

    import magnet_tpu.models.common as _common_mod

    with open(_common_mod.__file__, "rb") as fsrc:
        pack_tok = hashlib.sha1(fsrc.read()).hexdigest()[:8]
    cache = f"/tmp/large_mesh_graph_{side}_c{c2}_r{radius}_{pack_tok}.npz"
    if os.path.exists(cache):
        print(f"loading cached graph layout {cache}", flush=True)
        from magnet_tpu.models.common import Graph

        z = np.load(cache, allow_pickle=True)
        g = Graph(**{k: (None if z[k].ndim == 0 and z[k].item() is None
                         else jnp.asarray(z[k]))
                     for k in z.files})
    else:
        g = build_radius_graph_batch(coords, radius, loop=True)
        np.savez(cache, **{f: (np.asarray(getattr(g, f))
                               if getattr(g, f) is not None
                               else np.array(None))
                           for f in g._fields})
    e_real = float(np.asarray(g.edge_mask).sum())
    print(f"N={n} nodes, E={e_real:.0f} edges, host build {time.time()-t0:.2f}s",
          flush=True)

    class Net(fnn.Module):
        @fnn.compact
        def __call__(self, nf, ef, gg):
            enc = batch_vmap(GraphEncoder, in_axes=(0, 0), node_out=latent,
                             edge_out=latent, mlp_layers=2, mlp_hidden=latent,
                             dtype=dtype, name="enc")
            proc = batch_vmap(GraphProcessor, in_axes=(0, 0, 0),
                              latent_dim=latent, num_steps=mp_steps,
                              mlp_layers=2, mlp_hidden=latent, remat=True,
                              dtype=dtype, name="proc")
            dec = batch_vmap(GraphDecoder, in_axes=(0,), node_out=T_IN,
                             mlp_layers=2, mlp_hidden=latent, dtype=dtype,
                             name="dec")
            x, e = enc(nf, ef)
            x, _ = proc(x, e, gg)
            return dec(x)

    rng = np.random.default_rng(0)
    E = g.senders.shape[1]
    net = Net()
    nf = jnp.asarray(rng.normal(size=(B, n, T_IN + 3)).astype(np.float32))
    ef = jnp.asarray(rng.normal(size=(B, E, T_IN + 2)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(B, n, T_IN)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), nf, ef, g)
    tx = make_optimizer(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, nf, ef, g, tgt):
        def lfn(p):
            return jnp.mean(jnp.abs(net.apply(p, nf, ef, g) - tgt))

        loss, grads = jax.value_and_grad(lfn)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    for _ in range(2):
        params, opt, loss = step(params, opt, nf, ef, g, tgt)
    jax.block_until_ready(loss)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt, loss = step(params, opt, nf, ef, g, tgt)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters
    from magnet_tpu.nn import graphnet

    value = e_real * mp_steps / dt
    print(f"train step {dt*1e3:.1f} ms -> {value/1e6:.1f} M "
          f"edges/s (loss {float(loss):.4f}) "
          f"lane={graphnet.LAST_FUSED_LANE}", flush=True)

    # regression tracking like the headline's bench_baseline.json
    # (VERDICT r3 weak #1): first measurement per (side, dtype) is pinned;
    # later runs report vs_baseline against it
    import json

    key = f"side{side}_{os.environ.get('BENCH_DTYPE', 'f32')}"
    base_path = os.path.join(os.path.dirname(__file__), "..",
                             "large_mesh_baseline.json")
    base = {}
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
    if key not in base:
        base[key] = round(value, 1)
        with open(base_path, "w") as f:
            json.dump(base, f, indent=1)
    print(json.dumps({"metric": f"large_mesh_{key}_edges_per_s",
                      "value": round(value, 1),
                      "vs_baseline": round(value / base[key], 4)}),
          flush=True)


if __name__ == "__main__":
    main()
