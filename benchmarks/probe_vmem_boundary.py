#!/usr/bin/env python
"""fold-e VMEM gate boundary probe (ADVICE r1 #3 / VERDICT r2 #9).

The fold-e lane keeps the projected node table (bf16) AND the f32 d_pxj
accumulator resident in VMEM, gated by ``n_pad*hdim*4 <= DPXJ_TABLE_BYTES``
(6 MiB default, magnet_tpu/ops/pallas_kernels.py) and
``n_pad*hdim*bpe <= _FUSED2_TABLE_BYTES`` (5 MiB, nn/graphnet.py).  The
gate arithmetic had never been exercised AT the boundary on the real
chip — this probe builds the largest shape that still passes both gates
(n_pad = 12288, hdim = 128, bf16: table 3 MiB + d_pxj exactly 6 MiB) and
runs a full fwd+bwd+Adam step, asserting (a) the fold-e kernel
(fused_edge_tail_agg2rf) is actually the lane taken and (b) the loss is
finite — i.e. the kernel compiles and runs within chip VMEM at the gate
edge, so the 6 MiB default is safe.

Run: ./tpu.sh python benchmarks/probe_vmem_boundary.py
Env: PROBE_N (default 12288), PROBE_H (128), PROBE_MP (2).
"""
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import linen as fnn


def main():
    n = int(os.environ.get("PROBE_N", 12288))
    hdim = int(os.environ.get("PROBE_H", 128))
    mp_steps = int(os.environ.get("PROBE_MP", 2))

    from magnet_tpu.models.common import batch_vmap, build_radius_graph_batch
    from magnet_tpu.nn.graphnet import GraphDecoder, GraphEncoder, GraphProcessor
    from magnet_tpu.ops import pallas_kernels as pk
    from magnet_tpu.train.optim import make_optimizer

    # 1D line mesh; radius chosen for ~8 neighbors (plus self-loop)
    coords = np.linspace(-1, 1, n, dtype=np.float32)[None, :, None]
    g = build_radius_graph_batch(coords, 4.5 / n, loop=True)
    n_pad = g.blk_recv_local.shape[-2] * 128
    dpxj = n_pad * hdim * 4
    table = n_pad * hdim * 2  # bf16
    print(f"N={n} n_pad={n_pad} hdim={hdim}: d_pxj {dpxj/2**20:.3f} MiB "
          f"(gate {pk.DPXJ_TABLE_BYTES/2**20:.0f} MiB), bf16 table "
          f"{table/2**20:.3f} MiB", flush=True)
    assert dpxj <= pk.DPXJ_TABLE_BYTES, "shape does not pass the gate"
    assert dpxj > pk.DPXJ_TABLE_BYTES - 128 * hdim * 4, (
        "not a boundary shape: one more 128-node tile must fail the gate")

    calls = {"2rf": 0}
    orig = pk.fused_edge_tail_agg2rf

    def spy(*a, **k):
        calls["2rf"] += 1
        return orig(*a, **k)

    pk.fused_edge_tail_agg2rf = spy

    class Net(fnn.Module):
        @fnn.compact
        def __call__(self, nf, ef, gg):
            enc = batch_vmap(GraphEncoder, in_axes=(0, 0), node_out=hdim,
                             edge_out=hdim, mlp_layers=2, mlp_hidden=hdim,
                             dtype=jnp.bfloat16, name="enc")
            proc = batch_vmap(GraphProcessor, in_axes=(0, 0, 0),
                              latent_dim=hdim, num_steps=mp_steps,
                              mlp_layers=2, mlp_hidden=hdim, remat=True,
                              dtype=jnp.bfloat16, name="proc")
            dec = batch_vmap(GraphDecoder, in_axes=(0,), node_out=4,
                             mlp_layers=2, mlp_hidden=hdim, dtype=jnp.bfloat16,
                             name="dec")
            x, e = enc(nf, ef)
            x, _ = proc(x, e, gg)
            return dec(x)

    rng = np.random.default_rng(0)
    E = g.senders.shape[1]
    net = Net()
    nf = jnp.asarray(rng.normal(size=(1, n, 7)).astype(np.float32))
    ef = jnp.asarray(rng.normal(size=(1, E, 6)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(1, n, 4)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), nf, ef, g)
    assert calls["2rf"] > 0, (
        "fold-e lane (fused_edge_tail_agg2rf) was NOT taken at the boundary "
        "shape — gate arithmetic diverged from _fused2_mode")
    tx = make_optimizer(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, nf, ef, g, tgt):
        def lfn(p):
            return jnp.mean(jnp.abs(net.apply(p, nf, ef, g) - tgt))

        loss, grads = jax.value_and_grad(lfn)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    t0 = time.time()
    params, opt, loss = step(params, opt, nf, ef, g, tgt)
    loss = float(jax.block_until_ready(loss))
    print(f"boundary train step compiled+ran in {time.time()-t0:.1f}s, "
          f"loss {loss:.4f} (fold-e calls: {calls['2rf']})", flush=True)
    assert np.isfinite(loss)
    print("PASS: fold-e gate boundary compiles and trains on this backend",
          flush=True)


if __name__ == "__main__":
    main()
