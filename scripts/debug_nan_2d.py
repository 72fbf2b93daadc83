#!/usr/bin/env python
"""Replay the magnet_cnn_2d B1-64 campaign from the epoch-27 checkpoint
with per-step diagnostics to locate the epoch-30 NaN: loss, grad global
norm, param global norm / max-abs per step, and on the first nonfinite
loss a forward-pass breakdown.

Run (CPU): ./dev.sh python scripts/debug_nan_2d.py
"""
import numpy as np

CKPT = "runs/camp_magnet_cnn_2d_full/recover/checkpoints/last.msgpack"
ARGV = [
    "seed=42",
    "model=magnet_cnn_2d", "datamodule=h5_datamodule_implicit_2d",
    "datamodule.train_path=data/B1/burgers_train_B1_64.h5",
    "datamodule.val_path=data/B1/burgers_test_B1_64.h5",
    "datamodule.test_path=data/B1/burgers_test_B1_64.h5",
    "datamodule.nt_train=50", "datamodule.res_train=64",
    "datamodule.nt_val=50", "datamodule.res_val=64",
    "datamodule.nt_test=50", "datamodule.res_test=64",
    "datamodule.batch_size=8", "datamodule.samples=256",
    "model.params.time_slice=10",
]


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from magnet_tpu.config.core import load_config
    from magnet_tpu.data.datamodule import build_loaders
    from magnet_tpu.models.factory import create_model
    from magnet_tpu.train.checkpoint import load_checkpoint
    from magnet_tpu.train.optim import make_optimizer

    cfg = load_config(list(ARGV))
    loaders = build_loaders(cfg.datamodule, seed=42)
    tr = loaders["train"]
    model = create_model(cfg.model.name, cfg.model.params)

    rng = jax.random.PRNGKey(42)
    tr.set_epoch(0)
    first = next(iter(tr))
    g0 = model.build_graph(first)
    rng, init_rng = jax.random.split(rng)
    params = model.init(init_rng, {k: jnp.asarray(v) for k, v in first.items()},
                        g0)
    tx = make_optimizer(float(cfg.model.params.lr),
                        float(cfg.model.params.get("weight_decay", 0.0)),
                        float(cfg.model.params.get("factor", 0.3)),
                        int(cfg.model.params.get("step_size", 50)),
                        len(tr))
    opt_state = tx.init(params)
    state, meta = load_checkpoint(CKPT, {"params": params,
                                         "opt_state": opt_state})
    params, opt_state = state["params"], state["opt_state"]
    print("resumed at epoch", meta.get("epoch"), flush=True)

    @jax.jit
    def step(params, opt_state, batch, graph):
        def lfn(p):
            return model.loss(p, batch, graph, train=True)

        (loss, metrics), grads = jax.value_and_grad(lfn, has_aux=True)(params)
        gn = optax.global_norm(grads)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        pn = optax.global_norm(new_params)
        pmax = jax.tree.reduce(
            jnp.maximum, jax.tree.map(lambda a: jnp.abs(a).max(), new_params))
        return new_params, opt_state2, loss, gn, pn, pmax

    start = int(meta.get("epoch", 27)) + 1
    for epoch in range(start, start + 6):
        tr.set_epoch(epoch)
        for i, batch in enumerate(tr):
            graph = model.build_graph(batch)
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            prev = params
            params, opt_state, loss, gn, pn, pmax = step(
                params, opt_state, jb, graph)
            print(f"epoch {epoch} step {i}: loss={float(loss):.6g} "
                  f"gnorm={float(gn):.6g} pnorm={float(pn):.6g} "
                  f"pmax={float(pmax):.6g}", flush=True)
            if not np.isfinite(float(loss)):
                print("FIRST NONFINITE LOSS — saving artifacts")
                from magnet_tpu.train.checkpoint import save_checkpoint

                save_checkpoint("runs/nan_debug/params.msgpack",
                                {"params": prev}, {"epoch": epoch})
                np.savez("runs/nan_debug/batch.npz",
                         **{k: np.asarray(v) for k, v in batch.items()})
                return


if __name__ == "__main__":
    main()
