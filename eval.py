#!/usr/bin/env python
"""Evaluation harness: no-teacher-forcing rollout metrics (incl. nRMSE) on
the test split — the capability the reference leaves commented out
(reference run.py:54) and delegates to missing test_*.py scripts
(scripts/magnet_gnn_b1.sh:17).  Supports zero-shot super-resolution: point
the datamodule test split at an unseen resolution.

Usage:
  python eval.py model=magnet_gnn datamodule=h5_datamodule_implicit_gnn \\
      ckpt_path=runs/x/checkpoints/best.msgpack
"""
from __future__ import annotations

import json
import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    from magnet_tpu.config.core import load_config

    cfg = load_config(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from magnet_tpu.data.datamodule import build_loaders
    from magnet_tpu.models.common import nrmse
    from magnet_tpu.models.factory import create_model
    from magnet_tpu.train.checkpoint import load_checkpoint
    from magnet_tpu.utils import get_logger

    log = get_logger("magnet_tpu.eval")
    loaders = build_loaders(cfg.datamodule, seed=int(cfg.seed), shuffle_eval=False)
    model = create_model(cfg.model.name, cfg.model.params)

    loader = loaders["test"]
    loader.set_epoch(0)
    it = iter(loader)
    first = next(it)
    graph0 = model.build_graph(first)
    jb0 = jax.tree.map(jnp.asarray, {k: v for k, v in first.items()})
    params = model.init(jax.random.PRNGKey(int(cfg.seed)), jb0, graph0)
    ckpt = cfg.get("ckpt_path")
    if ckpt:
        state, _ = load_checkpoint(ckpt, {"params": params})
        params = state["params"] if "params" in state else state
        log.info(f"loaded checkpoint {ckpt}")
    else:
        log.warning("no ckpt_path given — evaluating a fresh init")

    @jax.jit
    def metrics_fn(p, batch, graph):
        loss, m = model.loss(p, batch, graph, train=False)
        return m

    agg, n = {}, 0
    nrmse_vals = []
    for batch in [first] + list(it):
        graph = model.build_graph(batch)
        jb = jax.tree.map(jnp.asarray, {k: v for k, v in batch.items()})
        m = jax.device_get(metrics_fn(params, jb, graph))
        for k, v in m.items():
            agg[k] = agg.get(k, 0.0) + float(v)
        # nRMSE on the primary rollout target; the model wrapper owns the
        # target contract (rollout_target), not name-keyed heuristics here
        pred = model.predict(params, jb, graph)
        pred0 = pred[0] if isinstance(pred, tuple) else pred
        tgt = model.rollout_target(jb, int(pred0.shape[1]))
        nrmse_vals.append(float(nrmse(pred0, tgt)))
        n += 1
    out = {f"test_{k}": v / max(n, 1) for k, v in agg.items()}
    out["test_nrmse"] = float(np.mean(nrmse_vals))
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
