#!/usr/bin/env python
"""Training entry point (reference run.py semantics, Hydra-style CLI).

Usage:
  python run.py model=magnet_gnn datamodule=h5_datamodule_implicit_gnn \\
      model.params.lr=1e-4 seed=21 trainer.max_epochs=250

Composes configs from magnet_tpu/config/defaults (override the tree with
--config-dir), builds datamodule + model + trainer, runs fit then reports
the best checkpoint.
"""
from __future__ import annotations

import os
import sys
import time


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    config_dir = None
    if "--config-dir" in argv:
        i = argv.index("--config-dir")
        config_dir = argv[i + 1]
        del argv[i : i + 2]

    from magnet_tpu.config.core import load_config, save_config

    cfg = load_config(argv, config_dir=config_dir)

    import jax

    from magnet_tpu.data.datamodule import build_loaders
    from magnet_tpu.models.factory import create_model
    from magnet_tpu.parallel.mesh import make_mesh
    from magnet_tpu.train.trainer import Trainer
    from magnet_tpu.utils import get_logger

    log = get_logger("magnet_tpu.run")
    name = cfg.get("name", "run")
    model_name = cfg.model.name
    data_name = cfg.datamodule.name
    log.info(f"training {model_name} on {data_name}")

    workdir = str(cfg.get("workdir", "runs/${name}")).replace("${name}", name)
    workdir = os.path.join(workdir, time.strftime("%Y-%m-%d_%H-%M-%S"))
    os.makedirs(workdir, exist_ok=True)
    save_config(cfg, os.path.join(workdir, "config.yaml"))

    precision = str(cfg.trainer.get("precision", "default"))
    if precision in ("float32", "highest"):
        jax.config.update("jax_default_matmul_precision", "highest")
    elif precision in ("tensorfloat32", "high"):
        jax.config.update("jax_default_matmul_precision", "high")

    loaders = build_loaders(cfg.datamodule, seed=int(cfg.seed))
    model = create_model(model_name, cfg.model.params)

    devices = int(cfg.trainer.get("devices", 1))
    graph_shards = int(cfg.trainer.get("graph_shards", 1))
    if graph_shards > 1 or devices not in (0, 1):
        mesh = make_mesh(dp=devices if devices > 0 else -1, graph=graph_shards)
    else:
        mesh = None

    trainer = Trainer(
        model,
        max_epochs=int(cfg.trainer.max_epochs),
        lr=float(cfg.model.params.lr),
        weight_decay=float(cfg.model.params.get("weight_decay", 0.0)),
        factor=float(cfg.model.params.get("factor", 0.3)),
        step_size=int(cfg.model.params.get("step_size", 50)),
        patience=int(cfg.callbacks.early_stopping.get("patience", 35)),
        workdir=workdir,
        seed=int(cfg.seed),
        mesh=mesh,
        graph_shards=graph_shards,
        graph_halo=cfg.trainer.get("graph_halo", False),
        log_every=int(cfg.trainer.get("log_every", 10)),
        check_val_every=int(cfg.trainer.get("check_val_every", 1)),
        steps_per_call=int(cfg.trainer.get("steps_per_call", 1)),
        skip_nonfinite=bool(cfg.trainer.get("skip_nonfinite", False)),
        grad_clip=float(cfg.trainer.get("grad_clip", 0.0)),
        save_last_every=int(cfg.trainer.get("save_last_every", 1)),
        best_weights_only=bool(cfg.trainer.get("best_weights_only", False)),
    )
    resume = cfg.get("ckpt_path") or None
    trainer.fit(loaders["train"], loaders["val"], resume=resume)
    log.info(f"best checkpoint at {trainer.ckpt.best_path} "
             f"(val_mae_loss={trainer.ckpt.best:.6f})")
    return trainer


if __name__ == "__main__":
    main()
