#!/usr/bin/env python
"""Qualitative prediction-vs-ground-truth plots (the reference ships these
as assets/predictions.JPG, reference README.md:8; this script reproduces
them from any trained checkpoint).

1D datasets: space-time heatmaps (prediction / ground truth / |error|)
for the first few test trajectories.  2D datasets: snapshot rows at
evenly-spaced rollout times.

Usage (any model family):
  ./dev.sh python scripts/plot_predictions.py model=mpnn \\
      datamodule=h5_datamodule_graph ckpt_path=runs/x/.../best.msgpack \\
      plot_path=assets/predictions.png
"""
from __future__ import annotations

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    plot_path = "assets/predictions.png"
    argv2 = []
    for a in argv:
        if a.startswith("plot_path="):
            plot_path = a.split("=", 1)[1]
        else:
            argv2.append(a)

    from magnet_tpu.config.core import load_config

    cfg = load_config(argv2)

    import os

    import jax
    import jax.numpy as jnp
    import matplotlib
    import numpy as np

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from magnet_tpu.data.datamodule import build_loaders
    from magnet_tpu.models.factory import create_model
    from magnet_tpu.train.checkpoint import load_checkpoint
    from magnet_tpu.utils import get_logger

    log = get_logger("magnet_tpu.plot")
    loaders = build_loaders(cfg.datamodule, seed=int(cfg.seed),
                            shuffle_eval=False)
    model = create_model(cfg.model.name, cfg.model.params)

    loader = loaders["test"]
    loader.set_epoch(0)
    batch = next(iter(loader))
    graph = model.build_graph(batch)
    jb = jax.tree.map(jnp.asarray, {k: v for k, v in batch.items()})
    params = model.init(jax.random.PRNGKey(int(cfg.seed)), jb, graph)
    ckpt = cfg.get("ckpt_path")
    if ckpt:
        state, _ = load_checkpoint(ckpt, {"params": params})
        params = state["params"] if "params" in state else state
        log.info(f"loaded checkpoint {ckpt}")
    else:
        log.warning("no ckpt_path — plotting a fresh init")

    pred = model.predict(params, jb, graph)
    pred = np.asarray(pred[0] if isinstance(pred, tuple) else pred)

    key = "hr_points" if "hr_points" in batch else "u"
    ts = getattr(model, "time_slice", getattr(model, "time_window",
                 getattr(model, "time_history", 0)))
    tgt = np.asarray(batch[key])
    if key == "u" and tgt.ndim == 3 and model.name.startswith("mpnn"):
        tgt = tgt.transpose(0, 2, 1)
    tgt = tgt[:, ts: ts + pred.shape[1]]          # (B, T_roll, N[, C])
    if pred.ndim == 4 and pred.shape[-1] == 1:
        pred, tgt = pred[..., 0], tgt[..., 0]

    n_traj = min(3, pred.shape[0])
    # 2D if the node count is a perfect square of a stored resolution
    res = None
    for k in ("res_test", "nx_test"):
        if k in cfg.datamodule:
            res = int(cfg.datamodule[k])
    n_nodes = pred.shape[2]
    is_2d = res is not None and res * res == n_nodes

    if is_2d:
        times = np.linspace(0, pred.shape[1] - 1, 4).astype(int)
        fig, axes = plt.subplots(n_traj * 2, len(times),
                                 figsize=(3 * len(times), 2.6 * n_traj * 2))
        axes = np.atleast_2d(axes)
        for b in range(n_traj):
            for j, t in enumerate(times):
                for row, (arr, nm) in enumerate(
                        [(pred, "pred"), (tgt, "truth")]):
                    ax = axes[2 * b + row, j]
                    im = ax.imshow(arr[b, t].reshape(res, res),
                                   cmap="RdBu_r")
                    ax.set_title(f"traj {b} {nm} t+{t}", fontsize=8)
                    ax.axis("off")
                    fig.colorbar(im, ax=ax, fraction=0.046)
    else:
        fig, axes = plt.subplots(n_traj, 3, figsize=(12, 3 * n_traj),
                                 squeeze=False)
        for b in range(n_traj):
            vmax = np.abs(tgt[b]).max()
            for j, (arr, nm) in enumerate(
                    [(pred[b], "prediction"), (tgt[b], "ground truth"),
                     (np.abs(pred[b] - tgt[b]), "|error|")]):
                ax = axes[b, j]
                im = ax.imshow(arr.T, aspect="auto", origin="lower",
                               cmap="RdBu_r" if j < 2 else "magma",
                               vmin=None if j == 2 else -vmax,
                               vmax=None if j == 2 else vmax)
                ax.set_title(f"traj {b}: {nm}", fontsize=9)
                ax.set_xlabel("rollout step")
                ax.set_ylabel("x (node)")
                fig.colorbar(im, ax=ax, fraction=0.046)
    fig.suptitle(f"{model.name} no-TF rollout vs ground truth", fontsize=11)
    fig.tight_layout()
    os.makedirs(os.path.dirname(plot_path) or ".", exist_ok=True)
    fig.savefig(plot_path, dpi=110)
    log.info(f"wrote {plot_path}")
    print(plot_path)


if __name__ == "__main__":
    main()
