#!/usr/bin/env python
"""Stage-by-stage forward analysis of the NaN-producing magnet_cnn_2d
batch captured by debug_nan_2d.py (runs/nan_debug/{params.msgpack,
batch.npz}): per rollout window, check finiteness of every stage
(EDSR/INR graph_pre -> edge features -> encoder -> processor -> decoder
-> assembled outputs).

Run: ./dev.sh python scripts/debug_nan_stage.py  (or ./tpu.sh)
"""
import numpy as np

ARGV = [
    "seed=42",
    "model=magnet_cnn_2d", "datamodule=h5_datamodule_implicit_2d",
    "model.params.time_slice=10",
]


def finite(name, x):
    arrs = x if isinstance(x, (tuple, list)) else [x]
    for j, a in enumerate(arrs):
        a = np.asarray(a)
        n_bad = int(np.size(a) - np.isfinite(a).sum())
        tag = f"{name}[{j}]" if len(arrs) > 1 else name
        print(f"  {tag}: shape={a.shape} nonfinite={n_bad} "
              f"maxabs={np.abs(a[np.isfinite(a)]).max() if np.isfinite(a).any() else float('nan'):.4g}",
              flush=True)
    return all(np.isfinite(np.asarray(a)).all() for a in arrs)


def main():
    import jax.numpy as jnp

    from magnet_tpu.config.core import load_config
    from magnet_tpu.models.factory import create_model
    from magnet_tpu.models.magnet_cnn_2d import MAgNetCNN2DCore
    from magnet_tpu.train.checkpoint import load_checkpoint

    cfg = load_config(list(ARGV))
    model = create_model(cfg.model.name, cfg.model.params)
    raw = np.load("runs/nan_debug/batch.npz")
    batch = {k: jnp.asarray(raw[k]) for k in raw.files}
    state, _ = load_checkpoint("runs/nan_debug/params.msgpack")
    params = {"params": state["params"]["params"]} \
        if "params" in state["params"] else state["params"]

    graph = model.build_graph(batch)
    ts = model.time_slice
    u, uv, t = batch["lr_frames"], batch["hr_points"], batch["t"]
    B, nt = u.shape[:2]
    n_win = (nt - ts) // ts
    core = model.core

    for w in range(n_win):
        inp = u[:, w * ts:(w + 1) * ts]
        hr_last = uv[:, (w + 1) * ts - 1]
        tw = t[:, w * ts:(w + 2) * ts]
        print(f"window {w}:", flush=True)
        node_feats, hr_points, all_feats, all_coords = core.apply(
            params, inp, batch["coords"], batch["cells"], tw,
            method=MAgNetCNN2DCore.graph_pre)
        ok = finite("graph_pre(node_feats,hr_points,all_feats,all_coords)",
                    (node_feats, hr_points, all_feats, all_coords))
        ef = MAgNetCNN2DCore.edge_features(
            all_feats, all_coords, graph.senders, graph.receivers)
        ok &= finite("edge_feats", ef)
        nf, ef2 = core.apply(params, node_feats, ef,
                             method=MAgNetCNN2DCore.graph_encode)
        ok &= finite("encoded(nf,ef)", (nf, ef2))
        out = core.apply(params, inp, batch["coords"], batch["cells"], tw,
                         hr_last, graph)
        ok &= finite("full_window(hr,lr,pts)", out)
        if not ok:
            print("  ^^ first nonfinite window — stopping")
            break


if __name__ == "__main__":
    main()
