"""Datamodule assembly: config -> (train/val/test) DataLoaders.

Mirrors the 8 reference LightningDataModules (datamodule/h5_datamodule.py,
h5_datamodule_2d.py).  Reference quirks preserved:
  * 1D val split reads HDF5 group 'valid' (h5_datamodule.py:51-56) while the
    2D datamodules instantiate their val dataset with mode='test'
    (h5_datamodule_2d.py:52-57,121-126,194-199,269-275);
  * every split is shuffled (h5_datamodule.py:66-72) — behavioral parity,
    configurable via ``shuffle_eval``.
"""
from __future__ import annotations

from typing import Any

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


def _res_key(cfg, split):
    # 1D modules use nx_*, 2D use res_*
    for prefix in ("nx", "res"):
        k = f"{prefix}_{split}"
        if k in cfg:
            return cfg[k]
    raise KeyError(f"no nx_{split}/res_{split} in datamodule config")


def build_datasets(cfg: dict[str, Any]):
    kind = cfg["kind"]
    mk = {}

    def splits(ctor, **extra_per_split):
        out = {}
        for split, mode in (
            ("train", "train"),
            ("val", "valid" if kind.endswith("1d") else "test"),
            ("test", "test"),
        ):
            extra = {k: v[split] for k, v in extra_per_split.items()}
            out[split] = ctor(
                cfg[f"{split}_path"],
                mode,
                nt=cfg[f"nt_{split}"],
                **extra,
            )
        return out

    if kind == "h5_1d":
        mk = splits(
            lambda p, m, nt, **kw: Dataset1D(p, m, nt=nt, **kw),
            nx={s: _res_key(cfg, s) for s in ("train", "val", "test")},
        )
    elif kind == "h5_graph_1d":
        mk = splits(
            lambda p, m, nt, **kw: DatasetGraph1D(
                p, m, nt=nt,
                in_timesteps=cfg.get("in_timesteps", 16),
                radius=cfg.get("radius", 2), **kw,
            ),
            nx={s: _res_key(cfg, s) for s in ("train", "val", "test")},
        )
    elif kind == "h5_implicit_1d":
        mk = splits(
            lambda p, m, nt, **kw: DatasetImplicit1D(
                p, m, nt=nt, sampling=cfg.get("sampling", "uniform"),
                samples=cfg.get("samples", 32),
                eval_support=cfg.get("eval_support", "lr"), **kw,
            ),
            nx={s: _res_key(cfg, s) for s in ("train", "val", "test")},
        )
    elif kind == "h5_implicit_gnn_1d":
        mk = splits(
            lambda p, m, nt, **kw: DatasetImplicitGNN1D(
                p, m, nt=nt, sampling=cfg.get("sampling", "uniform"),
                samples=cfg.get("samples", 32),
                eval_support=cfg.get("eval_support", "lr"), **kw,
            ),
            nx={s: _res_key(cfg, s) for s in ("train", "val", "test")},
        )
    elif kind == "h5_2d":
        mk = splits(
            lambda p, m, nt, **kw: Dataset2D(p, m, nt=nt, **kw),
            res={s: _res_key(cfg, s) for s in ("train", "val", "test")},
        )
    elif kind == "h5_graph_2d":
        mk = splits(
            lambda p, m, nt, res, regular: DatasetGraph2D(
                p, m, nt=nt, res=res, regular=regular
            ),
            res={s: _res_key(cfg, s) for s in ("train", "val", "test")},
            regular={s: cfg.get(f"{s}_regular", True) for s in ("train", "val", "test")},
        )
    elif kind == "h5_implicit_2d":
        mk = splits(
            lambda p, m, nt, **kw: DatasetImplicit2D(
                p, m, nt=nt, samples=cfg.get("samples", 32),
                eval_support=cfg.get("eval_support", "lr"), **kw
            ),
            res={s: _res_key(cfg, s) for s in ("train", "val", "test")},
        )
    elif kind == "h5_implicit_gnn_2d":
        mk = splits(
            lambda p, m, nt, res, regular: DatasetImplicitGNN2D(
                p, m, nt=nt, res=res, regular=regular,
                samples=cfg.get("samples", 32),
                eval_support=cfg.get("eval_support", "lr"),
                n_nodes=cfg.get("n_nodes_train"),
            ),
            res={s: _res_key(cfg, s) for s in ("train", "val", "test")},
            regular={s: cfg.get(f"{s}_regular", True) for s in ("train", "val", "test")},
        )
    else:
        raise ValueError(f"unknown datamodule kind {kind!r}")
    return mk


def build_loaders(cfg: dict[str, Any], seed: int = 0, shuffle_eval: bool = True):
    ds = build_datasets(cfg)
    bs = int(cfg.get("batch_size", 32))
    prefetch = 2 if cfg.get("num_workers", 0) else 0
    # eval splits keep the trailing partial batch (one extra jit shape)
    return {
        "train": DataLoader(ds["train"], bs, shuffle=True, seed=seed,
                            prefetch=prefetch),
        "val": DataLoader(ds["val"], min(bs, len(ds["val"])),
                          shuffle=shuffle_eval, seed=seed + 1,
                          prefetch=prefetch),
        "test": DataLoader(ds["test"], min(bs, len(ds["test"])),
                           shuffle=shuffle_eval, seed=seed + 2,
                           prefetch=prefetch),
    }
