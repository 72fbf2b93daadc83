#!/usr/bin/env python
"""Persistence-floor nRMSE for a dataset split: predict u(t) := u(t0_last)
(the last observed input frame held constant over the rollout horizon) —
the calibration row for the zero-shot tables (BASELINE.md).

Usage: python scripts/persistence_floor.py data/Heat_test.h5 --nt 256 \
           --key pde_256-256 --ts 16 25
"""
from __future__ import annotations

import argparse

import h5py
import numpy as np


def floor_nrmse(u: np.ndarray, ts: int) -> float:
    """u: (S, nt, nx).  Prediction = u[:, ts-1] broadcast over the same
    window-aligned horizon the models are scored on (eval.py slicing)."""
    nt = u.shape[1]
    n_win = (nt - ts) // ts
    used = (n_win + 1) * ts
    tgt = u[:, ts:used]
    pred = np.broadcast_to(u[:, ts - 1 : ts], tgt.shape)
    num = np.sqrt(np.mean((pred - tgt) ** 2))
    den = np.sqrt(np.mean(tgt**2))
    return float(num / (den + 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--mode", default="test")
    ap.add_argument("--key", default=None,
                    help="HDF5 dataset key (default: first pde_* in the group)")
    ap.add_argument("--ts", type=int, nargs="+", default=[16, 25],
                    help="window lengths to report (model time_slice values)")
    args = ap.parse_args()
    with h5py.File(args.path, "r") as f:
        g = f[args.mode]
        key = args.key or next(k for k in g.keys() if k.startswith("pde"))
        u = np.asarray(g[key])
    if u.ndim == 4:  # 2D datasets: (S, nt, W, W) -> flatten space
        u = u.reshape(u.shape[0], u.shape[1], -1)
    for ts in args.ts:
        print(f"{args.path}[{args.mode}/{key}] ts={ts}: "
              f"persistence nRMSE = {floor_nrmse(u, ts):.4f}")


if __name__ == "__main__":
    main()
