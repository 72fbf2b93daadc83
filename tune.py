#!/usr/bin/env python
"""Hyperparameter sweep entry (reference tune.py + Optuna TPE sweeper,
configs/config.yaml:17-24).

Runs ``sweep.n_trials`` trials; each samples overrides from ``--space``
(key=low:high[:log|int] specs), trains, and reports val_mae_loss.  Sampling
is Tree-structured Parzen Estimator (TPE) — the same adaptive algorithm as
the reference's Optuna sweeper (`tune.py:57-58`, TPE with n_trials=15),
implemented here without an external dependency: after ``n_startup`` random
trials, each dimension fits "good" (top-γ quantile) and "bad" Parzen
mixtures over the observed values and proposes the candidate maximizing
l(x)/g(x) among draws from the good mixture (Bergstra et al. 2011).

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


class TPESampler:
    """Independent per-dimension TPE (Optuna's default mode).

    Internal space: log dims are sampled in ln-space, int dims as continuous
    then rounded.  Each Parzen mixture is a sum of truncated normals centered
    at the observations plus one wide prior component spanning the range.
    """

    def __init__(self, space, seed, n_startup=5, gamma=0.25, n_candidates=24):
        self.space = space
        self.rng = np.random.default_rng(seed)
        self.n_startup = n_startup
        self.gamma = gamma
        self.n_candidates = n_candidates
        self.obs_x: list[dict] = []   # internal-space params per trial
        self.obs_y: list[float] = []

    def _bounds(self, key):
        lo, hi, kind = self.space[key]
        if kind == "log":
            return np.log(lo), np.log(hi), kind
        return float(lo), float(hi), kind

    def _externalize(self, key, v):
        lo, hi, kind = self.space[key]
        if kind == "log":
            return float(np.clip(np.exp(v), lo, hi))
        if kind == "int":
            return int(np.clip(round(v), int(lo), int(hi)))
        return float(np.clip(v, lo, hi))

    def _random_point(self):
        return {
            k: self.rng.uniform(*self._bounds(k)[:2]) for k in self.space
        }

    @staticmethod
    def _mixture_logpdf(x, centers, sigmas, lo, hi):
        """log density at x of the equal-weight truncated-normal mixture."""
        from math import erf, sqrt

        def ncdf(z):
            return 0.5 * (1.0 + erf(z / sqrt(2.0)))

        comps = []
        for c, s in zip(centers, sigmas):
            z = (x - c) / s
            norm = ncdf((hi - c) / s) - ncdf((lo - c) / s)
            comps.append(-0.5 * z * z - np.log(s) - np.log(max(norm, 1e-12)))
        m = max(comps)
        return m + np.log(sum(np.exp(c - m) for c in comps)) - np.log(len(comps))

    def _parzen(self, key, values):
        """Centers + bandwidths for one dimension's observations, with a
        range-wide prior component (keeps exploration alive).  Bandwidths
        follow Bergstra et al. 2011: each center's sigma is the max distance
        to its sorted neighbors, clipped to [width/min(100,n), width]."""
        lo, hi, _ = self._bounds(key)
        width = hi - lo
        centers = sorted(values) + [(lo + hi) / 2.0]
        n = len(centers)
        lo_bw = width / min(100.0, max(n, 2.0))
        sigmas = []
        srt = centers[:-1]
        for i, c in enumerate(srt):
            left = srt[i - 1] if i > 0 else lo
            right = srt[i + 1] if i + 1 < len(srt) else hi
            sigmas.append(float(np.clip(max(c - left, right - c), lo_bw, width)))
        sigmas.append(width)  # prior component is wide
        return centers, sigmas, lo, hi

    def suggest(self):
        if len(self.obs_y) < self.n_startup:
            xi = self._random_point()
        else:
            order = np.argsort(self.obs_y)
            n_good = max(1, int(np.ceil(self.gamma * len(self.obs_y))))
            good = [self.obs_x[i] for i in order[:n_good]]
            bad = [self.obs_x[i] for i in order[n_good:]] or good
            xi = {}
            for k in self.space:
                gc, gs, lo, hi = self._parzen(k, [p[k] for p in good])
                bc, bs, _, _ = self._parzen(k, [p[k] for p in bad])
                # draw candidates from the good mixture, truncated to range
                best_x, best_score = None, -np.inf
                for _ in range(self.n_candidates):
                    i = self.rng.integers(len(gc))
                    x = float(
                        np.clip(self.rng.normal(gc[i], gs[i]), lo, hi)
                    )
                    score = self._mixture_logpdf(
                        x, gc, gs, lo, hi
                    ) - self._mixture_logpdf(x, bc, bs, lo, hi)
                    if score > best_score:
                        best_x, best_score = x, score
                xi[k] = best_x
        self._pending = xi
        return {k: self._externalize(k, v) for k, v in xi.items()}

    def observe(self, value):
        self.obs_x.append(self._pending)
        self.obs_y.append(float(value))


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

    sampler = TPESampler(space, seed=int(base_cfg.seed))
    results = []
    best = (float("inf"), None)
    for trial in range(n_trials):
        trial_overrides = sampler.suggest()
        ov = argv + [f"{k}={v}" for k, v in trial_overrides.items()] + [
            f"name={base_cfg.get('name', 'run')}_trial{trial}"
        ]
        trainer = run_mod.main(ov)
        val = trainer.ckpt.best
        sampler.observe(val)
        results.append({"trial": trial, "overrides": trial_overrides, metric: val})
        if val < best[0]:
            best = (val, trial_overrides)
        print(json.dumps(results[-1]))
    print(json.dumps({"best_value": best[0], "best_overrides": best[1]}))


if __name__ == "__main__":
    main()
