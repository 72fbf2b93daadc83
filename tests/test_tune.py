"""TPE sweeper validation (reference Optuna TPE, configs/config.yaml:17-24).

The sampler must beat pure random search on a 2-parameter toy objective at
equal budget — this is the behavioral contract of an adaptive sweeper.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tune import TPESampler, parse_space  # noqa: E402


def _toy(params):
    # Branin-ish bowl in (lr, width): optimum at lr=1e-3, width=128
    lr, width = params["lr"], params["width"]
    return (np.log10(lr) + 3.0) ** 2 + ((width - 128) / 64.0) ** 2


SPACE = parse_space(["lr=1e-5:1e-1:log", "width=16:512:int"])


def _run(sampler_cls, seed, n_trials=40):
    s = sampler_cls(SPACE, seed=seed)
    best = np.inf
    for _ in range(n_trials):
        p = s.suggest()
        y = _toy(p)
        s.observe(y)
        best = min(best, y)
    return best


class _RandomSampler(TPESampler):
    def __init__(self, space, seed):
        super().__init__(space, seed, n_startup=10**9)  # never adapts


def test_tpe_types_and_bounds():
    s = TPESampler(SPACE, seed=0)
    for _ in range(12):
        p = s.suggest()
        assert 1e-5 <= p["lr"] <= 1e-1
        assert isinstance(p["width"], int) and 16 <= p["width"] <= 512
        s.observe(_toy(p))


def test_tpe_beats_random_on_toy():
    seeds = range(5)
    tpe = np.mean([_run(TPESampler, s) for s in seeds])
    rnd = np.mean([_run(_RandomSampler, s) for s in seeds])
    # adaptive sampling should localize the optimum noticeably better
    assert tpe < rnd, (tpe, rnd)
    assert tpe < 0.25, tpe  # near-optimal on a smooth 2-D bowl in 40 trials


def test_tpe_concentrates_near_optimum():
    s = TPESampler(SPACE, seed=1)
    for _ in range(30):
        p = s.suggest()
        s.observe(_toy(p))
    late = [s.suggest() for _ in range(8)]
    # after 30 observations most proposals should sit in the good basin
    frac = np.mean([abs(np.log10(p["lr"]) + 3.0) < 1.0 for p in late])
    assert frac >= 0.5, late
