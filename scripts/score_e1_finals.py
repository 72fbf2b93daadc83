#!/usr/bin/env python
"""Zero-shot super-resolution scoring of the bisect FINAL weights
(VERDICT r3, item 1 closure).

scripts/bisect_reference.py trains the UNMODIFIED torch reference and our
stack side-by-side on E1 and saves both final weight sets.  This script
scores both through the identical no-TF rollout nRMSE pipeline (eval.py
semantics) at every zero-shot test resolution, in BOTH eval-support modes:

  * 'lr'   — reference eval behavior: the model gets a HALF-resolution
             support and must super-resolve to the full test mesh (what
             the BASELINE.md E1 MAgNet rows measured);
  * 'full' — support = query = the test mesh (plain forecasting, the
             apples-to-apples setting the MPNN/FNO rows solve).

Usage (CPU):
  ./dev.sh python scripts/score_e1_finals.py \
      --finals runs/bisect_magnet_cnn_e1.jsonl --out runs/e1_finals_scores.json
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import serialization  # noqa: E402

from magnet_tpu.data.datasets import DatasetImplicit1D  # noqa: E402
from magnet_tpu.data.loader import DataLoader  # noqa: E402
from magnet_tpu.models.common import nrmse  # noqa: E402
from magnet_tpu.models.factory import create_model  # noqa: E402
from magnet_tpu.train import import_torch as imp  # noqa: E402

from bisect_reference import CNN_HP  # noqa: E402


def score(model, params, path, res, eval_support, nt=250, batch=16):
    ds = DatasetImplicit1D(path, "test", nt=nt, nx=res,
                           eval_support=eval_support)
    ld = DataLoader(ds, min(batch, len(ds)), shuffle=False, seed=0, prefetch=0)
    vals, pers = [], []
    for b in ld:
        graph = model.build_graph(b)
        jb = jax.tree.map(jnp.asarray, dict(b))
        pred = model.predict(params, jb, graph)
        pred0 = pred[0] if isinstance(pred, tuple) else pred
        tgt = model.rollout_target(jb, int(pred0.shape[1]))
        vals.append(float(nrmse(pred0, tgt)))
        # persistence floor on the same target: u(t) := the LAST OBSERVED
        # frame hr_points[:, ts-1] (ADVICE r3 — matches
        # scripts/persistence_floor.py's u[:, ts-1]; tgt[:, :1] would be a
        # FUTURE frame and understate the floor)
        last = jb["hr_points"][:, model.time_slice - 1][:, None]
        pers.append(float(nrmse(jnp.broadcast_to(last, tgt.shape), tgt)))
    return float(np.mean(vals)), float(np.mean(pers))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--finals", default="runs/bisect_magnet_cnn_e1.jsonl")
    ap.add_argument("--data-root", default="data/1d/E1/regular")
    ap.add_argument("--resolutions", default="40,50,100,200")
    ap.add_argument("--out", default="runs/e1_finals_scores.json")
    args = ap.parse_args()

    hp = dict(CNN_HP)
    model = create_model("magnet_cnn", hp)

    sd = dict(np.load(args.finals + ".ref_final.npz"))
    p_ref = jax.tree.map(jnp.asarray, imp.import_state_dict("magnet_cnn", sd, hp))
    with open(args.finals + ".ours_final.msgpack", "rb") as f:
        p_ours = serialization.from_bytes(p_ref, f.read())

    out = {}
    for res in [int(r) for r in args.resolutions.split(",")]:
        path = f"{args.data_root}/CE_test_E1_{res}.h5"
        for mode in ("lr", "full"):
            for tag, p in (("ref", p_ref), ("ours", p_ours)):
                v, floor = score(model, p, path, res, mode)
                out[f"{tag}_{mode}_test{res}"] = round(v, 4)
                # floor is param-independent; keyed by mode (ADVICE r3 —
                # the old single key was overwritten per (mode, tag))
                out[f"persistence_{mode}_test{res}"] = round(floor, 4)
            print(res, mode, {k: v for k, v in out.items() if str(res) in k},
                  flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
