#!/usr/bin/env python
"""Score the 2D bisect FINAL weights (VERDICT r3 item 1, the 2D closure).

scripts/bisect_reference.py --model magnet_cnn_2d trains the UNMODIFIED
torch reference (via tests/ref_stubs) and our stack side-by-side on B1
batches and saves both final weight sets.  This scores both through the
identical no-TF rollout nRMSE pipeline (eval.py semantics) on the B1 test
split, in both eval-support modes ('lr' = the reference's half-resolution
super-resolution protocol; 'full' = support = query = the test mesh), plus
the persistence floor from the last observed frame.

The question it answers (VERDICT r3 missing #1): does the torch
reference's OWN 2D training land in the same nRMSE band as this rebuild —
i.e. is the flagship-vs-MPNN 2D ordering a property of the model/protocol
(as proven for 1D) or a rebuild defect?

Usage (CPU):
  ./dev.sh python scripts/score_b1_finals.py \
      --finals runs/bisect_magnet_cnn_2d_b132.jsonl \
      --out runs/b1_finals_scores.json
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import serialization  # noqa: E402

from magnet_tpu.data.datasets import DatasetImplicit2D  # noqa: E402
from magnet_tpu.data.loader import DataLoader  # noqa: E402
from magnet_tpu.models.common import nrmse  # noqa: E402
from magnet_tpu.models.factory import create_model  # noqa: E402
from magnet_tpu.train import import_torch as imp  # noqa: E402

from bisect_reference import CNN2D_HP  # noqa: E402


def score(model, params, path, res, eval_support, nt=50, batch=4):
    ds = DatasetImplicit2D(path, "test", nt=nt, res=res,
                          eval_support=eval_support)
    ld = DataLoader(ds, min(batch, len(ds)), shuffle=False, seed=0, prefetch=0)
    ts = model.time_slice
    vals, pers = [], []
    for b in ld:
        # clip the horizon to a whole number of windows, as the bisect's
        # training did (reference magnet_cnn_2d.py:428 requires
        # nt % time_slice == 0)
        for k in ("t", "lr_frames", "hr_frames", "hr_points", "u"):
            if k in b:
                nt_k = b[k].shape[1]
                b[k] = b[k][:, : (nt_k // ts) * ts]
        graph = model.build_graph(b)
        jb = jax.tree.map(jnp.asarray, dict(b))
        pred = model.predict(params, jb, graph)
        pred0 = pred[0] if isinstance(pred, tuple) else pred
        tgt = model.rollout_target(jb, int(pred0.shape[1]))
        vals.append(float(nrmse(pred0, tgt)))
        last = jb["hr_points"][:, ts - 1][:, None]
        pers.append(float(nrmse(jnp.broadcast_to(last, tgt.shape), tgt)))
    return float(np.mean(vals)), float(np.mean(pers))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--finals", default="runs/bisect_magnet_cnn_2d_b132.jsonl")
    ap.add_argument("--data", default="data/B1/burgers_test_B1_32.h5")
    ap.add_argument("--resolutions", default="32")
    ap.add_argument("--nt", type=int, default=50)
    ap.add_argument("--out", default="runs/b1_finals_scores.json")
    args = ap.parse_args()

    hp = dict(CNN2D_HP)
    model = create_model("magnet_cnn_2d", hp)

    sd = dict(np.load(args.finals + ".ref_final.npz"))
    p_ref = jax.tree.map(jnp.asarray,
                         imp.import_state_dict("magnet_cnn_2d", sd, hp))
    with open(args.finals + ".ours_final.msgpack", "rb") as f:
        p_ours = serialization.from_bytes(p_ref, f.read())

    out = {}
    for res in [int(r) for r in args.resolutions.split(",")]:
        for mode in ("lr", "full"):
            for tag, p in (("ref", p_ref), ("ours", p_ours)):
                v, floor = score(model, p, args.data, res, mode, nt=args.nt)
                out[f"{tag}_{mode}_test{res}"] = round(v, 4)
                out[f"persistence_{mode}_test{res}"] = round(floor, 4)
            print(res, mode,
                  {k: v for k, v in out.items() if str(res) in k}, flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
