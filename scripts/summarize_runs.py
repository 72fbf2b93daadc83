#!/usr/bin/env python
"""Summarize training runs: best val_mae_loss per run directory.

usage: python scripts/summarize_runs.py [runs_root]
Scans <runs_root>/*/<ts>/metrics.jsonl (default runs/) and prints one line
per run: name, epochs completed, best val_mae_loss, final train_loss,
steady-state steps/s.
"""
import glob
import json
import os
import sys


def summarize(path):
    rows = []
    with open(path) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    if not rows:
        return None
    epochs = [r for r in rows if "epoch" in r]
    if not epochs:
        return None
    best = min((r.get("val_mae_loss", float("inf")) for r in epochs))
    last = epochs[-1]
    sps = [r["steps_per_s"] for r in epochs if r.get("steps_per_s")]
    sps_ss = sorted(sps)[len(sps) // 2] if sps else 0.0
    return dict(
        epochs=len(epochs),
        best_val_mae=best,
        final_train=last.get("train_loss"),
        steps_per_s=sps_ss,
    )


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "runs"
    print(f"{'run':45s} {'ep':>4s} {'best val_mae':>12s} "
          f"{'train':>9s} {'steps/s':>8s}")
    for mpath in sorted(glob.glob(os.path.join(root, "*", "*",
                                               "metrics.jsonl"))):
        name = os.path.relpath(os.path.dirname(mpath), root)
        s = summarize(mpath)
        if s is None:
            continue
        tr = f"{s['final_train']:.4f}" if s["final_train"] is not None else "-"
        print(f"{name:45s} {s['epochs']:4d} {s['best_val_mae']:12.5f} "
              f"{tr:>9s} {s['steps_per_s']:8.2f}")


if __name__ == "__main__":
    main()
