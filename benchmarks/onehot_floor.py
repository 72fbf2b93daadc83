#!/usr/bin/env python
"""Cycle-accounted MXU floor for the fused2rf one-hot kernels (VERDICT r3
item 4a): derive, from the ACTUAL packed bench graph, the minimum MXU time
of the one-hot formulation as issued, and compare with the measured kernel
times — i.e. turn "the practical ceiling for this shape is near" into an
accounted number instead of an ablation-based claim.

Method.  Every FLOP the fwd/bwd kernels execute is inside
``jax.lax.dot_general`` calls whose shapes are fully determined by the
blocked packing (ops/pallas_kernels.py:_fused2r_fwd_pallas /
_fused2r_bwd_pallas — read the kernels; each matmul is listed below).
Summing MACs over the live chunks of the real bench graph and dividing by
the chip's measured matmul peak (194 TFLOP/s bf16, benchmarks/roofline.py)
gives the time the kernels would take at 100% MXU utilization of the work
they actually issue.  measured/floor = utilization; 1 - floor/measured =
the total headroom left for THIS formulation at this shape.

Matmul inventory, per live (chunk x H) edge chunk, H = C = Ce = 128,
L1 = mlp_layers - 1 = 1 (all units of chunk*128*128 MACs):

forward (default lane: non-merged one-hot, fold-e, vmem table):
  K_live x sender gather  (chunk,128)@(128,H)     [machinery]
  1 x receiver gather     (chunk,tile_n)@(tile_n,H) [machinery]
  1 x fold-e projection   (chunk,Ce)@(Ce,H)       [useful]
  L1 x edge-MLP rest      (chunk,H)@(H,H)         [useful]
  1 x output layer        (chunk,H)@(H,C)         [useful]
  1 x masked aggregation  (tile_n,chunk)@(chunk,C) [machinery]

backward (default lane: merged one-hot recompute + in-kernel d_pxj):
  1 x merged recompute    (chunk, K*128+tile_n)@(K*128+tile_n, H)
                          = K+1 units               [machinery; full K]
  1 x fold-e recompute    + L1 + output recompute  = 3 units [useful]
  1 x d_out gather        (chunk,tile_n)@(tile_n,C) [machinery]
  1 x dwo                 (H,chunk)@(chunk,C)       [useful]
  1 x d_h                 (chunk,C)@(C,H)           [useful]
  2 x L1 grads (dwr, d_h)                           [useful]
  2 x fold grads (d_e0, dwe)                        [useful]
  1 x d_pxi aggregation   (tile_n,chunk)@(chunk,H)  [machinery]
  K x d_pxj transpose     (K*128,chunk)@(chunk,H)   [machinery; full K]

"useful" = the matmuls a hypothetical native gather/scatter machine would
still have to run (the MLP math itself); "machinery" = one-hot
gather/scatter matmuls that only exist because TPU table gathers must ride
the MXU (tpu.dynamic_gather does not lower usefully — probe in BASELINE).

Run (host-side, no TPU needed): ./dev.sh python benchmarks/onehot_floor.py
Measured per-mp-step times via --fwd-ms/--bwd-ms (defaults: the committed
micro_fused2r.py measurements at the bench shape, ledger #11/#12).
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=int(os.environ.get("BENCH_B", 4)))
    ap.add_argument("--N", type=int, default=int(os.environ.get("BENCH_N", 2048)))
    ap.add_argument("--H", type=int, default=int(os.environ.get("BENCH_LATENT", 128)))
    ap.add_argument("--L1", type=int, default=1)
    ap.add_argument("--fwd-ms", type=float, default=0.772,
                    help="measured fwd kernel ms per mp step (B graphs)")
    ap.add_argument("--bwd-ms", type=float, default=1.56,
                    help="measured bwd kernel ms per mp step (B graphs)")
    ap.add_argument("--peak-tflops", type=float, default=194.0,
                    help="measured bf16 matmul peak (benchmarks/roofline.py)")
    ap.add_argument("--step-ms", type=float, default=None,
                    help="optional measured full train-step ms (for the "
                    "headline projection; default derives from 51.9M e/s)")
    args = ap.parse_args()

    from magnet_tpu.models.common import build_radius_graph_batch
    from magnet_tpu.ops.graph import morton_order

    B, N, H, L1 = args.B, args.N, args.H, args.L1
    rng = np.random.default_rng(0)
    coords = rng.uniform(-1, 1, (B, N, 2)).astype(np.float32)
    coords = np.stack([c[morton_order(c)] for c in coords])
    r = float(np.sqrt(20 * 4 / (np.pi * N)))
    g = build_radius_graph_batch(coords, r, loop=True)

    tids = np.asarray(g.blk_snd2_tids)          # (B, T, nc, K)
    mask = np.asarray(g.edge_mask)
    Bt, T, nc, K = tids.shape
    e_tile = np.asarray(g.blk_recv_local).shape[-1]
    chunk = e_tile // nc
    tile_n = 128
    e_real = float(mask.sum()) / B

    live = tids[..., 0] >= 0                    # (B, T, nc) live chunks
    k_live = (tids >= 0).sum(-1)                # (B, T, nc)
    n_live = int(live.sum())                    # over all B
    sum_klive = int(k_live[live].sum())
    mean_klive = sum_klive / n_live

    unit = chunk * H * H                        # MACs per unit matmul
    # ---- forward ----
    fwd_mach_units = sum_klive + n_live * 2     # sender + recv + agg
    fwd_useful_units = n_live * (1 + L1 + 1)    # fold + rest + out
    fwd_macs = (fwd_mach_units + fwd_useful_units) * unit
    # ---- backward ----
    bwd_mach_units = n_live * (K + 1 + 1 + 1 + K)  # merged recompute (K+1),
    # d_out, d_pxi, d_pxj (K)
    bwd_useful_units = n_live * (3 + 1 + 1 + 2 * L1 + 2)  # recompute MLP,
    # dwo, d_h, L1 grads, fold grads
    bwd_macs = (bwd_mach_units + bwd_useful_units) * unit

    peak = args.peak_tflops * 1e12
    fwd_floor_ms = 2 * fwd_macs / peak * 1e3
    bwd_floor_ms = 2 * bwd_macs / peak * 1e3
    fwd_util = fwd_floor_ms / args.fwd_ms
    bwd_util = bwd_floor_ms / args.bwd_ms

    # ideal-gather ceiling: only the useful matmuls remain, at 100% MXU
    ideal_ms = 2 * (fwd_useful_units + bwd_useful_units) * unit / peak * 1e3

    # headline projection: what the train-step throughput becomes if the
    # kernels hit 100% of the formulation floor, all else unchanged
    mp = 10
    step_ms = args.step_ms or (B * e_real * mp / 51.9e6 * 1e3)
    kern_ms = (args.fwd_ms + args.bwd_ms) * mp
    floor_step_ms = step_ms - kern_ms + (fwd_floor_ms + bwd_floor_ms) * mp
    ideal_step_ms = step_ms - kern_ms + ideal_ms * mp

    out = {
        "shape": {"B": B, "N": N, "H": H, "chunk": chunk, "K_static": K,
                  "nc": nc, "tiles": T, "e_real_per_graph": e_real,
                  "live_chunks": n_live,
                  "padded_rows_live": n_live * chunk,
                  "pad_overhead": n_live * chunk / (B * e_real),
                  "mean_K_live": round(mean_klive, 3),
                  "K_live_hist": np.bincount(k_live[live].ravel(),
                                             minlength=K + 1).tolist()},
        "fwd": {"floor_ms": round(fwd_floor_ms, 4),
                "measured_ms": args.fwd_ms,
                "mxu_util_of_issued": round(fwd_util, 3),
                "machinery_frac_of_macs": round(
                    fwd_mach_units / (fwd_mach_units + fwd_useful_units), 3)},
        "bwd": {"floor_ms": round(bwd_floor_ms, 4),
                "measured_ms": args.bwd_ms,
                "mxu_util_of_issued": round(bwd_util, 3),
                "machinery_frac_of_macs": round(
                    bwd_mach_units / (bwd_mach_units + bwd_useful_units), 3)},
        "headline_projection": {
            "measured_step_ms": round(step_ms, 2),
            "at_formulation_floor_ms": round(floor_step_ms, 2),
            "at_formulation_floor_edges_per_s":
                round(B * e_real * mp / floor_step_ms * 1e3, 0),
            "ideal_gather_step_ms": round(ideal_step_ms, 2),
            "ideal_gather_edges_per_s":
                round(B * e_real * mp / ideal_step_ms * 1e3, 0),
        },
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
