#!/usr/bin/env python
"""Side-by-side convergence bisect vs the ACTUAL torch reference
(VERDICT r2 item 1b): train the unmodified reference model (via
tests/ref_stubs) and our JAX stack on IDENTICAL batches from identical
init, and score BOTH final checkpoints through the same eval pipeline.

If the torch reference converges to the same val curve / test nRMSE as our
stack on this data, the framework faithfully reproduces the reference and
any MAgNet-vs-baseline ordering observed is a property of the data/budget,
not a defect in this rebuild.

Both sides consume OUR DataLoader's numpy batches (keys match the
reference datamodule exactly, dataset.py:126-200), so sampling randomness
is identical by construction.  The torch side runs Adam + StepLR per
configure_optimizers (reference magnet_cnn.py / fno_1d.py:144-152);
ours runs the Trainer's optax chain.

Usage (CPU):
  ./dev.sh python scripts/bisect_reference.py --model magnet_cnn \
      --data data/KS_train.h5 --val data/KS_valid.h5 --nt 128 --nx 256 \
      --epochs 40 --samples 32 --out runs/bisect_magnet_cnn.jsonl
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

import ref_stubs  # noqa: E402
from magnet_tpu.data.datasets import (  # noqa: E402
    Dataset1D,
    DatasetImplicit1D,
    DatasetImplicit2D,
)
from magnet_tpu.data.loader import DataLoader  # noqa: E402
from magnet_tpu.models.factory import create_model  # noqa: E402
from magnet_tpu.train import import_torch as imp  # noqa: E402
from magnet_tpu.train.optim import make_optimizer  # noqa: E402

CNN_HP = dict(  # reference configs/model/magnet_cnn.yaml
    time_slice=16, latent_dim=32, num_message_passing_steps=10,
    mlp_layers=4, mlp_hidden=64, radius=0.08, scales=1, n_chan=128,
    kernel_size=3, res_scale=1, res_layers=4, teacher_forcing=True,
    interpolation="area", loss="l1", lr=1e-3, weight_decay=1e-7,
    factor=0.3, step_size=40,
)
FNO_HP = dict(  # reference configs/model/fno_1d.yaml
    modes=12, width=256, num_layers=5, time_history=25, time_future=25,
    teacher_forcing=True, loss="l1", lr=1e-3, weight_decay=0.0,
    factor=0.3, step_size=50,
)
CNN2D_HP = dict(  # reference configs/model/magnet_cnn_2d.yaml + the B1
    # protocol override time_slice=10
    # (scripts/magnet_cnn_2d/magnet_cnn_2d_b1_64_regular.sh:34)
    time_slice=10, latent_dim=32, num_message_passing_steps=10,
    mlp_layers=4, mlp_hidden=64, radius=0.1, scales=1, n_chan=128,
    kernel_size=3, res_scale=1, res_layers=16, teacher_forcing=True,
    interpolation="area", loss="l1", lr=1e-3, weight_decay=1e-7,
    factor=0.3, step_size=40,
)


def build_ref(model_name, hp):
    from types import SimpleNamespace as NS

    if model_name == "magnet_cnn":
        m = ref_stubs.load("models.magnet_cnn")
        return m.MAgNetCNN(NS(**hp))
    if model_name == "magnet_cnn_2d":
        m = ref_stubs.load("models.magnet_cnn_2d")
        return m.MAgNetCNN_2d(NS(**hp))
    if model_name == "fno_1d":
        m = ref_stubs.load("models.fno_1d")
        return m.FNO1d(NS(**hp))
    raise ValueError(model_name)


def torch_batch(model_name, b):
    if model_name == "fno_1d":
        # reference FNO consumes (u (B, nt, L), dx, dt) tuples
        return (torch.as_tensor(b["u"]), torch.as_tensor(b["dx"]),
                torch.as_tensor(b["dt"]))
    return {k: torch.as_tensor(v) for k, v in b.items()}


TIME_KEYS = ("t", "lr_frames", "hr_frames", "hr_points", "u")


def clip_nt(b, ts):
    """Clip every time axis to a multiple of the window length.  The
    REFERENCE training_step requires nt % time_slice == 0 (its interp
    target is u_values[:, :-ts], magnet_cnn.py:428 — nt=250/ts=16 crashes
    with a broadcast error, i.e. the reference cannot train this config
    as shipped); our stack slices to (n_win+1)*ts internally, so clipping
    makes both sides train the identical horizon."""
    out = dict(b)
    for k in TIME_KEYS:
        if k in out:
            nt = out[k].shape[1]
            out[k] = out[k][:, : (nt // ts) * ts]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="magnet_cnn",
                    choices=["magnet_cnn", "fno_1d", "magnet_cnn_2d"])
    ap.add_argument("--data", default="data/KS_train.h5")
    ap.add_argument("--val", default="data/KS_valid.h5")
    ap.add_argument("--nt", type=int, default=128)
    ap.add_argument("--nx", type=int, default=256)
    ap.add_argument("--samples", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--val-every", type=int, default=1,
                    help="run the val epoch every K train epochs (the full-"
                    "grid 2D val is ~half the CPU cost of a train epoch)")
    ap.add_argument("--out", default="runs/bisect.jsonl")
    args = ap.parse_args()

    torch.manual_seed(args.seed)
    hp = {"magnet_cnn": dict(CNN_HP), "fno_1d": dict(FNO_HP),
          "magnet_cnn_2d": dict(CNN2D_HP)}[args.model]

    if args.model == "magnet_cnn":
        ds_tr = DatasetImplicit1D(args.data, "train", nt=args.nt, nx=args.nx,
                                  samples=args.samples)
        ds_va = DatasetImplicit1D(args.val, "valid", nt=args.nt, nx=args.nx,
                                  samples=args.samples)
    elif args.model == "magnet_cnn_2d":
        # reference B1 protocol: res=64, nt=50, samples=256; the 2D
        # datamodule quirk routes the val split to mode='test'
        # (reference h5_datamodule_2d.py:121-126)
        ds_tr = DatasetImplicit2D(args.data, "train", nt=args.nt,
                                  res=args.nx, samples=args.samples)
        ds_va = DatasetImplicit2D(args.val, "test", nt=args.nt, res=args.nx)
    else:
        ds_tr = Dataset1D(args.data, "train", nt=args.nt, nx=args.nx)
        ds_va = Dataset1D(args.val, "valid", nt=args.nt, nx=args.nx)
    ld_tr = DataLoader(ds_tr, args.batch, seed=args.seed, prefetch=0)
    # val sets can be smaller than the train batch (E1 'valid' group holds
    # 16 trajectories); drop_last would then yield ZERO val batches and
    # np.mean([]) = NaN on both sides of the comparison.
    ld_va = DataLoader(ds_va, min(args.batch, len(ds_va)), seed=args.seed,
                       shuffle=False, prefetch=0)

    ref = build_ref(args.model, hp)
    sd0 = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    opt = torch.optim.Adam(ref.parameters(), lr=hp["lr"],
                           weight_decay=hp["weight_decay"])
    sched = torch.optim.lr_scheduler.StepLR(
        opt, step_size=hp["step_size"], gamma=hp["factor"]
    )

    ours = create_model(args.model, hp)
    params = jax.tree.map(jnp.asarray, imp.import_state_dict(args.model, sd0, hp))
    steps_per_epoch = max(1, len(ds_tr) // args.batch)
    tx = make_optimizer(hp["lr"], hp["weight_decay"], hp["factor"],
                        hp["step_size"], steps_per_epoch)
    opt_state = tx.init(params)

    @jax.jit
    def j_step(p, s, jb, graph):
        (loss, _), grads = jax.value_and_grad(
            lambda q: ours.loss(q, jb, graph, train=True), has_aux=True
        )(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    @jax.jit
    def j_val(p, jb, graph):
        loss, m = ours.loss(p, jb, graph, train=False)
        return m["mae_loss"]

    ts = hp.get("time_slice") or hp.get("time_history")
    fout = open(args.out, "w")
    for epoch in range(args.epochs):
        ld_tr.set_epoch(epoch)
        t0 = time.time()
        r_losses, o_losses = [], []
        for b in ld_tr:
            b = clip_nt(b, ts)
            tb = torch_batch(args.model, b)
            opt.zero_grad()
            rl = ref.training_step(tb, 0)
            rl.backward()
            opt.step()
            r_losses.append(float(rl.detach()))

            jb = {k: jnp.asarray(v) for k, v in b.items()}
            graph = ours.build_graph(b)
            params, opt_state, ol = j_step(params, opt_state, jb, graph)
            o_losses.append(float(ol))
        sched.step()

        rec = {
            "epoch": epoch,
            "ref_train": float(np.mean(r_losses)),
            "our_train": float(np.mean(o_losses)),
        }
        if (epoch + 1) % args.val_every == 0 or epoch == args.epochs - 1:
            r_val, o_val = [], []
            with torch.no_grad():
                for b in ld_va:
                    b = clip_nt(b, ts)
                    tb = torch_batch(args.model, b)
                    ref.validation_step(tb, 0)
                    r_val.append(ref._logged["val_mae_loss"])
                    jb = {k: jnp.asarray(v) for k, v in b.items()}
                    o_val.append(float(j_val(params, jb,
                                             ours.build_graph(b))))
            rec["ref_val_mae"] = float(np.mean(r_val))
            rec["our_val_mae"] = float(np.mean(o_val))
        rec["time_s"] = round(time.time() - t0, 1)
        fout.write(json.dumps(rec) + "\n")
        fout.flush()
        print(rec)

    # score the torch-trained weights through OUR eval path: if the
    # reference's own training lands at the same place, the stack is clean
    sdF = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    np.savez(args.out + ".ref_final.npz", **sdF)  # keep for offline scoring
    pF = jax.tree.map(jnp.asarray, imp.import_state_dict(args.model, sdF, hp))
    final = {}
    for tag, p in (("ref_final", pF), ("ours_final", params)):
        vals = []
        for b in ld_va:
            b = clip_nt(b, ts)
            jb = {k: jnp.asarray(v) for k, v in b.items()}
            vals.append(float(j_val(p, jb, ours.build_graph(b))))
        final[tag + "_val_mae"] = float(np.mean(vals))
    from flax import serialization

    with open(args.out + ".ours_final.msgpack", "wb") as f:
        f.write(serialization.to_bytes(params))
    fout.write(json.dumps(final) + "\n")
    print(final)
    fout.close()


if __name__ == "__main__":
    main()
