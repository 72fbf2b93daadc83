#!/bin/bash
# Round-4 2D experiment matrix completion (VERDICT r3 item 3): the
# reference 2D cells absent from BASELINE.md, plus seed replication.
# Sequential (single TPU process).  usage: ./tpu.sh bash scripts/r4_campaign.sh
# Protocols mirror the reference scripts 1:1:
#   fno_2d:      scripts/fno_2d/fno_2d_b{1,2}_64_regular.sh
#   magnet_gnn:  scripts/magnet_gnn/magnet_gnn_2d_*.sh
#   mpnn_2d:     scripts/mpnn_2d/mpnn_2d_b1_*_irregular*.sh
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  local name="$1" tmo="$2" seed="$3"; shift 3
  if ls runs/"$name"/*/checkpoints/best.msgpack >/dev/null 2>&1; then
    echo "=== $name: checkpoint exists, skipping train ==="
    return
  fi
  echo "=== campaign: $name seed=$seed (timeout ${tmo}s) $(date +%H:%M) ==="
  timeout "$tmo" python -u run.py seed="$seed" name="$name" "$@" \
    > "/tmp/r4_${name}.log" 2>&1
  local rc=$?
  grep -E "epoch|best" "/tmp/r4_${name}.log" | tail -3
  echo "=== campaign: $name done (rc=$rc) $(date +%H:%M) ==="
}

ev() {
  local name="$1"; shift
  local ck; ck=$(ls -t runs/"$name"/*/checkpoints/best.msgpack 2>/dev/null | head -1)
  if [[ -z "$ck" ]]; then echo "== eval $name: NO CHECKPOINT =="; return; fi
  echo "== eval $name ($ck) =="
  timeout 3600 python -u eval.py seed=42 ckpt_path="$ck" "$@" \
    > "/tmp/r4_eval_${name}.log" 2>&1
  grep -E "nrmse|mae|\{" "/tmp/r4_eval_${name}.log" | tail -3
}

B1T=data/B1/burgers_test_B1_64.h5
B1T32=data/B1/burgers_test_B1_32.h5
B2T=data/B2/burgers_test_B2_64.h5

# ---- 1) fno_2d B1/B2 64 regular (reference fno_2d/*.sh: th=tf=10,
#         modes 12x12, TF=False, batch 32, 250 ep) --------------------------
FNO_ARGS=(model=fno_2d datamodule=h5_datamodule_2d
  datamodule.nt_train=50 datamodule.res_train=64
  datamodule.nt_val=50 datamodule.res_val=64
  datamodule.nt_test=50 datamodule.res_test=64
  model.params.time_history=10 model.params.time_future=10
  model.params.teacher_forcing=False
  model.params.modes_1=12 model.params.modes_2=12 trainer.max_epochs=250)

run camp4_fno_2d_b1_64 7200 42 "${FNO_ARGS[@]}" \
  datamodule.train_path=data/B1/burgers_train_B1_64.h5 \
  datamodule.val_path=$B1T datamodule.test_path=$B1T
ev camp4_fno_2d_b1_64 "${FNO_ARGS[@]}" \
  datamodule.train_path=data/B1/burgers_train_B1_64.h5 \
  datamodule.val_path=$B1T datamodule.test_path=$B1T

run camp4_fno_2d_b2_64 7200 42 "${FNO_ARGS[@]}" \
  datamodule.train_path=data/B2/burgers_train_B2_64.h5 \
  datamodule.val_path=$B2T datamodule.test_path=$B2T
ev camp4_fno_2d_b2_64 "${FNO_ARGS[@]}" \
  datamodule.train_path=data/B2/burgers_train_B2_64.h5 \
  datamodule.val_path=$B2T datamodule.test_path=$B2T

# ---- 2) magnet_gnn_2d B2-64 regular (magnet_gnn_2d_b2_64_regular.sh:
#         batch 8, samples 256, ts=10, 250 ep) ------------------------------
GNN_B2_ARGS=(model=magnet_gnn datamodule=h5_datamodule_implicit_gnn_2d
  datamodule.train_path=data/B2/burgers_train_B2_64.h5
  datamodule.val_path=$B2T datamodule.test_path=$B2T
  datamodule.nt_train=50 datamodule.res_train=64
  datamodule.nt_val=50 datamodule.res_val=64
  datamodule.nt_test=50 datamodule.res_test=64
  datamodule.batch_size=8 datamodule.samples=256
  datamodule.train_regular=True
  model.params.time_slice=10 trainer.max_epochs=250)
run camp4_magnet_gnn_2d_b2_64 18000 42 "${GNN_B2_ARGS[@]}"
ev camp4_magnet_gnn_2d_b2_64 "${GNN_B2_ARGS[@]}"

# ---- 3) mpnn_2d B1 irregular cells (mpnn_2d_b1_*_irregular*.sh: batch 32,
#         tw=10, neighbors=4, TF=False, val/test = regular 32^2, 250 ep) ----
mpnn_irr() {
  local nodes="$1" kind="$2" tmo="$3"
  local tag="camp4_mpnn_2d_b1_${nodes}_${kind}"
  local ARGS=(model=mpnn_2d datamodule=h5_datamodule_graph_2d
    datamodule.train_path="data/B1/${kind}/burgers_train_irregular_B1_${nodes}.h5"
    datamodule.val_path=$B1T32 datamodule.test_path=$B1T32
    datamodule.nt_train=50 datamodule.res_train="$nodes"
    datamodule.nt_val=50 datamodule.res_val=32
    datamodule.nt_test=50 datamodule.res_test=32
    datamodule.batch_size=32 datamodule.train_regular=False
    model.params.time_window=10 model.params.neighbors=4
    model.params.teacher_forcing=False trainer.max_epochs=250)
  run "$tag" "$tmo" 42 "${ARGS[@]}"
  ev "$tag" "${ARGS[@]}"
}
mpnn_irr 128 uniform 10800
mpnn_irr 128 concentrated 10800
mpnn_irr 64 uniform 7200
mpnn_irr 64 concentrated 7200
mpnn_irr 256 uniform 14400
mpnn_irr 256 concentrated 14400

# ---- 4) magnet_gnn B1 irregular cells (magnet_gnn_2d_b1_*_irregular*.sh:
#         batch 32, samples={64:32,128:64,256:128}, ts=10, 250 ep) ----------
gnn_irr() {
  local nodes="$1" kind="$2" samples="$3" tmo="$4"
  local tag="camp4_magnet_gnn_2d_b1_${nodes}_${kind}"
  local ARGS=(model=magnet_gnn datamodule=h5_datamodule_implicit_gnn_2d
    datamodule.train_path="data/B1/${kind}/burgers_train_irregular_B1_${nodes}.h5"
    datamodule.val_path=$B1T32 datamodule.test_path=$B1T32
    datamodule.nt_train=50 datamodule.res_train="$nodes"
    datamodule.nt_val=50 datamodule.res_val=32
    datamodule.nt_test=50 datamodule.res_test=32
    datamodule.batch_size=32 datamodule.samples="$samples"
    model.params.time_slice=10 trainer.max_epochs=250)
  run "$tag" "$tmo" 42 "${ARGS[@]}"
  ev "$tag" "${ARGS[@]}"
}
gnn_irr 64 uniform 32 10800
gnn_irr 64 concentrated 32 10800
gnn_irr 128 concentrated 64 10800
gnn_irr 256 uniform 128 14400
gnn_irr 256 concentrated 128 14400

# ---- 5) magnet_gnn B1-64 REGULAR (magnet_gnn_2d_b1_64_regular.sh:
#         batch 8, samples 256) ---------------------------------------------
GNN_B1R_ARGS=(model=magnet_gnn datamodule=h5_datamodule_implicit_gnn_2d
  datamodule.train_path=data/B1/burgers_train_B1_64.h5
  datamodule.val_path=$B1T datamodule.test_path=$B1T
  datamodule.nt_train=50 datamodule.res_train=64
  datamodule.nt_val=50 datamodule.res_val=64
  datamodule.nt_test=50 datamodule.res_test=64
  datamodule.batch_size=8 datamodule.samples=256
  datamodule.train_regular=True
  model.params.time_slice=10 trainer.max_epochs=250)
run camp4_magnet_gnn_2d_b1_64reg 18000 42 "${GNN_B1R_ARGS[@]}"
ev camp4_magnet_gnn_2d_b1_64reg "${GNN_B1R_ARGS[@]}"

echo "=== r4 campaign phase A complete $(date) ==="
