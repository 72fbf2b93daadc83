#!/bin/bash
# Round-4 phase-2 TPU queue: the remaining reference 2D cells after
# r4_queue.sh (magnet_gnn b1 irregular/regular, mpnn_2d b1 64/256
# irregular, the cut seed-10 mpnn_2d rerun).
# usage: ./tpu.sh bash scripts/r4_queue2.sh
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  local name="$1" tmo="$2" seed="$3"; shift 3
  if ls runs/"$name"/*/checkpoints/best.msgpack >/dev/null 2>&1; then
    echo "=== $name: checkpoint exists, skipping train ==="
    return
  fi
  echo "=== queue2: $name seed=$seed (timeout ${tmo}s) $(date +%H:%M) ==="
  timeout "$tmo" python -u run.py seed="$seed" name="$name" "$@" \
    > "/tmp/r4_${name}.log" 2>&1
  local rc=$?
  grep -E "epoch|best" "/tmp/r4_${name}.log" | tail -2
  echo "=== queue2: $name done (rc=$rc) $(date +%H:%M) ==="
}

ev() {
  local name="$1"; shift
  local ck; ck=$(ls -t runs/"$name"/*/checkpoints/best.msgpack 2>/dev/null | head -1)
  if [[ -z "$ck" ]]; then echo "== eval $name: NO CHECKPOINT =="; return; fi
  echo "== eval $name ($ck) =="
  timeout 1800 python -u eval.py seed=42 ckpt_path="$ck" "$@" \
    > "/tmp/r4_eval_${name}.log" 2>&1
  grep -E "nrmse" "/tmp/r4_eval_${name}.log" | tail -1
}

B1T=data/B1/burgers_test_B1_64.h5
B1T32=data/B1/burgers_test_B1_32.h5

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

# seed-10 mpnn_2d B1-64 (cut at the phase-1 wall)
MPNN2D=(model=mpnn_2d datamodule=h5_datamodule_graph_2d
  datamodule.train_path=data/B1/burgers_train_B1_64.h5
  datamodule.val_path=$B1T datamodule.test_path=$B1T
  datamodule.nt_train=50 datamodule.res_train=64
  datamodule.nt_val=50 datamodule.res_val=64
  datamodule.nt_test=50 datamodule.res_test=64
  datamodule.batch_size=4 model.params.time_window=10)
run seed10_mpnn_2d_b1_64 5400 10 "${MPNN2D[@]}" trainer.max_epochs=250
ev seed10_mpnn_2d_b1_64 "${MPNN2D[@]}"

gnn_irr 64 uniform 32 7200
gnn_irr 64 concentrated 32 7200
gnn_irr 256 uniform 128 9000
gnn_irr 256 concentrated 128 9000
mpnn_irr 64 uniform 5400
mpnn_irr 64 concentrated 5400
mpnn_irr 256 uniform 7200
mpnn_irr 256 concentrated 7200

# magnet_gnn B1-64 REGULAR (magnet_gnn_2d_b1_64_regular.sh: batch 8,
# samples 256)
GNN_B1R_ARGS=(model=magnet_gnn datamodule=h5_datamodule_implicit_gnn_2d
  datamodule.train_path=data/B1/burgers_train_B1_64.h5
  datamodule.val_path=$B1T datamodule.test_path=$B1T
  datamodule.nt_train=50 datamodule.res_train=64
  datamodule.nt_val=50 datamodule.res_val=64
  datamodule.nt_test=50 datamodule.res_test=64
  datamodule.batch_size=8 datamodule.samples=256
  datamodule.train_regular=True
  model.params.time_slice=10 trainer.max_epochs=250)
run camp4_magnet_gnn_2d_b1_64reg 10800 42 "${GNN_B1R_ARGS[@]}"
ev camp4_magnet_gnn_2d_b1_64reg "${GNN_B1R_ARGS[@]}"

echo "=== r4 queue2 complete $(date) ==="
