#!/bin/bash
# Round-5 phase 2 TPU queue (VERDICT r4 items 4, 7, 8), value order:
#   1. fno_2d B1/B2 resumes to the full 250-epoch budget (item 7)
#   2. E1@50 mpnn seeds 5 + 202223564 -> one cell at the FULL reference
#      5-seed protocol (item 8; scripts/seeds.txt)
#   3. the b1-64 irregular family (magnet_gnn + mpnn_2d, uniform +
#      concentrated), gnn b1-64 regular -> 4-point gnn transfer trend
#   4. mpnn_2d b1-512 irregular (bucketed-padding stress, 2nd family)
#   5. gnn b1-256 concentrated
# run() resumes from the newest last.msgpack when a prior attempt exists
# (ADVICE r4 #5: never treat a timeout-cut run as complete), otherwise
# starts fresh; a DONE marker written after eval gates the skip.
# usage: ./tpu.sh bash scripts/r5_queue2.sh
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  local name="$1" tmo="$2" seed="$3"; shift 3
  if [[ -f "runs/$name/.r5_done" ]]; then
    echo "=== $name: done marker, skip ==="; return
  fi
  local last; last=$(ls -t runs/"$name"/*/checkpoints/last.msgpack 2>/dev/null | head -1)
  local extra=()
  [[ -n "$last" ]] && extra=(ckpt_path="$last") && echo "(resuming $name from $last)"
  echo "=== r5q2: $name seed=$seed (timeout ${tmo}s) $(date +%H:%M) ==="
  timeout "$tmo" python -u run.py seed="$seed" name="$name" "${extra[@]}" "$@" \
    >> "/tmp/r5_${name}.log" 2>&1
  local rc=$?
  grep -E "epoch|best" "/tmp/r5_${name}.log" | tail -2
  echo "=== r5q2: $name done (rc=$rc) $(date +%H:%M) ==="
}

ev() {
  local name="$1"; shift
  local ck; ck=$(ls -t runs/"$name"/*/checkpoints/best.msgpack 2>/dev/null | head -1)
  [[ -z "$ck" ]] && { echo "== eval $name: NO CHECKPOINT =="; return; }
  echo "== eval $name ($ck) =="
  timeout 2400 python -u eval.py seed=42 ckpt_path="$ck" "$@" \
    > "/tmp/r5_eval_${name}.log" 2>&1
  local line; line=$(grep -E "nrmse" "/tmp/r5_eval_${name}.log" | tail -1)
  echo "== $name: $line"
  [[ -n "$line" ]] && touch "runs/$name/.r5_done"
}

B1T=data/B1/burgers_test_B1_64.h5
B1T32=data/B1/burgers_test_B1_32.h5
B2T=data/B2/burgers_test_B2_64.h5
REG=data/1d/E1/regular

# ---- 0) seed-10 mpnn_2d B1-64: finish the 3rd seed of the 2D cell ----------
MPNN2D=(model=mpnn_2d datamodule=h5_datamodule_graph_2d
  datamodule.train_path=data/B1/burgers_train_B1_64.h5
  datamodule.val_path=$B1T datamodule.test_path=$B1T
  datamodule.nt_train=50 datamodule.res_train=64
  datamodule.nt_val=50 datamodule.res_val=64
  datamodule.nt_test=50 datamodule.res_test=64
  datamodule.batch_size=4 model.params.time_window=10)
run seed10_mpnn_2d_b1_64 7200 10 "${MPNN2D[@]}" trainer.max_epochs=250
ev seed10_mpnn_2d_b1_64 "${MPNN2D[@]}"

# ---- 1) fno_2d B1/B2 to the full 250-epoch budget --------------------------
FNO_ARGS=(model=fno_2d datamodule=h5_datamodule_2d
  datamodule.nt_train=50 datamodule.res_train=64
  datamodule.nt_val=50 datamodule.res_val=64
  datamodule.nt_test=50 datamodule.res_test=64
  model.params.time_history=10 model.params.time_future=10
  model.params.teacher_forcing=False
  model.params.modes_1=12 model.params.modes_2=12 trainer.max_epochs=250
  trainer.save_last_every=25 trainer.best_weights_only=True)
run camp4_fno_2d_b1_64 4500 42 "${FNO_ARGS[@]}" \
  datamodule.train_path=data/B1/burgers_train_B1_64.h5 \
  datamodule.val_path=$B1T datamodule.test_path=$B1T
ev camp4_fno_2d_b1_64 "${FNO_ARGS[@]}" \
  datamodule.train_path=data/B1/burgers_train_B1_64.h5 \
  datamodule.val_path=$B1T datamodule.test_path=$B1T
run camp4_fno_2d_b2_64 4500 42 "${FNO_ARGS[@]}" \
  datamodule.train_path=data/B2/burgers_train_B2_64.h5 \
  datamodule.val_path=$B2T datamodule.test_path=$B2T
ev camp4_fno_2d_b2_64 "${FNO_ARGS[@]}" \
  datamodule.train_path=data/B2/burgers_train_B2_64.h5 \
  datamodule.val_path=$B2T datamodule.test_path=$B2T

# ---- 2) E1@50 mpnn seeds 5 + 202223564 (full 5-seed protocol) --------------
E1_50=(datamodule.nt_train=250 datamodule.nt_val=250 datamodule.nt_test=250
  datamodule.nx_train=50 datamodule.nx_val=50 datamodule.nx_test=50
  datamodule.train_path=$REG/CE_train_E1_50.h5
  datamodule.val_path=$REG/CE_train_E1_50.h5
  datamodule.test_path=$REG/CE_test_E1_50.h5)
for seed in 5 202223564; do
  run "seed${seed}_e1_mpnn_50" 3600 "$seed" model=mpnn \
    datamodule=h5_datamodule_graph "${E1_50[@]}" trainer.max_epochs=100
  ev "seed${seed}_e1_mpnn_50" model=mpnn datamodule=h5_datamodule_graph "${E1_50[@]}"
done

# ---- 3) b1-64 irregular family + gnn regular -------------------------------
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

gnn_irr 64 uniform 32 3600
mpnn_irr 64 uniform 3600
gnn_irr 64 concentrated 32 3600
mpnn_irr 64 concentrated 3600

# gnn B1-64 REGULAR (reference magnet_gnn_2d_b1_64_regular.sh: batch 8,
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
run camp4_magnet_gnn_2d_b1_64reg 5400 42 "${GNN_B1R_ARGS[@]}"
ev camp4_magnet_gnn_2d_b1_64reg "${GNN_B1R_ARGS[@]}"

# ---- 4) mpnn_2d b1-512 irregular (padded-bucket stress) --------------------
mpnn_irr 512 uniform 5400

# ---- 5) gnn b1-256 concentrated --------------------------------------------
gnn_irr 256 concentrated 128 5400

# ---- 6) extras if the wall allows ------------------------------------------
mpnn_irr 256 uniform 5400
gnn_irr 256 uniform 128 5400
gnn_irr 512 uniform 256 7200

echo "=== r5 queue2 complete $(date) ==="
