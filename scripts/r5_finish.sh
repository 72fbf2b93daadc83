#!/bin/bash
# Round-5 batch 1 (VERDICT r4 item 2): score everything that already
# trained, finish what's nearly done.
#   - eval seed21/seed10 magnet_cnn E1@50 (epoch 99/100, never scored)
#   - resume camp4_magnet_gnn_2d_b2_64 from last.msgpack (ep 232 -> 250), eval
#   - resume seed10_mpnn_2d_b1_64 (ep 38 -> 250), eval
# Unlike r4_queue's run() (which skipped any run with a best.msgpack —
# ADVICE r4 #5), resume() always continues from the newest last.msgpack.
# usage: ./tpu.sh bash scripts/r5_finish.sh
set -uo pipefail
cd "$(dirname "$0")/.."

resume() {
  local name="$1" tmo="$2" seed="$3"; shift 3
  local last; last=$(ls -t runs/"$name"/*/checkpoints/last.msgpack 2>/dev/null | head -1)
  [[ -z "$last" ]] && { echo "=== resume $name: NO last.msgpack ==="; return; }
  echo "=== r5 resume: $name from $last (timeout ${tmo}s) $(date +%H:%M) ==="
  timeout "$tmo" python -u run.py seed="$seed" name="$name" ckpt_path="$last" "$@" \
    >> "/tmp/r5_${name}.log" 2>&1
  local rc=$?
  grep -E "epoch|best" "/tmp/r5_${name}.log" | tail -2
  echo "=== r5 resume: $name done (rc=$rc) $(date +%H:%M) ==="
}

ev() {
  local name="$1"; shift
  local ck; ck=$(ls -t runs/"$name"/*/checkpoints/best.msgpack 2>/dev/null | head -1)
  [[ -z "$ck" ]] && { echo "== eval $name: NO CHECKPOINT =="; return; }
  echo "== eval $name ($ck) =="
  timeout 2400 python -u eval.py seed=42 ckpt_path="$ck" "$@" \
    > "/tmp/r5_eval_${name}.log" 2>&1
  grep -E "nrmse|\{" "/tmp/r5_eval_${name}.log" | tail -1
}

REG=data/1d/E1/regular
B1T=data/B1/burgers_test_B1_64.h5
B2T=data/B2/burgers_test_B2_64.h5

# ---- 1) score the finished E1@50 magnet_cnn seeds (r4_seeds.sh protocol) ---
E1_50=(datamodule.nt_train=250 datamodule.nt_val=250 datamodule.nt_test=250
  datamodule.nx_train=50 datamodule.nx_val=50 datamodule.nx_test=50
  datamodule.train_path=$REG/CE_train_E1_50.h5
  datamodule.val_path=$REG/CE_train_E1_50.h5
  datamodule.test_path=$REG/CE_test_E1_50.h5)
for seed in 21 10; do
  ev "seed${seed}_e1_magnet_cnn_50" model=magnet_cnn \
    datamodule=h5_datamodule_implicit "${E1_50[@]}"
done

# ---- 2) magnet_gnn B2-64: 18 epochs left, then eval ------------------------
GNN_B2_ARGS=(model=magnet_gnn datamodule=h5_datamodule_implicit_gnn_2d
  datamodule.train_path=data/B2/burgers_train_B2_64.h5
  datamodule.val_path=$B2T datamodule.test_path=$B2T
  datamodule.nt_train=50 datamodule.res_train=64
  datamodule.nt_val=50 datamodule.res_val=64
  datamodule.nt_test=50 datamodule.res_test=64
  datamodule.batch_size=8 datamodule.samples=256
  datamodule.train_regular=True
  model.params.time_slice=10 trainer.max_epochs=250)
resume camp4_magnet_gnn_2d_b2_64 3600 42 "${GNN_B2_ARGS[@]}"
ev camp4_magnet_gnn_2d_b2_64 "${GNN_B2_ARGS[@]}"

# ---- 3) seed-10 mpnn_2d B1-64: ep 38 -> 250, then eval ---------------------
MPNN2D=(model=mpnn_2d datamodule=h5_datamodule_graph_2d
  datamodule.train_path=data/B1/burgers_train_B1_64.h5
  datamodule.val_path=$B1T datamodule.test_path=$B1T
  datamodule.nt_train=50 datamodule.res_train=64
  datamodule.nt_val=50 datamodule.res_val=64
  datamodule.nt_test=50 datamodule.res_test=64
  datamodule.batch_size=4 model.params.time_window=10)
resume seed10_mpnn_2d_b1_64 7200 10 "${MPNN2D[@]}" trainer.max_epochs=250
ev seed10_mpnn_2d_b1_64 "${MPNN2D[@]}"

echo "=== r5 batch 1 complete $(date) ==="
