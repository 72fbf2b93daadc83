#!/bin/bash
# Re-run the two queue2 evals that died on transient TPU
# FAILED_PRECONDITION relay errors (checkpoints trained fine).
# usage: ./tpu.sh bash scripts/r5_eval_retry.sh
set -uo pipefail
cd "$(dirname "$0")/.."
B1T32=data/B1/burgers_test_B1_32.h5

ev() {
  local name="$1"; shift
  local ck; ck=$(ls -t runs/"$name"/*/checkpoints/best.msgpack 2>/dev/null | head -1)
  [[ -z "$ck" ]] && { echo "== eval $name: NO CHECKPOINT =="; return; }
  echo "== eval $name ($ck) =="
  timeout 2400 python -u eval.py seed=42 ckpt_path="$ck" "$@" \
    > "/tmp/r5_eval_${name}_retry.log" 2>&1
  grep -E "nrmse" "/tmp/r5_eval_${name}_retry.log" | tail -1
}

ev camp4_magnet_gnn_2d_b1_64_uniform \
  model=magnet_gnn datamodule=h5_datamodule_implicit_gnn_2d \
  datamodule.train_path=data/B1/uniform/burgers_train_irregular_B1_64.h5 \
  datamodule.val_path=$B1T32 datamodule.test_path=$B1T32 \
  datamodule.nt_train=50 datamodule.res_train=64 \
  datamodule.nt_val=50 datamodule.res_val=32 \
  datamodule.nt_test=50 datamodule.res_test=32 \
  datamodule.batch_size=32 datamodule.samples=32 \
  model.params.time_slice=10

ev camp4_mpnn_2d_b1_256_uniform \
  model=mpnn_2d datamodule=h5_datamodule_graph_2d \
  datamodule.train_path=data/B1/uniform/burgers_train_irregular_B1_256.h5 \
  datamodule.val_path=$B1T32 datamodule.test_path=$B1T32 \
  datamodule.nt_train=50 datamodule.res_train=256 \
  datamodule.nt_val=50 datamodule.res_val=32 \
  datamodule.nt_test=50 datamodule.res_test=32 \
  datamodule.batch_size=32 datamodule.train_regular=False \
  model.params.time_window=10 model.params.neighbors=4 \
  model.params.teacher_forcing=False

echo "=== retries done $(date) ==="
