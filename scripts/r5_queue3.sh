#!/bin/bash
set -uo pipefail
cd /root/repo
B1T32=data/B1/burgers_test_B1_32.h5
run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== r5q3: $name (timeout ${tmo}s) $(date +%H:%M) ==="
  timeout "$tmo" python -u run.py seed=42 name="$name" "$@" >> "/tmp/r5_${name}.log" 2>&1
  echo "=== r5q3: $name done (rc=$?) $(date +%H:%M) ==="
}
ev() {
  local name="$1"; shift
  local ck; ck=$(ls -t runs/"$name"/*/checkpoints/best.msgpack 2>/dev/null | head -1)
  [[ -z "$ck" ]] && { echo "== eval $name: NO CKPT =="; return; }
  timeout 1800 python -u eval.py seed=42 ckpt_path="$ck" "$@" > "/tmp/r5_eval_${name}.log" 2>&1
  echo "== $name: $(grep -E nrmse /tmp/r5_eval_${name}.log | tail -1)"
}
GNN128C=(model=magnet_gnn datamodule=h5_datamodule_implicit_gnn_2d
  datamodule.train_path=data/B1/concentrated/burgers_train_irregular_B1_128.h5
  datamodule.val_path=$B1T32 datamodule.test_path=$B1T32
  datamodule.nt_train=50 datamodule.res_train=128
  datamodule.nt_val=50 datamodule.res_val=32
  datamodule.nt_test=50 datamodule.res_test=32
  datamodule.batch_size=32 datamodule.samples=64
  model.params.time_slice=10 trainer.max_epochs=250)
run camp4_magnet_gnn_2d_b1_128_concentrated 2400 "${GNN128C[@]}"
ev camp4_magnet_gnn_2d_b1_128_concentrated "${GNN128C[@]}"
MP256C=(model=mpnn_2d datamodule=h5_datamodule_graph_2d
  datamodule.train_path=data/B1/concentrated/burgers_train_irregular_B1_256.h5
  datamodule.val_path=$B1T32 datamodule.test_path=$B1T32
  datamodule.nt_train=50 datamodule.res_train=256
  datamodule.nt_val=50 datamodule.res_val=32
  datamodule.nt_test=50 datamodule.res_test=32
  datamodule.batch_size=32 datamodule.train_regular=False
  model.params.time_window=10 model.params.neighbors=4
  model.params.teacher_forcing=False trainer.max_epochs=250)
run camp4_mpnn_2d_b1_256_concentrated 2400 "${MP256C[@]}"
ev camp4_mpnn_2d_b1_256_concentrated "${MP256C[@]}"
MP512C=("${MP256C[@]}")
MP512C[1]=datamodule.train_path=data/B1/concentrated/burgers_train_irregular_B1_512.h5
run camp4_mpnn_2d_b1_512_concentrated 2400 model=mpnn_2d datamodule=h5_datamodule_graph_2d \
  datamodule.train_path=data/B1/concentrated/burgers_train_irregular_B1_512.h5 \
  datamodule.val_path=$B1T32 datamodule.test_path=$B1T32 \
  datamodule.nt_train=50 datamodule.res_train=512 \
  datamodule.nt_val=50 datamodule.res_val=32 \
  datamodule.nt_test=50 datamodule.res_test=32 \
  datamodule.batch_size=32 datamodule.train_regular=False \
  model.params.time_window=10 model.params.neighbors=4 \
  model.params.teacher_forcing=False trainer.max_epochs=250
ev camp4_mpnn_2d_b1_512_concentrated model=mpnn_2d datamodule=h5_datamodule_graph_2d \
  datamodule.train_path=data/B1/concentrated/burgers_train_irregular_B1_512.h5 \
  datamodule.val_path=$B1T32 datamodule.test_path=$B1T32 \
  datamodule.nt_train=50 datamodule.res_train=512 \
  datamodule.nt_val=50 datamodule.res_val=32 \
  datamodule.nt_test=50 datamodule.res_test=32 \
  datamodule.batch_size=32 datamodule.train_regular=False \
  model.params.time_window=10 model.params.neighbors=4 \
  model.params.teacher_forcing=False
echo "=== r5 queue3 complete $(date) ==="
