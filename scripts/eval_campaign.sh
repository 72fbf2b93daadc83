#!/bin/bash
# Evaluate the convergence-campaign best checkpoints: no-TF rollout nRMSE on
# the test split, incl. the zero-shot super-resolution splits.
#   usage: ./tpu.sh bash scripts/eval_campaign.sh
set -uo pipefail
cd "$(dirname "$0")/.."

latest_ckpt() { ls -t runs/"$1"/*/checkpoints/best.msgpack 2>/dev/null | head -1; }

ev() {
  local name="$1"; shift
  local ck; ck=$(latest_ckpt "camp_$name")
  if [[ -z "$ck" ]]; then echo "== $name: no checkpoint =="; return; fi
  echo "== eval $name ($ck) =="
  timeout 3600 python -u eval.py seed=42 ckpt_path="$ck" "$@" 2>&1 \
    | grep -E "nrmse|mae|loss|\{" | tail -5
}

ev magnet_gnn_full_e3 \
  model=magnet_gnn datamodule=h5_datamodule_implicit_gnn \
  datamodule.test_path=data/CE_test_E3.h5 \
  datamodule.nt_test=250 datamodule.nx_test=50 datamodule.samples=16

ev magnet_gnn_2d_b1_128 \
  model=magnet_gnn datamodule=h5_datamodule_implicit_gnn_2d \
  datamodule.test_path=data/B1/burgers_test_B1_32.h5 \
  datamodule.nt_test=50 datamodule.res_test=32 \
  model.params.time_slice=10

ev mpnn_2d_b1_64 \
  model=mpnn_2d datamodule=h5_datamodule_graph_2d \
  datamodule.test_path=data/B1/burgers_test_B1_64.h5 \
  datamodule.nt_test=50 datamodule.res_test=64 \
  model.params.time_window=10

ev magnet_cnn_2d_b1_64 \
  model=magnet_cnn_2d datamodule=h5_datamodule_implicit_2d \
  datamodule.test_path=data/B1/burgers_test_B1_64.h5 \
  datamodule.nt_test=50 datamodule.res_test=64 \
  model.params.time_slice=10

ev no_interaction_ks \
  model=magnet_cnn_no_interaction datamodule=h5_datamodule_implicit \
  datamodule.test_path=data/KS_train.h5 \
  datamodule.nt_test=128 datamodule.nx_test=256
