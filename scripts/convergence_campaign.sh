#!/bin/bash
# Full-budget convergence campaign (ROADMAP item 8): one seed per config,
# reference epoch budgets, sequential (single TPU process).  Results land in
# runs/<name>/<ts>/metrics.jsonl; summarize with scripts/summarize_runs.py.
#   usage: ./tpu.sh bash scripts/convergence_campaign.sh
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== campaign: $name (timeout ${tmo}s) ==="
  timeout "$tmo" python -u run.py seed=42 name="camp_$name" "$@" \
    2>&1 | grep -E "epoch|best|error|Error" | tail -4
  echo "=== campaign: $name done (rc=$?) ==="
}

# 1) magnet_gnn 1D FULL SIZE (latent 128, mp 5, mlp 4x128) on E3, 100 ep
run magnet_gnn_full_e3 10800 \
  model=magnet_gnn datamodule=h5_datamodule_implicit_gnn \
  datamodule.train_path=data/CE_train_E3.h5 \
  datamodule.val_path=data/CE_valid_E3.h5 \
  datamodule.test_path=data/CE_test_E3.h5 \
  datamodule.nt_train=250 datamodule.nx_train=50 \
  datamodule.nt_val=250 datamodule.nx_val=50 \
  datamodule.nt_test=250 datamodule.nx_test=50 \
  datamodule.samples=16 \
  trainer.max_epochs=100

# 2) magnet_gnn 2D irregular 128-node (flagship irregular use case), 250 ep
run magnet_gnn_2d_b1_128 14400 \
  model=magnet_gnn datamodule=h5_datamodule_implicit_gnn_2d \
  datamodule.train_path=data/B1/uniform/burgers_train_irregular_B1_128.h5 \
  datamodule.val_path=data/B1/burgers_test_B1_32.h5 \
  datamodule.test_path=data/B1/burgers_test_B1_32.h5 \
  datamodule.nt_train=50 datamodule.res_train=128 \
  datamodule.nt_val=50 datamodule.res_val=32 \
  datamodule.nt_test=50 datamodule.res_test=32 \
  datamodule.batch_size=32 datamodule.samples=64 \
  model.params.time_slice=10 trainer.max_epochs=250

# 3) mpnn_2d B1-64 regular, 250 ep (reference 2D budget)
run mpnn_2d_b1_64 14400 \
  model=mpnn_2d datamodule=h5_datamodule_graph_2d \
  datamodule.train_path=data/B1/burgers_train_B1_64.h5 \
  datamodule.val_path=data/B1/burgers_test_B1_64.h5 \
  datamodule.test_path=data/B1/burgers_test_B1_64.h5 \
  datamodule.nt_train=50 datamodule.res_train=64 \
  datamodule.nt_val=50 datamodule.res_val=64 \
  datamodule.nt_test=50 datamodule.res_test=64 \
  datamodule.batch_size=4 \
  model.params.time_window=10 trainer.max_epochs=250

# 4) magnet_cnn_2d B1-64 regular FULL config (res_layers 16), 250 ep
#    (2D conv first-compile can take 30-60 min; cache makes reruns fast)
run magnet_cnn_2d_b1_64 21600 \
  model=magnet_cnn_2d datamodule=h5_datamodule_implicit_2d \
  datamodule.train_path=data/B1/burgers_train_B1_64.h5 \
  datamodule.val_path=data/B1/burgers_test_B1_64.h5 \
  datamodule.test_path=data/B1/burgers_test_B1_64.h5 \
  datamodule.nt_train=50 datamodule.res_train=64 \
  datamodule.nt_val=50 datamodule.res_val=64 \
  datamodule.nt_test=50 datamodule.res_test=64 \
  datamodule.samples=256 \
  model.params.time_slice=10 model.params.teacher_forcing=true \
  trainer.max_epochs=250

# 5) no_interaction ablation full budget, 100 ep
run no_interaction_ks 10800 \
  model=magnet_cnn_no_interaction datamodule=h5_datamodule_implicit \
  datamodule.train_path=data/KS_train.h5 \
  datamodule.val_path=data/KS_valid.h5 \
  datamodule.test_path=data/KS_train.h5 \
  datamodule.nt_train=128 datamodule.nx_train=256 \
  datamodule.nt_val=128 datamodule.nx_val=256 \
  datamodule.nt_test=128 datamodule.nx_test=256 \
  trainer.max_epochs=100

echo "=== campaign complete ==="
