#!/bin/bash
# Seed replication (VERDICT r3 item 3): the reference's protocol is a
# 5-seed SLURM array (scripts/seeds.txt = 42 21 10 5 202223564;
# mpnn_2d_b1_128_irregular.sh:8-13).  Seed 42 already exists for every
# cell; this adds seeds 21 and 10 (>=3 total) on:
#   - E1@50 mpnn + magnet_cnn (100-epoch E1 protocol, e1_campaign.sh)
#   - the 2D cell mpnn_2d B1-64 regular (250-epoch reference budget)
# and scores each on the test split.  usage: ./tpu.sh bash scripts/r4_seeds.sh
set -uo pipefail
cd "$(dirname "$0")/.."

REG=data/1d/E1/regular
B1T=data/B1/burgers_test_B1_64.h5

run() {
  local name="$1" tmo="$2" seed="$3"; shift 3
  if ls runs/"$name"/*/checkpoints/best.msgpack >/dev/null 2>&1; then
    echo "=== $name: exists, skip ==="; return
  fi
  echo "=== seeds: $name (timeout ${tmo}s) $(date +%H:%M) ==="
  timeout "$tmo" python -u run.py seed="$seed" name="$name" "$@" \
    > "/tmp/r4_${name}.log" 2>&1
  grep -E "epoch|best" "/tmp/r4_${name}.log" | tail -2
}

ev() {
  local name="$1"; shift
  local ck; ck=$(ls -t runs/"$name"/*/checkpoints/best.msgpack 2>/dev/null | head -1)
  [[ -z "$ck" ]] && { echo "== eval $name: NO CKPT =="; return; }
  timeout 3600 python -u eval.py seed=42 ckpt_path="$ck" "$@" \
    > "/tmp/r4_eval_${name}.log" 2>&1
  echo "== $name: $(grep -Eo '"nrmse[^,}]*' "/tmp/r4_eval_${name}.log" | tail -1)"
}

for seed in 21 10; do
  E1_50="datamodule.nt_train=250 datamodule.nt_val=250 datamodule.nt_test=250
         datamodule.nx_train=50 datamodule.nx_val=50 datamodule.nx_test=50
         datamodule.train_path=$REG/CE_train_E1_50.h5
         datamodule.val_path=$REG/CE_train_E1_50.h5
         datamodule.test_path=$REG/CE_test_E1_50.h5"

  run "seed${seed}_e1_mpnn_50" 7200 "$seed" model=mpnn \
    datamodule=h5_datamodule_graph $E1_50 trainer.max_epochs=100
  ev "seed${seed}_e1_mpnn_50" model=mpnn datamodule=h5_datamodule_graph $E1_50

  run "seed${seed}_e1_magnet_cnn_50" 10800 "$seed" model=magnet_cnn \
    datamodule=h5_datamodule_implicit $E1_50 trainer.max_epochs=100
  ev "seed${seed}_e1_magnet_cnn_50" model=magnet_cnn \
    datamodule=h5_datamodule_implicit $E1_50

  MPNN2D="model=mpnn_2d datamodule=h5_datamodule_graph_2d
    datamodule.train_path=data/B1/burgers_train_B1_64.h5
    datamodule.val_path=$B1T datamodule.test_path=$B1T
    datamodule.nt_train=50 datamodule.res_train=64
    datamodule.nt_val=50 datamodule.res_val=64
    datamodule.nt_test=50 datamodule.res_test=64
    datamodule.batch_size=4 model.params.time_window=10"
  run "seed${seed}_mpnn_2d_b1_64" 14400 "$seed" $MPNN2D trainer.max_epochs=250
  ev "seed${seed}_mpnn_2d_b1_64" $MPNN2D
done

echo "=== r4 seeds complete $(date) ==="
