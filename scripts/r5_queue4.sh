#!/bin/bash
# Round-5 final stretch: push the two replication cells toward the full
# reference 5-seed protocol (scripts/seeds.txt: 42 21 10 5 202223564).
# mpnn_2d B1-64 has 3 seeds, magnet_cnn E1@50 has 3 — add 5, 202223564.
# usage: ./tpu.sh bash scripts/r5_queue4.sh
set -uo pipefail
cd "$(dirname "$0")/.."
B1T=data/B1/burgers_test_B1_64.h5
REG=data/1d/E1/regular

run() {
  local name="$1" tmo="$2" seed="$3"; shift 3
  if [[ -f "runs/$name/.r5_done" ]]; then echo "=== $name: done, skip ==="; return; fi
  local last; last=$(ls -t runs/"$name"/*/checkpoints/last.msgpack 2>/dev/null | head -1)
  local extra=(); [[ -n "$last" ]] && extra=(ckpt_path="$last")
  echo "=== r5q4: $name seed=$seed (timeout ${tmo}s) $(date +%H:%M) ==="
  timeout "$tmo" python -u run.py seed="$seed" name="$name" "${extra[@]}" "$@" \
    >> "/tmp/r5_${name}.log" 2>&1
  echo "=== r5q4: $name done (rc=$?) $(date +%H:%M) ==="
}
ev() {
  local name="$1"; shift
  local ck; ck=$(ls -t runs/"$name"/*/checkpoints/best.msgpack 2>/dev/null | head -1)
  [[ -z "$ck" ]] && { echo "== eval $name: NO CKPT =="; return; }
  timeout 1800 python -u eval.py seed=42 ckpt_path="$ck" "$@" \
    > "/tmp/r5_eval_${name}.log" 2>&1
  local line; line=$(grep -E nrmse "/tmp/r5_eval_${name}.log" | tail -1)
  echo "== $name: $line"
  [[ -n "$line" ]] && touch "runs/$name/.r5_done"
}

MPNN2D=(model=mpnn_2d datamodule=h5_datamodule_graph_2d
  datamodule.train_path=data/B1/burgers_train_B1_64.h5
  datamodule.val_path=$B1T datamodule.test_path=$B1T
  datamodule.nt_train=50 datamodule.res_train=64
  datamodule.nt_val=50 datamodule.res_val=64
  datamodule.nt_test=50 datamodule.res_test=64
  datamodule.batch_size=4 model.params.time_window=10 trainer.max_epochs=250)
for seed in 5 202223564; do
  run "seed${seed}_mpnn_2d_b1_64" 5400 "$seed" "${MPNN2D[@]}"
  ev "seed${seed}_mpnn_2d_b1_64" "${MPNN2D[@]}"
done

E1_50=(datamodule.nt_train=250 datamodule.nt_val=250 datamodule.nt_test=250
  datamodule.nx_train=50 datamodule.nx_val=50 datamodule.nx_test=50
  datamodule.train_path=$REG/CE_train_E1_50.h5
  datamodule.val_path=$REG/CE_train_E1_50.h5
  datamodule.test_path=$REG/CE_test_E1_50.h5)
for seed in 5 202223564; do
  run "seed${seed}_e1_magnet_cnn_50" 5400 "$seed" model=magnet_cnn \
    datamodule=h5_datamodule_implicit "${E1_50[@]}" trainer.max_epochs=100
  ev "seed${seed}_e1_magnet_cnn_50" model=magnet_cnn \
    datamodule=h5_datamodule_implicit "${E1_50[@]}"
done
echo "=== r5 queue4 complete $(date) ==="
