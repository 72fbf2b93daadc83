#!/bin/bash
# Round-4 TPU queue: prioritized subset of r4_campaign.sh + r4_seeds.sh
# sized to the round's wall-clock (single TPU process, cold compile cache).
# Order: new 2D matrix cells the judge named first (fno_2d B1/B2,
# mpnn_2d_b1_128_irregular), then 2D + 1D seed replication, then the
# longer magnet_gnn cells.  usage: ./tpu.sh bash scripts/r4_queue.sh
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  local name="$1" tmo="$2" seed="$3"; shift 3
  if ls runs/"$name"/*/checkpoints/best.msgpack >/dev/null 2>&1; then
    echo "=== $name: checkpoint exists, skipping train ==="
    return
  fi
  echo "=== queue: $name seed=$seed (timeout ${tmo}s) $(date +%H:%M) ==="
  timeout "$tmo" python -u run.py seed="$seed" name="$name" "$@" \
    > "/tmp/r4_${name}.log" 2>&1
  local rc=$?
  grep -E "epoch|best" "/tmp/r4_${name}.log" | tail -3
  echo "=== queue: $name done (rc=$rc) $(date +%H:%M) ==="
}

ev() {
  local name="$1"; shift
  local ck; ck=$(ls -t runs/"$name"/*/checkpoints/best.msgpack 2>/dev/null | head -1)
  if [[ -z "$ck" ]]; then echo "== eval $name: NO CHECKPOINT =="; return; fi
  echo "== eval $name ($ck) =="
  timeout 1800 python -u eval.py seed=42 ckpt_path="$ck" "$@" \
    > "/tmp/r4_eval_${name}.log" 2>&1
  grep -E "nrmse|mae|\{" "/tmp/r4_eval_${name}.log" | tail -3
}

B1T=data/B1/burgers_test_B1_64.h5
B1T32=data/B1/burgers_test_B1_32.h5
B2T=data/B2/burgers_test_B2_64.h5
REG=data/1d/E1/regular

# ---- 1) fno_2d B1/B2 64 regular (reference fno_2d/*.sh) --------------------
FNO_ARGS=(model=fno_2d datamodule=h5_datamodule_2d
  datamodule.nt_train=50 datamodule.res_train=64
  datamodule.nt_val=50 datamodule.res_val=64
  datamodule.nt_test=50 datamodule.res_test=64
  model.params.time_history=10 model.params.time_future=10
  model.params.teacher_forcing=False
  model.params.modes_1=12 model.params.modes_2=12 trainer.max_epochs=250
  trainer.save_last_every=25 trainer.best_weights_only=True)
# ^ 189M-param model: params+Adam state = 2.27 GB; per-epoch 'last' pulls
#   through the relay dominated wall clock 30:1 (round-4 finding) — the
#   large-model checkpoint policy caps that cost.

run camp4_fno_2d_b1_64 5400 42 "${FNO_ARGS[@]}" \
  datamodule.train_path=data/B1/burgers_train_B1_64.h5 \
  datamodule.val_path=$B1T datamodule.test_path=$B1T
ev camp4_fno_2d_b1_64 "${FNO_ARGS[@]}" \
  datamodule.train_path=data/B1/burgers_train_B1_64.h5 \
  datamodule.val_path=$B1T datamodule.test_path=$B1T

run camp4_fno_2d_b2_64 5400 42 "${FNO_ARGS[@]}" \
  datamodule.train_path=data/B2/burgers_train_B2_64.h5 \
  datamodule.val_path=$B2T datamodule.test_path=$B2T
ev camp4_fno_2d_b2_64 "${FNO_ARGS[@]}" \
  datamodule.train_path=data/B2/burgers_train_B2_64.h5 \
  datamodule.val_path=$B2T datamodule.test_path=$B2T

# ---- 2) mpnn_2d B1-128 irregular (the judge-named cell) --------------------
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
mpnn_irr 128 uniform 7200
mpnn_irr 128 concentrated 7200

# ---- 3) seed replication: 2D cell + E1 cells -------------------------------
MPNN2D=(model=mpnn_2d datamodule=h5_datamodule_graph_2d
  datamodule.train_path=data/B1/burgers_train_B1_64.h5
  datamodule.val_path=$B1T datamodule.test_path=$B1T
  datamodule.nt_train=50 datamodule.res_train=64
  datamodule.nt_val=50 datamodule.res_val=64
  datamodule.nt_test=50 datamodule.res_test=64
  datamodule.batch_size=4 model.params.time_window=10)
for seed in 21 10; do
  run "seed${seed}_mpnn_2d_b1_64" 5400 "$seed" "${MPNN2D[@]}" trainer.max_epochs=250
  ev "seed${seed}_mpnn_2d_b1_64" "${MPNN2D[@]}"
done

for seed in 21 10; do
  E1_50=(datamodule.nt_train=250 datamodule.nt_val=250 datamodule.nt_test=250
    datamodule.nx_train=50 datamodule.nx_val=50 datamodule.nx_test=50
    datamodule.train_path=$REG/CE_train_E1_50.h5
    datamodule.val_path=$REG/CE_train_E1_50.h5
    datamodule.test_path=$REG/CE_test_E1_50.h5)
  run "seed${seed}_e1_mpnn_50" 3600 "$seed" model=mpnn \
    datamodule=h5_datamodule_graph "${E1_50[@]}" trainer.max_epochs=100
  ev "seed${seed}_e1_mpnn_50" model=mpnn datamodule=h5_datamodule_graph "${E1_50[@]}"

  run "seed${seed}_e1_magnet_cnn_50" 5400 "$seed" model=magnet_cnn \
    datamodule=h5_datamodule_implicit "${E1_50[@]}" trainer.max_epochs=100
  ev "seed${seed}_e1_magnet_cnn_50" model=magnet_cnn \
    datamodule=h5_datamodule_implicit "${E1_50[@]}"
done

# ---- 4) magnet_gnn_2d B2-64 regular (new cell) -----------------------------
GNN_B2_ARGS=(model=magnet_gnn datamodule=h5_datamodule_implicit_gnn_2d
  datamodule.train_path=data/B2/burgers_train_B2_64.h5
  datamodule.val_path=$B2T datamodule.test_path=$B2T
  datamodule.nt_train=50 datamodule.res_train=64
  datamodule.nt_val=50 datamodule.res_val=64
  datamodule.nt_test=50 datamodule.res_test=64
  datamodule.batch_size=8 datamodule.samples=256
  datamodule.train_regular=True
  model.params.time_slice=10 trainer.max_epochs=250)
run camp4_magnet_gnn_2d_b2_64 10800 42 "${GNN_B2_ARGS[@]}"
ev camp4_magnet_gnn_2d_b2_64 "${GNN_B2_ARGS[@]}"

# ---- 5) extra magnet_gnn / mpnn_2d irregular cells as time allows ----------
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
gnn_irr 64 uniform 32 7200
gnn_irr 256 uniform 128 9000
mpnn_irr 64 uniform 5400
mpnn_irr 256 uniform 9000

echo "=== r4 queue complete $(date) ==="
