#!/bin/bash
# E1 experiment matrix on the regenerated combined-equation datasets
# (reference README.md:34-50): train at one resolution, zero-shot test at
# {40, 50, 100, 200} — the paper-shaped results table (VERDICT item 4).
#   usage: ./tpu.sh bash scripts/e1_campaign.sh          (train + eval)
#          SKIP_TRAIN=1 ./tpu.sh bash scripts/e1_campaign.sh   (eval only)
set -uo pipefail
cd "$(dirname "$0")/.."

EPOCHS="${E1_EPOCHS:-100}"
OUT=runs/e1_results.md

run() {
  local name="$1" tmo="$2"; shift 2
  [[ "${SKIP_TRAIN:-0}" == "1" ]] && return
  echo "=== train: $name ==="
  timeout "$tmo" python -u run.py seed=42 name="e1_$name" "$@" \
    trainer.max_epochs="$EPOCHS" 2>&1 | grep -E "epoch [0-9]+ |best" | tail -3
}

latest_ckpt() { ls -t runs/"e1_$1"/*/checkpoints/best.msgpack 2>/dev/null | head -1; }

REG=data/1d/E1/regular
IRR=data/1d/E1/irregular

# ---- training ------------------------------------------------------------
COMMON_1D="datamodule.nt_train=250 datamodule.nt_val=250 datamodule.nt_test=250"

run mpnn_50 7200 model=mpnn datamodule=h5_datamodule_graph \
  datamodule.train_path=$REG/CE_train_E1_50.h5 \
  datamodule.val_path=$REG/CE_train_E1_50.h5 \
  datamodule.test_path=$REG/CE_test_E1_50.h5 \
  $COMMON_1D datamodule.nx_train=50 datamodule.nx_val=50 datamodule.nx_test=50

run fno_50 7200 model=fno_1d datamodule=h5_datamodule \
  datamodule.train_path=$REG/CE_train_E1_50.h5 \
  datamodule.val_path=$REG/CE_train_E1_50.h5 \
  datamodule.test_path=$REG/CE_test_E1_50.h5 \
  $COMMON_1D datamodule.nx_train=50 datamodule.nx_val=50 datamodule.nx_test=50

run magnet_cnn_50 10800 model=magnet_cnn datamodule=h5_datamodule_implicit \
  datamodule.train_path=$REG/CE_train_E1_50.h5 \
  datamodule.val_path=$REG/CE_train_E1_50.h5 \
  datamodule.test_path=$REG/CE_test_E1_50.h5 \
  $COMMON_1D datamodule.nx_train=50 datamodule.nx_val=50 datamodule.nx_test=50

for n in 30 50 70; do
  # HR queries are sampled from the odd-index complement (n//2 points)
  smp=$(( n / 2 - 1 ))
  run magnet_gnn_$n 10800 model=magnet_gnn datamodule=h5_datamodule_implicit_gnn \
    datamodule.train_path=$IRR/CE_train_E1_graph_$n.h5 \
    datamodule.val_path=$IRR/CE_train_E1_graph_$n.h5 \
    datamodule.test_path=$REG/CE_test_E1_50.h5 \
    $COMMON_1D datamodule.nx_train=$n datamodule.nx_val=$n datamodule.nx_test=50 \
    datamodule.samples=$smp
done

# ---- zero-shot evaluation at every test resolution -----------------------
echo "# E1 results (nRMSE, no-TF rollout; train@res -> test@res)" > "$OUT"
echo "" >> "$OUT"
echo "| model | train res | test@40 | test@50 | test@100 | test@200 |" >> "$OUT"
echo "|---|---|---|---|---|---|" >> "$OUT"

ev_row() {
  local name="$1" trainres="$2" model="$3" dm="$4"; shift 4
  local ck; ck=$(latest_ckpt "$name")
  if [[ -z "$ck" ]]; then echo "| $name | $trainres | - | - | - | - |" >> "$OUT"; return; fi
  local row="| $name | $trainres |"
  for res in 40 50 100 200; do
    local js
    js=$(timeout 3600 python -u eval.py seed=42 ckpt_path="$ck" \
      model="$model" datamodule="$dm" \
      datamodule.test_path=$REG/CE_test_E1_${res}.h5 \
      datamodule.nt_test=250 datamodule.nx_test=$res "$@" 2>/dev/null \
      | grep -o '{.*}' | tail -1)
    local v
    v=$(python - "$js" <<'PY'
import json, sys
try:
    print(f"{json.loads(sys.argv[1])['test_nrmse']:.4f}")
except Exception:
    print("err")
PY
)
    row="$row $v |"
  done
  echo "$row" >> "$OUT"
  echo "$row"
}

ev_row mpnn_50 50 mpnn h5_datamodule_graph
ev_row fno_50 50 fno_1d h5_datamodule
ev_row magnet_cnn_50 50 magnet_cnn h5_datamodule_implicit
for n in 30 50 70; do
  ev_row magnet_gnn_$n "$n (irr)" magnet_gnn h5_datamodule_implicit_gnn
done

echo "wrote $OUT"
cat "$OUT"
