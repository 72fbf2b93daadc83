#!/bin/bash
# The reference's OWN 1D implicit protocol (VERDICT r2 item 1a): train on
# Kuramoto-Sivashinsky (nt=128, nx=256), validate on KS, zero-shot TRANSFER
# test on the heat equation at nt=256 — exactly
# configs/datamodule/h5_datamodule_implicit{,_gnn}.yaml + the reference
# model hparams, at the reference 2D budget (250 epochs, early-stop 35).
#   usage: ./tpu.sh bash scripts/ks_campaign.sh
#          SKIP_TRAIN=1 ./tpu.sh bash scripts/ks_campaign.sh   (eval only)
set -uo pipefail
cd "$(dirname "$0")/.."

EPOCHS="${KS_EPOCHS:-250}"
OUT=runs/ks_results.md
KS_PATHS="datamodule.train_path=data/KS_train.h5 datamodule.val_path=data/KS_valid.h5 datamodule.test_path=data/Heat_test.h5"
KS_DIMS="datamodule.nt_train=128 datamodule.nx_train=256 datamodule.nt_val=128 datamodule.nx_val=256 datamodule.nt_test=256 datamodule.nx_test=256"

run() {
  local name="$1" tmo="$2"; shift 2
  [[ "${SKIP_TRAIN:-0}" == "1" ]] && return
  echo "=== train: $name ==="
  timeout "$tmo" python -u run.py seed=42 name="ks_$name" "$@" \
    trainer.max_epochs="$EPOCHS" 2>&1 | grep -E "epoch [0-9]+ |best|early" | tail -3
}

latest_ckpt() { ls -t runs/"ks_$1"/*/checkpoints/best.msgpack 2>/dev/null | head -1; }

run mpnn 7200 model=mpnn datamodule=h5_datamodule_graph $KS_PATHS $KS_DIMS
run fno 7200 model=fno_1d datamodule=h5_datamodule $KS_PATHS $KS_DIMS
run magnet_cnn 10800 model=magnet_cnn datamodule=h5_datamodule_implicit
run magnet_gnn 10800 model=magnet_gnn datamodule=h5_datamodule_implicit_gnn

# ---- evaluation: KS test split (in-distribution) + Heat transfer --------
echo "# KS -> Heat results (nRMSE, no-TF rollout; reference 1D implicit protocol)" > "$OUT"
echo "" >> "$OUT"
echo "| model | KS test (nt=128) | Heat transfer (nt=256) |" >> "$OUT"
echo "|---|---|---|" >> "$OUT"

ev() {  # name model datamodule test_path nt_test extra...
  local name="$1" model="$2" dm="$3" tp="$4" ntt="$5"; shift 5
  local ck; ck=$(latest_ckpt "$name")
  [[ -z "$ck" ]] && { echo "-"; return; }
  timeout 3600 python -u eval.py seed=42 ckpt_path="$ck" model="$model" \
    datamodule="$dm" $KS_PATHS $KS_DIMS \
    datamodule.test_path="$tp" datamodule.nt_test="$ntt" "$@" 2>/dev/null \
    | grep -o '{.*}' | tail -1 \
    | python -c 'import json,sys
try: print("%.4f" % json.loads(sys.stdin.read())["test_nrmse"])
except Exception: print("err")'
}

row() {
  local name="$1" model="$2" dm="$3"; shift 3
  local ks heat
  ks=$(ev "$name" "$model" "$dm" data/KS_train.h5 128 "$@")
  heat=$(ev "$name" "$model" "$dm" data/Heat_test.h5 256 "$@")
  echo "| $name | $ks | $heat |" >> "$OUT"
  echo "| $name | $ks | $heat |"
}

row mpnn mpnn h5_datamodule_graph
row fno fno_1d h5_datamodule
row magnet_cnn magnet_cnn h5_datamodule_implicit
row magnet_gnn magnet_gnn h5_datamodule_implicit_gnn

echo "wrote $OUT"
cat "$OUT"
