#!/bin/bash
# Full-size magnet_cnn_2d on B1-64 to 250 epochs (VERDICT round-1 item 5:
# no reduced config, no timeout caveat).  Robust to the remote-compile
# helper's slow 2D first compiles and transient 500s: runs in segments,
# resuming from the newest last.msgpack until 250 epochs are reached.
#   usage: ./tpu.sh bash scripts/magnet_cnn_2d_full.sh
set -uo pipefail
cd "$(dirname "$0")/.."

NAME=camp_magnet_cnn_2d_full
TARGET="${EPOCHS_2D:-250}"
SEG_TIMEOUT="${SEG_TIMEOUT_2D:-14000}"

epochs_done() {
  local f
  f=$(ls -t runs/$NAME/*/metrics.jsonl 2>/dev/null | head -1)
  if [[ -z "$f" ]]; then echo 0; else
    python - "$f" <<'PY'
import json, sys
last = 0
for line in open(sys.argv[1]):
    try:
        last = max(last, json.loads(line).get("epoch", 0) + 1)
    except Exception:
        pass
print(last)
PY
  fi
}

total=0
for f in $(ls runs/$NAME/*/metrics.jsonl 2>/dev/null); do
  e=$(python - "$f" <<'PY'
import json, sys
last = 0
for line in open(sys.argv[1]):
    try:
        last = max(last, json.loads(line).get("epoch", 0) + 1)
    except Exception:
        pass
print(last)
PY
)
  total=$e  # resumed runs report the CUMULATIVE epoch index
done

for seg in $(seq 1 12); do
  ck=$(ls -t runs/$NAME/*/checkpoints/last.msgpack 2>/dev/null | head -1)
  done_ep=0
  for f in $(ls runs/$NAME/*/metrics.jsonl 2>/dev/null); do
    e=$(python - "$f" <<'PY'
import json, sys
last = 0
for line in open(sys.argv[1]):
    try:
        last = max(last, json.loads(line).get("epoch", 0) + 1)
    except Exception:
        pass
print(last)
PY
)
    (( e > done_ep )) && done_ep=$e
  done
  if (( done_ep >= TARGET )); then
    echo "=== $NAME: $done_ep/$TARGET epochs done ==="
    break
  fi
  echo "=== segment $seg: resuming from ${ck:-scratch} at epoch $done_ep ==="
  # skip_nonfinite + grad_clip: an exploding step at epoch ~30 NaN'd the
  # first two attempts (healthy 0.046 val before it).  apply_if_finite
  # alone did NOT save it — the spike is huge-but-FINITE, so the update
  # applies and poisons the params; global-norm clipping at 1.0 caps it.
  timeout "$SEG_TIMEOUT" python -u run.py seed=42 name=$NAME \
    trainer.skip_nonfinite=true trainer.grad_clip=1.0 \
    model=magnet_cnn_2d datamodule=h5_datamodule_implicit_2d \
    datamodule.train_path=data/B1/burgers_train_B1_64.h5 \
    datamodule.val_path=data/B1/burgers_test_B1_64.h5 \
    datamodule.test_path=data/B1/burgers_test_B1_64.h5 \
    datamodule.nt_train=50 datamodule.res_train=64 \
    datamodule.nt_val=50 datamodule.res_val=64 \
    datamodule.nt_test=50 datamodule.res_test=64 \
    datamodule.batch_size=8 datamodule.samples=256 \
    model.params.time_slice=10 \
    trainer.max_epochs=$TARGET \
    ${ck:+ckpt_path=$ck} \
    2>&1 | grep -E "epoch [0-9]+ |best|resumed|Error" | tail -5
done

ck=$(ls -t runs/$NAME/*/checkpoints/best.msgpack 2>/dev/null | head -1)
echo "=== final eval ($ck) ==="
timeout 7200 python -u eval.py seed=42 ckpt_path="$ck" \
  model=magnet_cnn_2d datamodule=h5_datamodule_implicit_2d \
  datamodule.test_path=data/B1/burgers_test_B1_64.h5 \
  datamodule.nt_test=50 datamodule.res_test=64 \
  model.params.time_slice=10 2>&1 | grep -o '{.*}' | tail -1
