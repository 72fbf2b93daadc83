#!/bin/bash
# reference: script./magnet_gnn_b2.sh (calls test_reg_b2.py, a file missing
# from the reference repo; this is the working equivalent via eval.py).
# Zero-shot super-resolution eval of a trained magnet_gnn checkpoint on the
# B2 regular grids.  Usage: CKPT=runs/<run>/checkpoints/best.msgpack ./magnet_gnn_b2.sh
set -euo pipefail
cd "$(dirname "$0")/.."
: "${CKPT:?set CKPT=<path to trained magnet_gnn checkpoint>}"
for res in 32 64; do
  python eval.py model=magnet_gnn datamodule=h5_datamodule_implicit_gnn_2d \
    ckpt_path="$CKPT" \
    datamodule.test_path="data/B2/burgers_test_B2_${res}.h5" \
    datamodule.nt_test=50 "datamodule.res_test=${res}" \
    model.params.time_slice=10
done
