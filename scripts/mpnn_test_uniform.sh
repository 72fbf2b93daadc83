#!/bin/bash
# reference: scripts/mpnn_test_uniform.sh (calls test_irr_uniform.py, a file
# missing from the reference repo; this is the working equivalent via
# eval.py).  Zero-shot eval of a trained 1D mpnn checkpoint on unseen
# uniform-irregular resolutions (train 30/50/70 -> test 100/200,
# reference README.md:34-50).
# Usage: CKPT=runs/<run>/checkpoints/best.msgpack ./mpnn_test_uniform.sh
set -euo pipefail
cd "$(dirname "$0")/.."
: "${CKPT:?set CKPT=<path to trained mpnn checkpoint>}"
MESH="${MESH:-uniform}"
for nx in 100 200; do
  python eval.py model=mpnn datamodule=h5_datamodule_graph \
    ckpt_path="$CKPT" \
    datamodule.test_path="data/${MESH}/CE_test_E3_${nx}.h5" \
    datamodule.nt_test=250 "datamodule.nx_test=${nx}"
done
