#!/bin/bash
# Generic multi-seed experiment runner (replaces the reference's SLURM array
# jobs, e.g. scripts/mpnn_2d/mpnn_2d_b1_128_irregular.sh): runs 5 seeds
# sequentially (or under SLURM if SLURM_ARRAY_TASK_ID is set).
#   usage: ./run_experiment.sh <name> <override> [<override> ...]
set -euo pipefail
cd "$(dirname "$0")/.."
NAME="$1"; shift
SEEDS_FILE="${SEEDS_FILE:-scripts/seeds.txt}"
if [[ -n "${SLURM_ARRAY_TASK_ID:-}" ]]; then
  seed=$(awk -v var="$SLURM_ARRAY_TASK_ID" 'NR==var {print $1}' "$SEEDS_FILE")
  python run.py seed="$seed" name="$NAME" "$@"
else
  while read -r seed; do
    echo "=== $NAME seed=$seed ==="
    python run.py seed="$seed" name="$NAME" "$@"
  done < "$SEEDS_FILE"
fi
