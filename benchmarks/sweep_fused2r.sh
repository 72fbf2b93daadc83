#!/bin/bash
# fused2r on-chip validation + chunk-size sweep (run when the TPU relay
# is healthy):   ./tpu.sh bash benchmarks/sweep_fused2r.sh
# Each line: config -> the ONE bench JSON line.
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  env "$@" timeout 2700 python -u bench.py 2>&1 | tail -1
}

# baselines on the same (Hilbert-ordered) graph
run MAGNET_TPU_NO_FUSED2=1                       # v1 + XLA gather
run MAGNET_TPU_NO_FUSED2R=1                      # fused2 rectangular grid
# fused2r chunk sweep (chunk divides/rounds E_TILE; see _chunkable_e_tile)
run MAGNET_TPU_CHUNK2=256
run MAGNET_TPU_CHUNK2=512
run MAGNET_TPU_CHUNK2=1024
run                                              # default chunk policy
# the previous headline layout for reference (no Hilbert, v1 path)
run BENCH_NO_MORTON=1 MAGNET_TPU_NO_FUSED2=1
