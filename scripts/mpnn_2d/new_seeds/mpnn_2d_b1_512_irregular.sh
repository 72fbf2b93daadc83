#!/bin/bash
# reference: scripts/mpnn_2d/new_seeds/mpnn_2d_b1_512_irregular.sh
# same experiment, second 4-seed replication set
export SEEDS_FILE="$(cd "$(dirname "$0")/../.." && pwd)/new_seeds.txt"
exec "$(dirname "$0")/../mpnn_2d_b1_512_irregular.sh"
