#!/bin/bash
cd /root/repo
for pair in 1 2 3; do
  echo "=== pair $pair start $(date +%H:%M:%S)"
  ./dev.sh python -m pytest tests/ -q > /tmp/r5_conc_${pair}a.log 2>&1 &
  A=$!
  ./dev.sh python -m pytest tests/ -q > /tmp/r5_conc_${pair}b.log 2>&1 &
  B=$!
  wait $A; ra=$?
  wait $B; rb=$?
  echo "=== pair $pair done $(date +%H:%M:%S) rc=$ra/$rb"
  tail -1 /tmp/r5_conc_${pair}a.log
  tail -1 /tmp/r5_conc_${pair}b.log
done
