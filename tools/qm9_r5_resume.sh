#!/bin/bash
# Resume of tools/qm9_r5.sh after the relay outage that stalled FiLM
# task 11 (Cv): reruns the two missing FiLM properties, then the RGCN
# 3-seed x 4-property phase. Sequential: ONE TPU process at a time.
set -u
cd "$(dirname "$0")/.."
OUT=docs/qm9_parity
RECIPE='{"optimizer": "Adam", "learning_rate": 0.0001, "max_nodes_in_batch": 10000, "cache_batches_on_device": true, "repack_cached_every": 4, "max_epochs": 300}'

echo "=== FiLM Cv+Omega ($(date +%H:%M:%S)) ==="
timeout 7200 python run_qm9_benchs.py "$OUT/film_13prop" \
  --models GNN_FiLM --num-runs 1 --properties Cv,Omega \
  --model-param-overrides "$RECIPE" \
  >> "$OUT/film_13prop_console.log" 2>&1
echo "=== FiLM tail done rc=$? ($(date +%H:%M:%S)) ==="

echo "=== RGCN 3-seed x 4-property sweep ($(date +%H:%M:%S)) ==="
timeout 14400 python run_qm9_benchs.py "$OUT/rgcn_3seed" \
  --models RGCN --num-runs 3 --properties mu,HOMO,U0,Cv \
  --model-param-overrides "$RECIPE" \
  > "$OUT/rgcn_3seed_console.log" 2>&1
echo "=== RGCN sweep done rc=$? ($(date +%H:%M:%S)) ==="
echo "ALL DONE $(date)"
