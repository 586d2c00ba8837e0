#!/bin/bash
# Round-5 QM9 accuracy-parity sweeps (docs/PARITY.md protocol; reference
# run_qm9_benchs.py:19-68). Small-fold recipe (docs/PARITY.md): the
# bundled 9k stand-in train fold with Adam 1e-4 + 10k-node batches.
# Sequential on purpose: ONE TPU process at a time (relay constraint).
#
# 1. GNN-FiLM (the paper's headline model) x all 13 properties x 1 seed.
# 2. RGCN x {mu, HOMO, U0, Cv} x 3 seeds (mean +/- std).
set -u
cd "$(dirname "$0")/.."
OUT=docs/qm9_parity
# max_epochs 300 bounds slow-converging properties (alpha's tight
# normalizer keeps improving past epoch 350 on the small fold — round 4
# measured its converged value separately at 3 seeds); patience 25 is
# the reference protocol and stops most properties well before the cap.
# Runs that hit the cap are noted in docs/PARITY.md.
RECIPE='{"optimizer": "Adam", "learning_rate": 0.0001, "max_nodes_in_batch": 10000, "cache_batches_on_device": true, "repack_cached_every": 4, "max_epochs": 300}'

mkdir -p "$OUT/film_13prop" "$OUT/rgcn_3seed"

echo "=== FiLM 13-property sweep ($(date +%H:%M:%S)) ==="
timeout 21600 python run_qm9_benchs.py "$OUT/film_13prop" \
  --models GNN_FiLM --num-runs 1 \
  --model-param-overrides "$RECIPE" \
  > "$OUT/film_13prop_console.log" 2>&1
echo "=== FiLM sweep done rc=$? ($(date +%H:%M:%S)) ==="

echo "=== RGCN 3-seed x 4-property sweep ($(date +%H:%M:%S)) ==="
timeout 14400 python run_qm9_benchs.py "$OUT/rgcn_3seed" \
  --models RGCN --num-runs 3 --properties mu,HOMO,U0,Cv \
  --model-param-overrides "$RECIPE" \
  > "$OUT/rgcn_3seed_console.log" 2>&1
echo "=== RGCN sweep done rc=$? ($(date +%H:%M:%S)) ==="
echo "ALL DONE $(date)"
