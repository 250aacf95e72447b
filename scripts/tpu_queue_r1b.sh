#!/bin/bash
# Round-1 continuation TPU work queue (the r1 queue never ran — host restart).
# Runs the flagship d=7/9/11 surface trainings, regenerates the full
# d=3..11 LER parity table at 1M GNN shots against the cached 1M-shot
# classical baselines, then the circuit-level / spacetime quality runs.
# Everything sequential on the single tunneled chip; logs under runs/.
set -u
cd "$(dirname "$0")/.."
LOG=runs/tpu_queue_r1b.log
echo "== queue start $(date) ==" | tee -a "$LOG"

# Flagship trainings: rounds scale with distance (one bipartite round
# propagates ~1 lattice step, so R must cover ~d hops for large d).
echo "== v3 train d=7 R=10 ==" | tee -a "$LOG"
python benchmarks/train_quality_v3.py --ds 7 --rounds 10 --steps 8000 \
  >> runs/train_quality_v3.log 2>&1
echo "== v3 train d=9 R=12 (remat) ==" | tee -a "$LOG"
python benchmarks/train_quality_v3.py --ds 9 --rounds 12 --steps 8000 --remat \
  >> runs/train_quality_v3.log 2>&1
echo "== v3 train d=11 R=14 (remat) ==" | tee -a "$LOG"
python benchmarks/train_quality_v3.py --ds 11 --rounds 14 --steps 8000 --remat \
  >> runs/train_quality_v3.log 2>&1

echo "== LER table d=3..11, 1M GNN shots, cached baselines ==" | tee -a "$LOG"
python benchmarks/ler_table.py \
  --runs runs/v2_surface_d3:surface:3:64 \
  --runs runs/v2_surface_d5:surface:5:96 \
  --runs runs/v3_surface_d7:surface:7:128:10 \
  --runs runs/v3_surface_d9:surface:9:128:12 \
  --runs runs/v3_surface_d11:surface:11:128:14 \
  --shots 1000000 --baseline-cache benchmarks/baseline_ler.jsonl \
  > runs/ler_table_v3.log 2>&1

echo "== circuit quality z (d=3:3, 5:5) ==" | tee -a "$LOG"
python benchmarks/train_quality_circuit.py --specs 3:3 5:5 --steps 4000 \
  --batch 4096 >> runs/train_quality_circuit.log 2>&1

echo "== circuit quality x (d=3:3) ==" | tee -a "$LOG"
python benchmarks/train_quality_circuit.py --specs 3:3 --sector x \
  --steps 4000 --batch 4096 >> runs/train_quality_circuit.log 2>&1

echo "== spacetime quality (d=3:3, 5:5) ==" | tee -a "$LOG"
python benchmarks/train_quality_circuit.py --noise phenomenological \
  --specs 3:3 5:5 --steps 4000 --batch 4096 --p 0.02 \
  --eval-ps 0.01 0.02 0.03 >> runs/train_quality_spacetime.log 2>&1

echo "== queue done $(date) ==" | tee -a "$LOG"
