#!/bin/bash
# Round-1 continuation queue, take 3.  r1b launched but its d=7 run OOMed
# 16G HBM (R=10 without remat); d=9 (--remat) was already in flight, so this
# script WAITS for an existing d=9 python (pid passed as $1, optional) and
# then runs the rest of the plan with --remat everywhere it is needed.
set -u
cd "$(dirname "$0")/.."
LOG=runs/tpu_queue_r1c.log
echo "== r1c queue start $(date) ==" | tee -a "$LOG"

if [ $# -ge 1 ] && [ -n "$1" ]; then
  echo "== waiting for existing d=9 run (pid $1) ==" | tee -a "$LOG"
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  echo "== d=9 done $(date) ==" | tee -a "$LOG"
fi

echo "== v3 train d=7 R=10 (remat) ==" | tee -a "$LOG"
python benchmarks/train_quality_v3.py --ds 7 --rounds 10 --steps 8000 --remat \
  >> runs/train_quality_v3.log 2>&1
echo "== v3 train d=11 R=14 (remat) $(date) ==" | tee -a "$LOG"
python benchmarks/train_quality_v3.py --ds 11 --rounds 14 --steps 8000 --remat \
  >> runs/train_quality_v3.log 2>&1

echo "== LER table d=3..11, 1M GNN shots, cached baselines $(date) ==" | tee -a "$LOG"
python benchmarks/ler_table.py \
  --runs runs/v2_surface_d3:surface:3:64 \
  --runs runs/v2_surface_d5:surface:5:96 \
  --runs runs/v3_surface_d7:surface:7:128:10 \
  --runs runs/v3_surface_d9:surface:9:128:12 \
  --runs runs/v3_surface_d11:surface:11:128:14 \
  --shots 1000000 --baseline-cache benchmarks/baseline_ler.jsonl \
  > runs/ler_table_v3.log 2>&1

echo "== circuit quality z (d=3:3, 5:5) $(date) ==" | tee -a "$LOG"
python benchmarks/train_quality_circuit.py --specs 3:3 5:5 --steps 4000 \
  --batch 4096 >> runs/train_quality_circuit.log 2>&1

echo "== circuit quality x (d=3:3) $(date) ==" | tee -a "$LOG"
python benchmarks/train_quality_circuit.py --specs 3:3 --sector x \
  --steps 4000 --batch 4096 >> runs/train_quality_circuit.log 2>&1

echo "== spacetime quality (d=3:3, 5:5) $(date) ==" | tee -a "$LOG"
python benchmarks/train_quality_circuit.py --noise phenomenological \
  --specs 3:3 5:5 --steps 4000 --batch 4096 --p 0.02 \
  --eval-ps 0.01 0.02 0.03 >> runs/train_quality_spacetime.log 2>&1

echo "== r1c queue done $(date) ==" | tee -a "$LOG"
