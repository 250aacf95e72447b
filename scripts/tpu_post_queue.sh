#!/bin/bash
# Post-queue measurement pass: waits for the r1c queue (pid $1) to drain so
# the host is idle (relay starvation inflates TPU timings several-fold —
# benchmarks/PERF_NOTES.md), then measures:
#   1. training-step probe: XLA fused backend vs Pallas fwd+bwd VJP (d=11)
#   2. bench.py with the promoted PROD_VARIANTS kernel schedule
set -u
cd "$(dirname "$0")/.."
LOG=runs/tpu_post_queue.log
echo "== post-queue start $(date) ==" | tee -a "$LOG"
if [ $# -ge 1 ] && [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 120; done
fi
echo "== queue drained, host idle $(date) ==" | tee -a "$LOG"
sleep 30

echo "== probe_train_step d=11 ==" | tee -a "$LOG"
python benchmarks/probe_train_step.py --d 11 --batch 4096 --rounds 8 \
  > runs/probe_train_step.json 2> runs/probe_train_step.err

echo "== bench.py (PROD_VARIANTS promoted) $(date) ==" | tee -a "$LOG"
python bench.py > runs/bench_prod_variants.json 2> runs/bench_prod_variants.err

echo "== post-queue done $(date) ==" | tee -a "$LOG"
