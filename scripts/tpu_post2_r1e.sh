#!/bin/bash
# Final measurement pass: after post-r1e (pid $1) drains, compare decoder
# throughput on the (now idle) host + chip.
set -u
cd "$(dirname "$0")/.."
LOG=runs/tpu_post2_r1e.log
PIDFILE=runs/tpu_active.pid
echo "== post2-r1e start $(date) ==" | tee -a "$LOG"
if [ $# -ge 1 ] && [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 120; done
fi
echo "== post-r1e drained $(date) ==" | tee -a "$LOG"

echo "== decoder throughput (UF cpu, BP tpu, GNN from bench) $(date) ==" | tee -a "$LOG"
python benchmarks/decoder_throughput.py \
  > runs/decoder_throughput.json 2> runs/decoder_throughput.err

echo "== post2-r1e done $(date) ==" | tee -a "$LOG"
