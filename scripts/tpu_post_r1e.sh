#!/bin/bash
# After the r1e queue drains (pid $1): streaming-decode quality of the
# spacetime-trained GNN window decoders vs streaming union-find.
set -u
cd "$(dirname "$0")/.."
LOG=runs/tpu_post_r1e.log
PIDFILE=runs/tpu_active.pid
echo "== post-r1e start $(date) ==" | tee -a "$LOG"
if [ $# -ge 1 ] && [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 120; done
fi
echo "== r1e drained $(date) ==" | tee -a "$LOG"

run_job() {
  "$@" &
  local pid=$!
  echo "$pid" > "$PIDFILE"
  wait "$pid"
  local rc=$?
  rm -f "$PIDFILE"
  return $rc
}

echo "== stream quality (spacetime d=3 W=3, d=5 W=5) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/stream_quality.py \
  --runs runs/spacetime_surface_d3_t3:surface:3:3:96 \
  --runs runs/spacetime_surface_d5_t5:surface:5:5:96 \
  --commit 1 --ps 0.01 0.02 0.03 --shots 20000 \
  > runs/stream_quality.json 2> runs/stream_quality.err

echo "== post-r1e done $(date) ==" | tee -a "$LOG"
