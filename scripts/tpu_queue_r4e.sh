#!/bin/bash
# Round-4 queue E — surgery insert: waits for the d=13 train python ($1),
# then d=13 rows, circuit NLL-selection re-rows (the posterior-likelihood
# best-of fixed the weight-rule misranking — see runs/nll_select_exp.json),
# EMA 40k re-eval, 100M filler.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/repo/runs/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
export TPUGNN_TRAIN_VMEM_LIMIT_MB=112
LOG=runs/tpu_queue_r4e.log
PIDFILE=runs/tpu_active.pid
WAIT_PID=${1:-}
echo "== r4e queue start (waiting on pid ${WAIT_PID:-none}) $(date) ==" | tee -a "$LOG"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  rm -f "$PIDFILE"
fi
echo "== d=13 train drained $(date) ==" | tee -a "$LOG"

run_job() {
  "$@" &
  local pid=$!
  { echo "$pid"; sleep 2; ps -o pid= --ppid "$pid" 2>/dev/null; } > "$PIDFILE"
  (
    while kill -0 "$pid" 2>/dev/null; do
      for p in $(cat "$PIDFILE" 2>/dev/null); do
        state=$(awk '{print $3}' /proc/"$p"/stat 2>/dev/null || echo R)
        if [ "$state" = "T" ]; then
          stopped=$((${stopped:-0} + 60))
          if [ "$stopped" -ge 2400 ]; then
            kill -CONT "$p" 2>/dev/null
            stopped=0
          fi
        fi
      done
      sleep 60
    done
  ) &
  local wd=$!
  wait "$pid"
  local rc=$?
  kill "$wd" 2>/dev/null
  rm -f "$PIDFILE"
  return $rc
}

echo "== d=13 LER rows $(date) ==" | tee -a "$LOG"
run_job timeout 10800 python benchmarks/ler_table.py \
  --runs runs/v3_surface_d13/ema:surface:13:128:14 \
  --ps 0.02 0.03 --shots 1000000 --no-bp \
  --baseline-cache benchmarks/baseline_ler.jsonl \
  > runs/ler_table_d13.log 2>&1
python benchmarks/ler_table.py --rebuild --runs dummy 2>> "$LOG" || true
python benchmarks/check_parity.py >> "$LOG" 2>&1 || true

echo "== circuit NLL-selection re-rows at 1M shots $(date) ==" | tee -a "$LOG"
run_job timeout 10800 python benchmarks/ler_table.py \
  --runs runs/circuit_surface_d5_t5_h128c/ema:surface:5:128:8:bits:5:circuit \
  --runs runs/circuit_surface_d3_t3_h128c/ema:surface:3:128:8:bits:3:circuit \
  --ps 0.01 0.02 0.03 --shots 1000000 --no-bp --select-cost nll \
  --out benchmarks/LER_DETECTOR.md > runs/ler_detector_nll.log 2>&1
python benchmarks/ler_table.py --rebuild --runs dummy \
  --out benchmarks/LER_DETECTOR.md 2>> "$LOG" || true
python benchmarks/check_parity.py >> "$LOG" 2>&1 || true

echo "== d=13 p=0.05 at 1M + p=0.01 at 200k $(date) ==" | tee -a "$LOG"
run_job timeout 7200 python benchmarks/ler_table.py \
  --runs runs/v3_surface_d13/ema:surface:13:128:14 \
  --ps 0.05 --shots 1000000 --no-bp \
  --baseline-cache benchmarks/baseline_ler.jsonl \
  >> runs/ler_table_d13.log 2>&1
run_job timeout 7200 python benchmarks/ler_table.py \
  --runs runs/v3_surface_d13/ema:surface:13:128:14 \
  --ps 0.01 --shots 200000 --no-bp \
  --baseline-cache benchmarks/baseline_ler.jsonl \
  >> runs/ler_table_d13.log 2>&1
python benchmarks/ler_table.py --rebuild --runs dummy 2>> "$LOG" || true

echo "== EMA 40k d=11 re-eval (remaining ps) $(date) ==" | tee -a "$LOG"
run_job timeout 14400 python benchmarks/ler_table.py \
  --runs runs/v3_surface_d11/ema:surface:11:128:14 \
  --ps 0.02 0.03 0.05 --shots 1000000 --no-bp \
  --baseline-cache benchmarks/baseline_ler.jsonl \
  >> runs/ler_table_r3.log 2>&1
python benchmarks/ler_table.py --rebuild --runs dummy 2>> "$LOG" || true
python benchmarks/check_parity.py >> "$LOG" 2>&1 || true
python benchmarks/collect_results.py 2>> "$LOG" || true

echo "== d=11 p=0.01 shot accumulation toward 100M (resumable) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/ler_table.py \
  --runs runs/v3_surface_d11/ema:surface:11:128:14 \
  --ps 0.01 --shots 100000000 --no-bp \
  --baseline-cache benchmarks/baseline_ler.jsonl \
  --out benchmarks/LER_D11_P001.md >> runs/ler_d11_p001_100m.log 2>&1
python benchmarks/collect_results.py 2>> "$LOG" || true
echo "== r4e queue done $(date) ==" | tee -a "$LOG"
