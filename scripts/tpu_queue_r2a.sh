#!/bin/bash
# Round-2 queue A — VERDICT r1 items 1, 3, 5, 6, 7:
#   1. resume the d=11 flagship FAR past 8k steps, on the fused Pallas
#      fwd+bwd kernel path (backend=pallas, bf16 compute, f32 params) with
#      per-shot p-mix over the eval range and EMA;
#   2. regenerate the 1M-shot LER table d=3..11 with the new GNN+UF /
#      GNN+MWPM residual-cleanup hybrid columns (rows cache now keyed by
#      checkpoint identity, so new checkpoints re-evaluate);
#   3. resolve d=11 p=0.01 with 10M shots;
#   4. train + table toric-code decoders (BASELINE configs[3]).
# Queue discipline: PID advertised in runs/tpu_active.pid; benches pause us
# via tpugnn/utils/hostidle.py. Stall watchdog per CLAUDE.md (deaf relay
# calls wedge long trainings).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/repo/runs/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
LOG=runs/tpu_queue_r2a.log
PIDFILE=runs/tpu_active.pid
METRICS=runs/v3_surface_d11/metrics.jsonl
STEPS=${STEPS:-40000}
echo "== r2a queue start $(date) ==" | tee -a "$LOG"

run_job() {
  "$@" &
  local pid=$!
  echo "$pid" > "$PIDFILE"
  (
    stopped=0
    while kill -0 "$pid" 2>/dev/null; do
      state=$(awk '{print $3}' /proc/"$pid"/stat 2>/dev/null || echo R)
      if [ "$state" = "T" ]; then
        stopped=$((stopped + 60))
        if [ "$stopped" -ge 2400 ]; then
          kill -CONT "$pid" 2>/dev/null
          stopped=0
        fi
      else
        stopped=0
      fi
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

# training job with a metrics-stall watchdog: kill + resume-from-checkpoint
# if the metrics file stops advancing for 40 min while the process is alive
# and not bench-paused (eval cadence is ~5 min on the kernel path).  The
# first-metrics grace is 100 min: the R=14 fused fwd+bwd Mosaic compile
# alone can take ~30-60 min through the tunnel (cached for restarts via
# JAX_COMPILATION_CACHE_DIR).
train_watchdog() {
  local metrics=$1; shift
  local attempt
  for attempt in 1 2 3 4; do
    echo "== train attempt $attempt: $* $(date) ==" | tee -a "$LOG"
    "$@" &
    local pid=$!
    echo "$pid" > "$PIDFILE"
    local born
    born=$(date +%s)
    local killed=0
    while kill -0 "$pid" 2>/dev/null; do
      sleep 120
      local state
      state=$(awk '{print $3}' /proc/"$pid"/stat 2>/dev/null || echo R)
      if [ "$state" = "T" ]; then
        continue  # bench-paused: not a stall
      fi
      local now ref age
      now=$(date +%s)
      ref=$(stat -c %Y "$metrics" 2>/dev/null || echo "$born")
      age=$((now - ref))
      if [ "$age" -gt 2400 ] && [ $((now - born)) -gt 6000 ]; then
        echo "== train stalled (metrics idle ${age}s), killing pid $pid ==" \
          | tee -a "$LOG"
        kill "$pid" 2>/dev/null
        sleep 10
        kill -9 "$pid" 2>/dev/null
        killed=1
        break
      fi
    done
    wait "$pid" 2>/dev/null
    local rc=$?
    rm -f "$PIDFILE"
    if [ "$killed" -eq 0 ] && [ "$rc" -eq 0 ]; then
      return 0
    fi
  done
  echo "== training gave up after 4 attempts $(date) ==" | tee -a "$LOG"
  return 1
}

# keep the step-8000 XLA-path checkpoint recoverable before resuming on the
# kernel-backward path with a new noise distribution
if [ ! -d runs/v3_surface_d11_step8k_bak ]; then
  cp -r runs/v3_surface_d11 runs/v3_surface_d11_step8k_bak
fi

echo "== d=11 resume: pallas fwd+bwd, p-mix 0.01..0.05, -> $STEPS steps $(date) ==" | tee -a "$LOG"
train_watchdog "$METRICS" \
  python benchmarks/train_quality_v3.py --ds 11 --rounds 14 --steps "$STEPS" \
    --backend pallas --dtype bfloat16 --ema 0.999 --p-mix 0.01 0.05 \
    >> runs/train_quality_v3.log 2>&1

echo "== LER table d=3..11 + cleanup hybrids, 1M shots $(date) ==" | tee -a "$LOG"
run_job python benchmarks/ler_table.py \
  --runs runs/v2_surface_d3:surface:3:64 \
  --runs runs/v2_surface_d5:surface:5:96 \
  --runs runs/v3_surface_d7:surface:7:128:10 \
  --runs runs/v3_surface_d9:surface:9:128:12 \
  --runs runs/v3_surface_d11:surface:11:128:14 \
  --runs runs/v3_surface_d11/ema:surface:11:128:14 \
  --shots 1000000 --baseline-cache benchmarks/baseline_ler.jsonl \
  > runs/ler_table_r2.log 2>&1

echo "== d=11 p=0.01 at 10M shots $(date) ==" | tee -a "$LOG"
run_job python benchmarks/ler_table.py \
  --runs runs/v3_surface_d11:surface:11:128:14 \
  --ps 0.01 --shots 10000000 \
  --baseline-cache benchmarks/baseline_ler.jsonl \
  --out benchmarks/LER_D11_P001.md > runs/ler_d11_p001.log 2>&1

echo "== toric quality runs d=3/5/7 (configs[3]) $(date) ==" | tee -a "$LOG"
for td in 3 5 7; do
  train_watchdog "runs/r2_toric_d${td}/metrics.jsonl" \
    python benchmarks/train_quality_v3.py --family toric --ds "$td" \
      --steps 8000 --rounds 10 --backend pallas --dtype bfloat16 \
      --ema 0.999 --p-mix 0.01 0.05 --out-prefix runs/r2_toric_d \
      >> runs/train_quality_toric.log 2>&1
done

echo "== toric LER table, 1M shots $(date) ==" | tee -a "$LOG"
run_job python benchmarks/ler_table.py \
  --runs runs/r2_toric_d3:toric:3:128:10 \
  --runs runs/r2_toric_d5:toric:5:128:10 \
  --runs runs/r2_toric_d7:toric:7:128:10 \
  --shots 1000000 --baseline-cache benchmarks/baseline_ler.jsonl \
  --out benchmarks/LER_TORIC.md > runs/ler_table_toric.log 2>&1

python benchmarks/collect_results.py 2>> "$LOG" || true
echo "== r2a queue done $(date) ==" | tee -a "$LOG"
