#!/bin/bash
# FALLBACK for the r2a d=11 resume (use only if the shocked run does not
# recover): restore the step-8000 checkpoint backup and fine-tune gently
# on the kernel-bwd path — low peak LR, short warmup, p-mix — then the
# same table stages as r2a.
#   bash scripts/tpu_queue_r2c_fallback.sh        (after killing r2a)
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/repo/runs/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
LOG=runs/tpu_queue_r2c.log
PIDFILE=runs/tpu_active.pid
METRICS=runs/v3_surface_d11/metrics.jsonl
STEPS=${STEPS:-24000}
LR=${LR:-0.0003}
echo "== r2c fallback start $(date) ==" | tee -a "$LOG"

# wipe the shocked checkpoints, restore the good 8k state
if [ -d runs/v3_surface_d11_step8k_bak ]; then
  rm -rf runs/v3_surface_d11_shocked
  mv runs/v3_surface_d11 runs/v3_surface_d11_shocked
  cp -r runs/v3_surface_d11_step8k_bak runs/v3_surface_d11
fi

train_watchdog() {
  local metrics=$1; shift
  local attempt
  for attempt in 1 2 3 4; do
    echo "== train attempt $attempt: $* $(date) ==" | tee -a "$LOG"
    "$@" &
    local pid=$!
    echo "$pid" > "$PIDFILE"
    local born; born=$(date +%s)
    local killed=0
    while kill -0 "$pid" 2>/dev/null; do
      sleep 120
      local state; state=$(awk '{print $3}' /proc/"$pid"/stat 2>/dev/null || echo R)
      [ "$state" = "T" ] && continue
      local now ref age
      now=$(date +%s)
      ref=$(stat -c %Y "$metrics" 2>/dev/null || echo "$born")
      age=$((now - ref))
      if [ "$age" -gt 2400 ] && [ $((now - born)) -gt 6000 ]; then
        echo "== stalled (idle ${age}s), killing $pid ==" | tee -a "$LOG"
        kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
        killed=1; break
      fi
    done
    wait "$pid" 2>/dev/null
    local rc=$?
    rm -f "$PIDFILE"
    [ "$killed" -eq 0 ] && [ "$rc" -eq 0 ] && return 0
  done
  return 1
}

echo "== d=11 gentle fine-tune: lr=$LR steps=$STEPS $(date) ==" | tee -a "$LOG"
train_watchdog "$METRICS" \
  python benchmarks/train_quality_v3.py --ds 11 --rounds 14 --steps "$STEPS" \
    --backend pallas --dtype bfloat16 --ema 0.999 --p-mix 0.01 0.05 \
    --lr "$LR" >> runs/train_quality_v3.log 2>&1

echo "== LER table d=3..11 + cleanup hybrids, 1M shots $(date) ==" | tee -a "$LOG"
python benchmarks/ler_table.py \
  --runs runs/v2_surface_d3:surface:3:64 \
  --runs runs/v2_surface_d5:surface:5:96 \
  --runs runs/v3_surface_d7:surface:7:128:10 \
  --runs runs/v3_surface_d9:surface:9:128:12 \
  --runs runs/v3_surface_d11:surface:11:128:14 \
  --runs runs/v3_surface_d11/ema:surface:11:128:14 \
  --shots 1000000 --baseline-cache benchmarks/baseline_ler.jsonl \
  > runs/ler_table_r2.log 2>&1

echo "== d=11 p=0.01 at 10M shots $(date) ==" | tee -a "$LOG"
python benchmarks/ler_table.py \
  --runs runs/v3_surface_d11:surface:11:128:14 \
  --ps 0.01 --shots 10000000 \
  --baseline-cache benchmarks/baseline_ler.jsonl \
  --out benchmarks/LER_D11_P001.md > runs/ler_d11_p001.log 2>&1

python benchmarks/collect_results.py 2>> "$LOG" || true
echo "== r2c fallback done $(date) ==" | tee -a "$LOG"
