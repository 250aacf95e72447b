#!/bin/bash
# Round-4 queue F — final-stretch surgery: a d=15 flagship training run
# (BASELINE configs[4] "d=15+ decoding"; checkpoints land every 1000
# steps so the round cut loses nothing), then the resumable 100M p=0.01
# filler picks its progress file back up.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/repo/runs/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
export TPUGNN_TRAIN_VMEM_LIMIT_MB=112
LOG=runs/tpu_queue_r4f.log
PIDFILE=runs/tpu_active.pid
echo "== r4f queue start $(date) ==" | tee -a "$LOG"

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

echo "== d=15 train 8k steps (pallas bf16, remat, p-mix, EMA) $(date) ==" | tee -a "$LOG"
run_job timeout 10800 python benchmarks/train_quality_v3.py \
  --ds 15 --rounds 14 --steps 8000 --batch 4096 --remat \
  --backend pallas --dtype bfloat16 --ema 0.999 --p-mix 0.01 0.05 \
  >> runs/train_quality_v3.log 2>&1

echo "== d=15 LER rows $(date) ==" | tee -a "$LOG"
run_job timeout 10800 python benchmarks/ler_table.py \
  --runs runs/v3_surface_d15/ema:surface:15:128:14 \
  --ps 0.02 0.03 --shots 1000000 --no-bp \
  --baseline-cache benchmarks/baseline_ler.jsonl \
  > runs/ler_table_d15.log 2>&1
python benchmarks/ler_table.py --rebuild --runs dummy 2>> "$LOG" || true
python benchmarks/check_parity.py >> "$LOG" 2>&1 || true
python benchmarks/collect_results.py 2>> "$LOG" || true

echo "== d=11 p=0.01 shot accumulation toward 100M (resume) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/ler_table.py \
  --runs runs/v3_surface_d11/ema:surface:11:128:14 \
  --ps 0.01 --shots 100000000 --no-bp \
  --baseline-cache benchmarks/baseline_ler.jsonl \
  --out benchmarks/LER_D11_P001.md >> runs/ler_d11_p001_100m.log 2>&1
python benchmarks/collect_results.py 2>> "$LOG" || true
echo "== r4f queue done $(date) ==" | tee -a "$LOG"
