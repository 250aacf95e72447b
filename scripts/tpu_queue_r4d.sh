#!/bin/bash
# Round-4 queue D — bisect step 2: the narrow-p-mix R=14 retrain (r4c) was
# STILL stuck at the trivial-logical plateau (ler_logical 0.2587 at step
# 1000, bit-identical to the r4a attempt; loss 0.33 vs r3a 0.083) while
# gradients are proven correct (runs/circuit_gradparity_r4.json) — so the
# suspect is R=14 recurrence depth on the small circuit graph (d=11 R=14
# works; r3a circuit R=8 works).  This queue drops the circuit retrains to
# R=8, keeps h=128 + pallas bf16 + narrow p-mix.
# (original r4c rationale below)
# — replaces r4b after the first circuit flagship retrain
# attempt stalled (p-mix 0.005..0.03 put most of the batch in the
# LER 0.2-0.5 regime where the logical head gets no signal; loss flat,
# ler_logical 0.25 vs r3a's 0.07 at the same step).  Narrow mix centred on
# the regime the detector rows actually evaluate (and r3a's proven 0.008):
#   1. circuit d=5 flagship retrain, p-mix 0.004..0.015, 8k steps
#   2. circuit d=3 flagship retrain, same treatment, 6k steps
#   3. circuit d=3+d=5 rows at 1M shots -> LER_DETECTOR.md
#   4. spacetime d=3/d=5 re-shoots at 1M shots
#   5. d=13 train 8k steps [VERDICT next-2]
#   6. d=13 LER rows
#   7. EMA 40k d=11 re-eval (remaining ps)
#   8. d=11 p=0.01 resumable shot accumulation toward 100M (filler)
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/repo/runs/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
export TPUGNN_TRAIN_VMEM_LIMIT_MB=112
LOG=runs/tpu_queue_r4d.log
PIDFILE=runs/tpu_active.pid
echo "== r4d queue start $(date) ==" | tee -a "$LOG"

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

echo "== circuit d=5 flagship retrain v2 (narrow p-mix) $(date) ==" | tee -a "$LOG"
run_job timeout 7200 python benchmarks/train_quality_circuit.py \
  --specs 5:5 --steps 8000 --batch 4096 --hidden 128 --rounds 8 \
  --backend pallas --dtype bfloat16 --ema 0.999 --p-mix 0.004 0.015 \
  --lr 0.001 --out-suffix _h128c --eval-ps 0.01 0.02 \
  >> runs/train_circuit_h128.log 2>&1

echo "== circuit d=3 flagship retrain (same treatment) $(date) ==" | tee -a "$LOG"
run_job timeout 5400 python benchmarks/train_quality_circuit.py \
  --specs 3:3 --steps 6000 --batch 4096 --hidden 128 --rounds 8 \
  --backend pallas --dtype bfloat16 --ema 0.999 --p-mix 0.004 0.015 \
  --lr 0.001 --out-suffix _h128c --eval-ps 0.01 0.02 \
  >> runs/train_circuit_h128.log 2>&1

echo "== circuit d=3+d=5 h128b detector rows at 1M shots $(date) ==" | tee -a "$LOG"
run_job timeout 10800 python benchmarks/ler_table.py \
  --runs runs/circuit_surface_d5_t5_h128c/ema:surface:5:128:8:bits:5:circuit \
  --runs runs/circuit_surface_d5_t5_h128c:surface:5:128:8:bits:5:circuit \
  --runs runs/circuit_surface_d3_t3_h128c/ema:surface:3:128:8:bits:3:circuit \
  --runs runs/circuit_surface_d3_t3_h128c:surface:3:128:8:bits:3:circuit \
  --ps 0.01 0.02 0.03 --shots 1000000 --no-bp \
  --out benchmarks/LER_DETECTOR.md > runs/ler_detector_h128.log 2>&1
python benchmarks/ler_table.py --rebuild --runs dummy \
  --out benchmarks/LER_DETECTOR.md 2>> "$LOG" || true
python benchmarks/check_parity.py >> "$LOG" 2>&1 || true

echo "== spacetime d=3/d=5 re-shoots at 1M shots $(date) ==" | tee -a "$LOG"
run_job timeout 7200 python benchmarks/ler_table.py \
  --runs runs/spacetime_surface_d3_t3:surface:3:96:8:bits:3:phenomenological \
  --runs runs/spacetime_surface_d5_t5:surface:5:96:8:bits:5:phenomenological \
  --ps 0.01 --shots 1000000 --no-bp \
  --out benchmarks/LER_DETECTOR.md > runs/ler_spacetime_1m.log 2>&1
python benchmarks/ler_table.py --rebuild --runs dummy \
  --out benchmarks/LER_DETECTOR.md 2>> "$LOG" || true

echo "== d=13 train 8k steps (pallas bf16, remat, p-mix, EMA) $(date) ==" | tee -a "$LOG"
run_job timeout 10800 python benchmarks/train_quality_v3.py \
  --ds 13 --rounds 14 --steps 8000 --batch 4096 --remat \
  --backend pallas --dtype bfloat16 --ema 0.999 --p-mix 0.01 0.05 \
  >> runs/train_quality_v3.log 2>&1

echo "== d=13 LER rows $(date) ==" | tee -a "$LOG"
run_job timeout 10800 python benchmarks/ler_table.py \
  --runs runs/v3_surface_d13/ema:surface:13:128:14 \
  --ps 0.02 0.03 0.05 --shots 1000000 --no-bp \
  --baseline-cache benchmarks/baseline_ler.jsonl \
  > runs/ler_table_d13.log 2>&1
run_job timeout 7200 python benchmarks/ler_table.py \
  --runs runs/v3_surface_d13/ema:surface:13:128:14 \
  --ps 0.01 --shots 200000 --no-bp \
  --baseline-cache benchmarks/baseline_ler.jsonl \
  >> runs/ler_table_d13.log 2>&1
python benchmarks/ler_table.py --rebuild --runs dummy 2>> "$LOG" || true
python benchmarks/check_parity.py >> "$LOG" 2>&1 || true

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
python benchmarks/ler_table.py --rebuild --runs dummy \
  --out benchmarks/LER_D11_P001.md 2>> "$LOG" || true
python benchmarks/collect_results.py 2>> "$LOG" || true
echo "== r4d queue done $(date) ==" | tee -a "$LOG"
