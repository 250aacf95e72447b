#!/bin/bash
# Round-2 queue F — recovery + re-prioritized remainder after the r2d d=11
# resume DIVERGED (step 10000: loss 0.65, ler 0.998; warm-restart shock at
# lr 5e-4 on the annealed 8k checkpoint with a new noise distribution).
# The 8k backup has been restored; this queue fine-tunes gently (the r2c
# recipe: low peak LR) and then lands the judged artifacts in value order:
#   1. d=11 gentle resume on the kernel-bwd path (pallas bf16, p-mix, EMA)
#   2. 1M-shot LER table with cleanup/best-of columns   [VERDICT item 1]
#   3. d=11 p=0.01 at 10M shots                         [item 7]
#   4. kernel-bwd train-step probes R=14 + R=8          [item 3 evidence]
#   5. tau sweep on the final checkpoint                [item 1 lever]
#   6. toric d=3/5/7 quality + table                    [item 6, configs[3]]
#   7. circuit/spacetime/stream/detector leftovers      [item 5]
#   8. kernel ablation + TB=64 VMEM probe               [item 2 evidence]
#   9. bench + collect
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/repo/runs/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
LOG=runs/tpu_queue_r2f.log
PIDFILE=runs/tpu_active.pid
METRICS=runs/v3_surface_d11/metrics.jsonl
STEPS=${STEPS:-24000}
LR=${LR:-0.00012}
echo "== r2f queue start $(date) ==" | tee -a "$LOG"

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

train_watchdog() {
  local metrics=$1; shift
  local attempt
  for attempt in 1 2 3; do
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
        continue
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
  echo "== training gave up after 3 attempts $(date) ==" | tee -a "$LOG"
  return 1
}

echo "== d=11 GENTLE resume: pallas fwd+bwd, p-mix, lr $LR -> $STEPS steps $(date) ==" | tee -a "$LOG"
train_watchdog "$METRICS" \
  python benchmarks/train_quality_v3.py --ds 11 --rounds 14 --steps "$STEPS" \
    --backend pallas --dtype bfloat16 --ema 0.999 --p-mix 0.01 0.05 \
    --lr "$LR" >> runs/train_quality_v3.log 2>&1

echo "== LER table d=3..11 + cleanup/best-of, 1M shots $(date) ==" | tee -a "$LOG"
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

echo "== train-step probes (kernel bwd, R=14 then R=8) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/probe_train_step.py --d 11 --rounds 14 \
  --paths pallas > runs/probe_train_r14.json 2> runs/probe_train_r14.err
run_job python benchmarks/probe_train_step.py --d 11 --rounds 8 \
  --paths pallas > runs/probe_train_r8_r2e.json 2> runs/probe_train_r8_r2e.err

echo "== tau sweep (cleanup-hybrid confidence gate, d=11) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/tau_sweep.py --ckpt runs/v3_surface_d11 --d 11 \
  --taus 0 0.7 0.9 0.95 0.99 --ps 0.02 0.03 --shots 200000 \
  > runs/tau_sweep_d11.json 2> runs/tau_sweep_d11.err

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

echo "== circuit quality z (finish d3, d5) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/train_quality_circuit.py --specs 3:3 5:5 --steps 4000 \
  --batch 4096 >> runs/train_quality_circuit.log 2>&1

echo "== circuit quality x (d=3:3) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/train_quality_circuit.py --specs 3:3 --sector x \
  --steps 4000 --batch 4096 >> runs/train_quality_circuit.log 2>&1

echo "== spacetime quality (d=3:3, 5:5) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/train_quality_circuit.py --noise phenomenological \
  --specs 3:3 5:5 --steps 4000 --batch 4096 --p 0.02 \
  --eval-ps 0.01 0.02 0.03 >> runs/train_quality_spacetime.log 2>&1

echo "== stream quality (spacetime windows) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/stream_quality.py \
  --runs runs/spacetime_surface_d3_t3:surface:3:3:96 \
  --runs runs/spacetime_surface_d5_t5:surface:5:5:96 \
  --commit 1 --ps 0.01 0.02 0.03 --shots 20000 \
  > runs/stream_quality.json 2> runs/stream_quality.err

echo "== circuit + spacetime LER table (vs UF/MWPM) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/ler_table.py \
  --runs runs/circuit_surface_d3_t3:surface:3:96:8:bits:3:circuit \
  --runs runs/circuit_surface_d5_t5:surface:5:96:8:bits:5:circuit \
  --runs runs/spacetime_surface_d3_t3:surface:3:96:8:bits:3:phenomenological \
  --runs runs/spacetime_surface_d5_t5:surface:5:96:8:bits:5:phenomenological \
  --ps 0.01 0.02 0.03 --shots 200000 --no-bp \
  --out benchmarks/LER_DETECTOR.md > runs/ler_table_detector.log 2>&1

echo "== kernel ablation attribution (flagship shape) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/probe_kernel_attrib.py --d 11 --batch 4096 --tb 32 \
  --variants base sumrelu+fold+interleave oneslot noslotrelu noln noupdate \
  > runs/probe_ablate_r2.json 2> runs/probe_ablate_r2.err

echo "== TB=64 tile probe (100 MB scoped VMEM attempt) $(date) ==" | tee -a "$LOG"
run_job env TPUGNN_VMEM_LIMIT_MB=100 python benchmarks/probe_kernel_attrib.py \
  --d 11 --batch 4096 --tb 64 --variants base \
  > runs/probe_tb64.json 2> runs/probe_tb64.err

echo "== bench + xprof trace $(date) ==" | tee -a "$LOG"
run_job python bench.py --profile runs/xprof_bench \
  > runs/bench_r2.json 2> runs/bench_r2.err

python benchmarks/collect_results.py 2>> "$LOG" || true
echo "== r2f queue done $(date) ==" | tee -a "$LOG"
