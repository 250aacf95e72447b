#!/bin/bash
# Round-1 continuation queue, take 5.  Hedge against an early round end:
# land a COMPLETE 1M-shot LER table for d<=9 immediately after the d=7 run
# (~20 min), THEN spend hours on the flagship d=11 training, then extend
# the table to d=11 and close with the perf probes.  Circuit/spacetime
# quality runs stay last (pure extras).
#
# Jobs advertise PIDs in runs/tpu_active.pid so benches can pause them
# (tpugnn/utils/hostidle.py); a watchdog resumes jobs left stopped >40 min.
set -u
cd "$(dirname "$0")/.."
LOG=runs/tpu_queue_r1e.log
PIDFILE=runs/tpu_active.pid
echo "== r1e queue start $(date) ==" | tee -a "$LOG"

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

LER_ARGS_D9=(
  --runs runs/v2_surface_d3:surface:3:64
  --runs runs/v2_surface_d5:surface:5:96
  --runs runs/v3_surface_d7:surface:7:128:10
  --runs runs/v3_surface_d9:surface:9:128:12
)

if [ $# -ge 1 ] && [ -n "$1" ]; then
  echo "== waiting for in-flight d=7 run (pid $1) ==" | tee -a "$LOG"
  echo "$1" > "$PIDFILE"
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  rm -f "$PIDFILE"
  echo "== d=7 done $(date) ==" | tee -a "$LOG"
fi

echo "== LER table d=3..9, 1M GNN shots, cached baselines $(date) ==" | tee -a "$LOG"
run_job python benchmarks/ler_table.py "${LER_ARGS_D9[@]}" \
  --shots 1000000 --baseline-cache benchmarks/baseline_ler.jsonl \
  > runs/ler_table_v3_d9.log 2>&1

echo "== v3 train d=11 R=14 (remat, ema) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/train_quality_v3.py --ds 11 --rounds 14 --steps 8000 \
  --remat --ema 0.999 >> runs/train_quality_v3.log 2>&1

echo "== LER table full d=3..11 $(date) ==" | tee -a "$LOG"
run_job python benchmarks/ler_table.py "${LER_ARGS_D9[@]}" \
  --runs runs/v3_surface_d11:surface:11:128:14 \
  --shots 1000000 --baseline-cache benchmarks/baseline_ler.jsonl \
  > runs/ler_table_v3.log 2>&1

echo "== probe_train_step d=11 $(date) ==" | tee -a "$LOG"
run_job python benchmarks/probe_train_step.py --d 11 --batch 4096 --rounds 8 \
  > runs/probe_train_step.json 2> runs/probe_train_step.err

echo "== bench.py (PROD_VARIANTS promoted) $(date) ==" | tee -a "$LOG"
python bench.py > runs/bench_prod_variants.json 2> runs/bench_prod_variants.err

echo "== kernel attribution probe (ln1pass/biasfold candidates) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/probe_kernel_attrib.py --variants \
  base sumrelu+fold+interleave sumrelu+fold+interleave+ln1pass \
  sumrelu+fold+interleave+biasfold sumrelu+fold+interleave+ln1pass+biasfold \
  > runs/probe_attrib_r1e.json 2> runs/probe_attrib_r1e.err

echo "== serving latency sweep d=11 $(date) ==" | tee -a "$LOG"
run_job python benchmarks/serve_latency.py --d 11 \
  > runs/serve_latency_d11.json 2> runs/serve_latency_d11.err

echo "== FLAGSHIP RESULTS DONE $(date) ==" | tee -a "$LOG"
touch runs/r1e_flagship_done

echo "== circuit quality z (d=3:3, 5:5) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/train_quality_circuit.py --specs 3:3 5:5 --steps 4000 \
  --batch 4096 >> runs/train_quality_circuit.log 2>&1

echo "== circuit quality x (d=3:3) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/train_quality_circuit.py --specs 3:3 --sector x \
  --steps 4000 --batch 4096 >> runs/train_quality_circuit.log 2>&1

echo "== spacetime quality (d=3:3, 5:5) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/train_quality_circuit.py --noise phenomenological \
  --specs 3:3 5:5 --steps 4000 --batch 4096 --p 0.02 \
  --eval-ps 0.01 0.02 0.03 >> runs/train_quality_spacetime.log 2>&1

echo "== r1e queue done $(date) ==" | tee -a "$LOG"
