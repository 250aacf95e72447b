#!/bin/bash
# Round-1 continuation queue, take 4 — reordered so the flagship results
# (d=11 training, 1M-shot LER table, train-step probe, final bench) land
# BEFORE the nice-to-have circuit/spacetime quality runs: the round may end
# while this queue is still draining, and the committed artifacts must
# already contain the headline results when it does.
#
# Every job advertises its PID in runs/tpu_active.pid so any bench started
# meanwhile (including the driver's end-of-round `python bench.py`) can
# SIGSTOP it and measure an idle host (tpugnn/utils/hostidle.py).  A
# watchdog resumes jobs left stopped > 40 min (crash-safety: a killed bench
# must not freeze the queue forever).
set -u
cd "$(dirname "$0")/.."
LOG=runs/tpu_queue_r1d.log
PIDFILE=runs/tpu_active.pid
echo "== r1d queue start $(date) ==" | tee -a "$LOG"

run_job() {
  # run "$@" with its PID advertised; tolerate SIGSTOP/SIGCONT from benches
  "$@" &
  local pid=$!
  echo "$pid" > "$PIDFILE"
  # watchdog: resume if something stops the job and never resumes it
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

if [ $# -ge 1 ] && [ -n "$1" ]; then
  echo "== waiting for in-flight d=7 run (pid $1) ==" | tee -a "$LOG"
  echo "$1" > "$PIDFILE"
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  rm -f "$PIDFILE"
  echo "== d=7 done $(date) ==" | tee -a "$LOG"
fi

echo "== v3 train d=11 R=14 (remat) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/train_quality_v3.py --ds 11 --rounds 14 --steps 8000 \
  --remat >> runs/train_quality_v3.log 2>&1

echo "== LER table d=3..11, 1M GNN shots, cached baselines $(date) ==" | tee -a "$LOG"
run_job python benchmarks/ler_table.py \
  --runs runs/v2_surface_d3:surface:3:64 \
  --runs runs/v2_surface_d5:surface:5:96 \
  --runs runs/v3_surface_d7:surface:7:128:10 \
  --runs runs/v3_surface_d9:surface:9:128:12 \
  --runs runs/v3_surface_d11:surface:11:128:14 \
  --shots 1000000 --baseline-cache benchmarks/baseline_ler.jsonl \
  > runs/ler_table_v3.log 2>&1

echo "== probe_train_step d=11 $(date) ==" | tee -a "$LOG"
run_job python benchmarks/probe_train_step.py --d 11 --batch 4096 --rounds 8 \
  > runs/probe_train_step.json 2> runs/probe_train_step.err

echo "== bench.py (PROD_VARIANTS promoted) $(date) ==" | tee -a "$LOG"
python bench.py > runs/bench_prod_variants.json 2> runs/bench_prod_variants.err

echo "== FLAGSHIP RESULTS DONE $(date) ==" | tee -a "$LOG"
touch runs/r1d_flagship_done

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

echo "== r1d queue done $(date) ==" | tee -a "$LOG"
