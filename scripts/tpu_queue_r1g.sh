#!/bin/bash
# Round-1 continuation queue, take 7.  Same plan as r1f minus the completed
# d<=9 table, plus a STALL WATCHDOG on the d=11 training: today's run sat
# 50+ minutes inside a wedged relay request (live relay, deaf in-flight
# call), so any attempt whose metrics file stops advancing for 60 min while
# the process is NOT bench-paused gets killed and restarted — train()
# resumes from the latest checkpoint (every 1000 steps), so a restart
# costs at most one checkpoint interval plus a compile.
set -u
cd "$(dirname "$0")/.."
LOG=runs/tpu_queue_r1g.log
PIDFILE=runs/tpu_active.pid
METRICS=runs/v3_surface_d11/metrics.jsonl
echo "== r1g queue start $(date) ==" | tee -a "$LOG"

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

train_d11() {
  local attempt
  for attempt in 1 2 3 4; do
    echo "== d=11 train attempt $attempt $(date) ==" | tee -a "$LOG"
    python benchmarks/train_quality_v3.py --ds 11 --rounds 14 --steps 8000 \
      --remat --ema 0.999 >> runs/train_quality_v3.log 2>&1 &
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
        continue  # bench-paused: not a stall (resumed by the bench/atexit)
      fi
      local now ref age
      now=$(date +%s)
      ref=$(stat -c %Y "$METRICS" 2>/dev/null || echo "$born")
      age=$((now - ref))
      # metrics advance every ~25 min (eval_every=1000 steps); 60 min of
      # silence while alive that long = wedged request -> restart
      if [ "$age" -gt 3600 ] && [ $((now - born)) -gt 3600 ]; then
        echo "== d=11 stalled (metrics idle ${age}s), killing pid $pid ==" \
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
  echo "== d=11 training gave up after 4 attempts $(date) ==" | tee -a "$LOG"
  return 1
}

LER_ARGS_D9=(
  --runs runs/v2_surface_d3:surface:3:64
  --runs runs/v2_surface_d5:surface:5:96
  --runs runs/v3_surface_d7:surface:7:128:10
  --runs runs/v3_surface_d9:surface:9:128:12
)

train_d11

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

echo "== kernel attribution probe (ln1pass/biasfold) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/probe_kernel_attrib.py --variants \
  base sumrelu+fold+interleave sumrelu+fold+interleave+ln1pass \
  sumrelu+fold+interleave+biasfold sumrelu+fold+interleave+ln1pass+biasfold \
  > runs/probe_attrib_r1e.json 2> runs/probe_attrib_r1e.err

echo "== narrow-width kernel hardware check (H=96 padded) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/probe_kernel_attrib.py --variants base \
  --hidden 96 --tb 8 --d 5 --batch 1024 \
  > runs/probe_narrow_h96.json 2> runs/probe_narrow_h96.err

echo "== serving latency sweep d=11 $(date) ==" | tee -a "$LOG"
run_job python benchmarks/serve_latency.py --d 11 \
  > runs/serve_latency_d11.json 2> runs/serve_latency_d11.err

echo "== decoder throughput (UF cpu / BP tpu / GNN) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/decoder_throughput.py \
  > runs/decoder_throughput.json 2> runs/decoder_throughput.err

echo "== FLAGSHIP RESULTS DONE $(date) ==" | tee -a "$LOG"
touch runs/r1g_flagship_done
python benchmarks/collect_results.py 2>> "$LOG" || true

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

echo "== stream quality (spacetime windows) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/stream_quality.py \
  --runs runs/spacetime_surface_d3_t3:surface:3:3:96 \
  --runs runs/spacetime_surface_d5_t5:surface:5:5:96 \
  --commit 1 --ps 0.01 0.02 0.03 --shots 20000 \
  > runs/stream_quality.json 2> runs/stream_quality.err

python benchmarks/collect_results.py 2>> "$LOG" || true
echo "== r1g queue done $(date) ==" | tee -a "$LOG"
