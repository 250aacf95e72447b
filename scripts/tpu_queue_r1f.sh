#!/bin/bash
# Round-1 continuation queue, take 6 (final).  The round clock is ~3h from
# its 12h mark, so land artifacts in strict value order:
#   1. d<=9 1M-shot LER table (the morning attempt died on the narrow-width
#      Mosaic limit, since fixed) — ~20 min, committed well before the bell;
#   2. flagship d=11 training, RESUMED from its step-1000 checkpoint, to
#      8000 steps (survives the bell: checkpoints every 1000, the driver's
#      end-of-round bench pauses it via runs/tpu_active.pid);
#   3. full d=3..11 table + perf probes + serving/streaming/circuit extras
#      for whatever time remains.
set -u
cd "$(dirname "$0")/.."
LOG=runs/tpu_queue_r1f.log
PIDFILE=runs/tpu_active.pid
echo "== r1f queue start $(date) ==" | tee -a "$LOG"

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

echo "== LER table d=3..9, 1M GNN shots $(date) ==" | tee -a "$LOG"
run_job python benchmarks/ler_table.py "${LER_ARGS_D9[@]}" \
  --shots 1000000 --baseline-cache benchmarks/baseline_ler.jsonl \
  > runs/ler_table_v3_d9.log 2>&1

echo "== v3 train d=11 R=14 resume -> 8000 (remat, ema) $(date) ==" | tee -a "$LOG"
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
touch runs/r1f_flagship_done

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

echo "== r1f queue done $(date) ==" | tee -a "$LOG"
