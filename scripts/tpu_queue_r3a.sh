#!/bin/bash
# Round-3 queue A — runs AFTER the r2f queue drains (the launcher waits on
# the r2f bash PID).  Stages in value order; every artifact is resumable:
#   1. d=11 p=0.01 at 100M shots (EMA ckpt): the 10M run left best-of /
#      UF / MWPM all at 0 (< 3e-7) — 100M resolves them [VERDICT item 2]
#   2. deployed-decoder throughput on the real chip: GNN forward +
#      best-of exact/lazy end-to-end rows [VERDICT task 4]
#   3. serve latency
#   4. STRETCH (interruptible): resume the d=11 flagship +16k steps on the
#      new TB=8@112MB training tile (227.8 ms/step) toward the pure-GNN
#      (no-cleanup) <= MWPM goal [VERDICT task 6]; checkpoints save
#      continuously, so a round-end cutoff loses nothing
#   5. 1M LER re-eval of the extended ckpt + parity check + rebuild
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/repo/runs/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
LOG=runs/tpu_queue_r3a.log
PIDFILE=runs/tpu_active.pid
echo "== r3a queue start $(date) ==" | tee -a "$LOG"

run_job() {
  "$@" &
  local pid=$!
  echo "$pid" > "$PIDFILE"
  (
    while kill -0 "$pid" 2>/dev/null; do
      state=$(awk '{print $3}' /proc/"$pid"/stat 2>/dev/null || echo R)
      if [ "$state" = "T" ]; then
        stopped=$((${stopped:-0} + 60))
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

echo "== d=11 p=0.01 at 100M shots (EMA ckpt) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/ler_table.py \
  --runs runs/v3_surface_d11/ema:surface:11:128:14 \
  --ps 0.01 --shots 100000000 --no-bp \
  --baseline-cache benchmarks/baseline_ler.jsonl \
  --out benchmarks/LER_D11_P001.md > runs/ler_d11_p001_100m.log 2>&1

echo "== deployed-decoder throughput (best-of e2e, exact+lazy) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/decoder_throughput.py --measure-gnn \
  --hybrid-ckpt runs/v3_surface_d11 --hybrid-spec 128:14 --p 0.02 \
  > runs/decoder_throughput_r3.json 2> runs/decoder_throughput_r3.err

echo "== serve latency $(date) ==" | tee -a "$LOG"
run_job python benchmarks/serve_latency.py \
  > runs/serve_latency_r3.json 2> runs/serve_latency_r3.err || true

echo "== circuit z d=5:5 retrain (remat — the r2f stage OOMed 16G HBM) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/train_quality_circuit.py --specs 5:5 --steps 4000 \
  --batch 4096 >> runs/train_quality_circuit.log 2>&1

echo "== circuit d=5 detector LER rows (resumable rows cache) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/ler_table.py \
  --runs runs/circuit_surface_d5_t5:surface:5:96:8:bits:5:circuit \
  --ps 0.01 0.02 0.03 --shots 200000 --no-bp \
  --out benchmarks/LER_DETECTOR.md > runs/ler_table_detector_d5.log 2>&1

echo "== STRETCH: d=11 resume +16k steps (kernel bwd, TB=8@112MB) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/train_quality_v3.py --ds 11 --rounds 14 \
  --steps 40000 --backend pallas --dtype bfloat16 --ema 0.999 \
  --p-mix 0.01 0.05 --lr 0.0001 >> runs/train_quality_v3.log 2>&1

echo "== 1M LER re-eval of extended ckpt $(date) ==" | tee -a "$LOG"
run_job python benchmarks/ler_table.py \
  --runs runs/v3_surface_d11:surface:11:128:14 \
  --runs runs/v3_surface_d11/ema:surface:11:128:14 \
  --shots 1000000 --baseline-cache benchmarks/baseline_ler.jsonl \
  > runs/ler_table_r3.log 2>&1
python benchmarks/ler_table.py --rebuild --runs dummy 2>> "$LOG" || true
python benchmarks/check_parity.py 2>&1 | tee -a "$LOG" || true
python benchmarks/collect_results.py 2>> "$LOG" || true
echo "== r3a queue done $(date) ==" | tee -a "$LOG"
