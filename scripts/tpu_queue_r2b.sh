#!/bin/bash
# Round-2 queue B — perf attribution + quality artifacts that need the chip
# AFTER the r2a training/table queue drains (launch via
# scripts/launch_r2b_after_r2a.sh or run directly on an idle host):
#   1. flagship-shape kernel ablation attribution (where do the ~21 non-GEMM
#      ms go: slot GEMMs? slot relu? LN? update MLP?) — VERDICT r1 weak-1
#   2. xprof trace of the production bench (roofline evidence)
#   3. training-step probe on the kernel-bwd path at R=8 and R=14
#   4. decoder throughput incl. the GNN+UF hybrid end-to-end row
#   5. streaming quality with the new GNN+UF window-cleanup column
#   6. circuit-level + spacetime LER table rows vs UF/MWPM
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/repo/runs/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
LOG=runs/tpu_queue_r2b.log
PIDFILE=runs/tpu_active.pid
echo "== r2b queue start $(date) ==" | tee -a "$LOG"

run_job() {
  "$@" &
  local pid=$!
  echo "$pid" > "$PIDFILE"
  wait "$pid"
  local rc=$?
  rm -f "$PIDFILE"
  return $rc
}

echo "== kernel ablation attribution (flagship shape) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/probe_kernel_attrib.py --d 11 --batch 4096 --tb 32 \
  --variants base sumrelu+fold+interleave oneslot noslotrelu noln noupdate \
  > runs/probe_ablate_r2.json 2> runs/probe_ablate_r2.err

echo "== bench + xprof trace $(date) ==" | tee -a "$LOG"
run_job python bench.py --profile runs/xprof_bench \
  > runs/bench_r2.json 2> runs/bench_r2.err

echo "== train-step probe (kernel bwd, R=8 + R=14) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/probe_train_step.py --d 11 --rounds 8 \
  --paths pallas pallas-xla > runs/probe_train_r8.json 2> runs/probe_train_r8.err
run_job python benchmarks/probe_train_step.py --d 11 --rounds 14 \
  --paths pallas > runs/probe_train_r14.json 2> runs/probe_train_r14.err

echo "== decoder throughput (incl. GNN+UF hybrid) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/decoder_throughput.py --measure-gnn \
  --hybrid-ckpt runs/v3_surface_d11 --hybrid-spec 128:14 \
  > runs/decoder_throughput.json 2> runs/decoder_throughput.err

echo "== streaming quality (gnn_uf_stream column) $(date) ==" | tee -a "$LOG"
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

echo "== serve latency (d=11, refreshed engine) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/serve_latency.py --d 11 \
  > runs/serve_latency_d11.json 2> runs/serve_latency_d11.err

python benchmarks/collect_results.py 2>> "$LOG" || true
echo "== r2b queue done $(date) ==" | tee -a "$LOG"
