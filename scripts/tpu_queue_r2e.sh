#!/bin/bash
# Round-2 queue E — post-r2d hardware probes (chained after r2d drains):
# the R=8 training-step probe on the optimized kernel-backward path, for a
# like-for-like comparison against the round-1 probe (142.97 ms pallas row
# in runs/probe_train_step.json; VERDICT r1 item 3 asks <= ~90 ms).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/repo/runs/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
LOG=runs/tpu_queue_r2e.log
PIDFILE=runs/tpu_active.pid
echo "== r2e queue start $(date) ==" | tee -a "$LOG"

run_job() {
  "$@" &
  local pid=$!
  echo "$pid" > "$PIDFILE"
  wait "$pid"
  local rc=$?
  rm -f "$PIDFILE"
  return $rc
}

echo "== train-step probe (kernel bwd, R=8, vs 142.97 ms r1 row) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/probe_train_step.py --d 11 --rounds 8 \
  --paths pallas > runs/probe_train_r8_r2e.json 2> runs/probe_train_r8_r2e.err

echo "== tau sweep (cleanup-hybrid confidence gate, d=11) $(date) ==" | tee -a "$LOG"
run_job python benchmarks/tau_sweep.py --ckpt runs/v3_surface_d11 --d 11 \
  --taus 0 0.7 0.9 0.95 0.99 --ps 0.02 0.03 --shots 200000 \
  > runs/tau_sweep_d11.json 2> runs/tau_sweep_d11.err

echo "== TB=64 tile probe (100 MB scoped VMEM attempt) $(date) ==" | tee -a "$LOG"
run_job env TPUGNN_VMEM_LIMIT_MB=100 python benchmarks/probe_kernel_attrib.py \
  --d 11 --batch 4096 --tb 64 --variants base \
  > runs/probe_tb64.json 2> runs/probe_tb64.err

echo "== r2e queue done $(date) ==" | tee -a "$LOG"
