#!/bin/bash
# Post-v3 TPU work queue: waits for the flagship training (pid $1) to exit,
# then runs the kernel attribution probe and the detector-graph quality
# runs back-to-back on the idle chip.  Logs under runs/.
set -u
PID=${1:?usage: tpu_queue_r1.sh <v3_pid>}
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "== v3 training done $(date) ==" | tee runs/tpu_queue.log

echo "== kernel attribution probe ==" | tee -a runs/tpu_queue.log
python benchmarks/probe_kernel_attrib.py >> runs/tpu_queue.log 2>&1

echo "== circuit quality z (d=3:3, 5:5) ==" | tee -a runs/tpu_queue.log
python benchmarks/train_quality_circuit.py --specs 3:3 5:5 --steps 4000 \
  --batch 4096 >> runs/train_quality_circuit.log 2>&1

echo "== circuit quality x (d=3:3) ==" | tee -a runs/tpu_queue.log
python benchmarks/train_quality_circuit.py --specs 3:3 --sector x \
  --steps 4000 --batch 4096 >> runs/train_quality_circuit.log 2>&1

echo "== spacetime quality (d=3:3, 5:5) ==" | tee -a runs/tpu_queue.log
python benchmarks/train_quality_circuit.py --noise phenomenological \
  --specs 3:3 5:5 --steps 4000 --batch 4096 --p 0.02 \
  --eval-ps 0.01 0.02 0.03 >> runs/train_quality_spacetime.log 2>&1

echo "== queue done $(date) ==" | tee -a runs/tpu_queue.log
