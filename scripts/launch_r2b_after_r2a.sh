#!/bin/bash
# Wait for the r2a queue (by PID of its bash) to drain, then run r2b.
#   bash scripts/launch_r2b_after_r2a.sh <r2a_bash_pid>
set -u
cd "$(dirname "$0")/.."
R2A_PID=${1:?usage: launch_r2b_after_r2a.sh <r2a_bash_pid>}
while kill -0 "$R2A_PID" 2>/dev/null; do
  sleep 120
done
echo "r2a (pid $R2A_PID) drained; starting r2b at $(date)"
exec bash scripts/tpu_queue_r2b.sh
