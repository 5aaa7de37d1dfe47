#!/bin/bash
# Post-queue chip work for round 2: once the RESULTS suite queue (pid $1)
# exits, A/B the packed kNN selection variant against the incumbent
# two_pass at the engine level, then refresh the headline benchmark for
# all five model families.  Logs to /tmp; results are committed by the
# interactive session after reading the logs (no blind commits here).
#
# Usage: scripts/r2_after_queue.sh WAIT_PID
cd "$(dirname "$0")/.." || exit 1
WAIT_PID=${1:?usage: r2_after_queue.sh WAIT_PID}

echo "[after] waiting for queue pid $WAIT_PID"
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
echo "[after] queue done; probing tunnel"
bash scripts/tpu_probe.sh

echo "[after] kNN selection A/B: two_pass vs packed"
bash scripts/knn_select_ab.sh /tmp/knn_ab_packed.log two_pass packed

echo "[after] full-model headline bench"
timeout 2400 python bench.py > /tmp/bench_r02.log 2>&1 \
  || echo "[after] bench FAILED"
echo "[after] ALL DONE"
