#!/bin/bash
# Round-5 queue switch: when r5_queue.sh finishes dgcnn tables (detected by
# the moment it starts pointconv's tables_suite, i.e. /tmp/r5_tables_
# pointconv.log appears — dgcnn's RESULTS.md/evidence commits are complete
# by then), stop the part-1 queue via pid-descent (NO pattern kills) and
# start r5_queue2.sh, which runs gcnn interactions before pointconv.
# Polls every 60 s; gives up after MAX_WAIT_MIN.
cd "$(dirname "$0")/.." || exit 1
MAX_WAIT_MIN=${1:-360}
log() { echo "[switch $(date +%H:%M:%S)] $*"; }

# a marker left by any earlier run would fire the switch instantly and kill
# part 1 mid-dgcnn — the boundary signal must be created by THIS round
rm -f /tmp/r5_tables_pointconv.log

for i in $(seq "$MAX_WAIT_MIN"); do
  [ -f /tmp/r5_tables_pointconv.log ] && break
  sleep 60
done
if [ ! -f /tmp/r5_tables_pointconv.log ]; then
  log "boundary never reached in ${MAX_WAIT_MIN} min; leaving queue alone"
  exit 1
fi

QP=$(cat /tmp/r5_queue.pid 2>/dev/null)
if [ -n "$QP" ]; then
  all=""
  frontier="$QP"
  while [ -n "$(echo $frontier | tr -d ' ')" ]; do
    next=""
    for p in $frontier; do
      next="$next $(ps -o pid= --ppid "$p" 2>/dev/null | tr '\n' ' ')"
    done
    all="$all $frontier"
    frontier="$next"
  done
  log "stopping part-1 queue tree:$all"
  kill $all 2>/dev/null
  sleep 3
  kill -9 $all 2>/dev/null
fi
sleep 2
nohup bash scripts/r5_queue2.sh all > /tmp/r5_queue2.log 2>&1 &
echo $! > /tmp/r5_queue.pid
log "part-2 queue started (pid $(cat /tmp/r5_queue.pid))"
