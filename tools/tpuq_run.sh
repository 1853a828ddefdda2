#!/bin/bash
# Serial TPU job queue for the single tunneled chip (CLAUDE.md: never two
# jax TPU processes at once). Runs /tmp/tpuq/jobs/*.sh in lexical order,
# one at a time, logging to /tmp/tpuq/logs/<job>.out and appending
# start/done lines (with rc) to /tmp/tpuq/queue.log.
#
# Stop conditions, checked between jobs:
#   - /tmp/tpuq/stop exists
#   - past the deadline in /tmp/tpuq/deadline (epoch seconds), if present
#
# Jobs run with `set -e` semantics themselves (they are bash scripts);
# a nonzero rc is recorded but does not stop the queue.
Q=/tmp/tpuq
mkdir -p "$Q/jobs" "$Q/logs" "$Q/done"
echo "[tpuq] runner start $(date -u +%FT%T)" >> "$Q/queue.log"
while true; do
  if [ -e "$Q/stop" ]; then
    echo "[tpuq] stop file seen $(date -u +%FT%T)" >> "$Q/queue.log"; break
  fi
  if [ -f "$Q/deadline" ] && [ "$(date +%s)" -ge "$(cat "$Q/deadline")" ]; then
    echo "[tpuq] deadline passed $(date -u +%FT%T)" >> "$Q/queue.log"; break
  fi
  job=$(ls "$Q/jobs" 2>/dev/null | sort | head -1)
  if [ -z "$job" ]; then sleep 20; continue; fi
  mv "$Q/jobs/$job" "$Q/running_$job"
  echo "[tpuq] start $job $(date -u +%FT%T)" >> "$Q/queue.log"
  bash "$Q/running_$job" > "$Q/logs/$job.out" 2>&1
  rc=$?
  echo "[tpuq] done $job rc=$rc $(date -u +%FT%T)" >> "$Q/queue.log"
  mv "$Q/running_$job" "$Q/done/$job"
done
echo "[tpuq] runner exit $(date -u +%FT%T)" >> "$Q/queue.log"
