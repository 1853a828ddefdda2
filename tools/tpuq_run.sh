#!/bin/bash
# Serial TPU job queue for the single tunneled chip (CLAUDE.md: never two
# jax TPU processes at once). Runs /tmp/tpuq/jobs/*.sh in lexical order,
# one at a time, logging to /tmp/tpuq/logs/<job>.out and appending
# start/done lines (with rc) to /tmp/tpuq/queue.log.
#
# Deadline is duration-aware (round-4 verdict: a ~50-min job started 31 s
# before the deadline kept the chip busy through the driver's bench
# window). Each job declares its budget with a `# tpuq-minutes: N` header
# line (default 60); a job is only started if start + budget <= deadline.
# Jobs that don't fit are skipped (a shorter later job may still fit);
# when nothing fits the runner exits.
#
# Stop conditions, checked between jobs:
#   - /tmp/tpuq/stop exists
#   - past the deadline in /tmp/tpuq/deadline (epoch seconds), if present
#
# Jobs run with `set -e` semantics themselves (they are bash scripts);
# a nonzero rc is recorded but does not stop the queue.
Q=/tmp/tpuq
mkdir -p "$Q/jobs" "$Q/logs" "$Q/done" "$Q/skipped"
echo "[tpuq] runner start $(date -u +%FT%T)" >> "$Q/queue.log"
while true; do
  if [ -e "$Q/stop" ]; then
    echo "[tpuq] stop file seen $(date -u +%FT%T)" >> "$Q/queue.log"; break
  fi
  deadline=""
  [ -f "$Q/deadline" ] && deadline=$(cat "$Q/deadline")
  if [ -n "$deadline" ] && [ "$(date +%s)" -ge "$deadline" ]; then
    echo "[tpuq] deadline passed $(date -u +%FT%T)" >> "$Q/queue.log"; break
  fi
  job=""
  for cand in $(ls "$Q/jobs" 2>/dev/null | sort); do
    mins=$(sed -n 's/^# tpuq-minutes: *\([0-9]*\).*/\1/p' "$Q/jobs/$cand" | head -1)
    [ -z "$mins" ] && mins=60
    if [ -n "$deadline" ] && [ $(( $(date +%s) + mins * 60 )) -gt "$deadline" ]; then
      echo "[tpuq] skip $cand (budget ${mins}m crosses deadline) $(date -u +%FT%T)" >> "$Q/queue.log"
      mv "$Q/jobs/$cand" "$Q/skipped/$cand"
      continue
    fi
    job=$cand; break
  done
  if [ -z "$job" ]; then sleep 20; continue; fi
  mv "$Q/jobs/$job" "$Q/running_$job"
  echo "[tpuq] start $job $(date -u +%FT%T)" >> "$Q/queue.log"
  bash "$Q/running_$job" > "$Q/logs/$job.out" 2>&1
  rc=$?
  echo "[tpuq] done $job rc=$rc $(date -u +%FT%T)" >> "$Q/queue.log"
  mv "$Q/running_$job" "$Q/done/$job"
done
echo "[tpuq] runner exit $(date -u +%FT%T)" >> "$Q/queue.log"
