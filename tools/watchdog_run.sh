#!/bin/bash
# Stall watchdog for restart-safe protocol drivers.
#
# This environment's tunneled TPU backend has a known failure mode (observed
# three times across rounds 4-5, documented in BASELINE.md): an in-flight RPC
# goes stale and the client futex-waits forever at ~3% CPU while a FRESH
# client probe reaches the chip fine. The framework's crash-only contract
# (save-before-validate checkpoints + resume catch-up, matching the
# reference's /root/reference/src/Trainer01.py resume semantics) makes
# kill + re-invoke the designed recovery; this script automates it.
#
# Usage: tools/watchdog_run.sh <logfile> <stall_secs> <cmd> [args...]
#   Appends the command's output to <logfile>; if the log goes silent for
#   longer than <stall_secs>, kills that specific PID (never pattern-kills)
#   and re-invokes. Exits 0 when the command completes rc=0.

LOG="$1"; STALL="$2"; shift 2

for attempt in $(seq 1 20); do
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  echo "watchdog: attempt $attempt pid $PID $(date -u +%H:%M:%S)" >> "$LOG"
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    if [ $((now - mt)) -gt "$STALL" ]; then
      echo "watchdog: log silent $((now - mt))s > ${STALL}s, killing $PID" >> "$LOG"
      kill -9 "$PID" 2>/dev/null
      sleep 5
      break
    fi
  done
  wait "$PID"
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "watchdog: completed rc=0 after $attempt attempt(s)" >> "$LOG"
    exit 0
  fi
  echo "watchdog: rc=$rc, re-invoking (resume from last checkpoint)" >> "$LOG"
  sleep 5
done
echo "watchdog: attempts exhausted" >> "$LOG"
exit 1
