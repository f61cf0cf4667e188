#!/bin/bash
# Persistent wrapper for round5_batch.sh: the probe retry-loop inside the
# batch handles short outages; this wrapper handles LONG ones (the tunnel
# has been down >11 h before, CLAUDE.md) by re-attempting the whole batch
# with a cooldown until it completes or the deadline passes. Run detached
# (nohup setsid) so it survives the caller.
set -u
cd "$(dirname "$0")/.."
LOG="${LOG:-/tmp/r5_batch.log}"
DEADLINE=$(( $(date +%s) + ${DEADLINE_S:-28800} ))
LEGS="${LEGS:-tail128 feA feB tail order orderf64 fmg2dd overlap bench}"

attempt=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  attempt=$((attempt + 1))
  echo "=== batch attempt $attempt $(date -u +%H:%M:%S) legs: $LEGS ===" >> "$LOG"
  # shellcheck disable=SC2086
  bash scripts/round5_batch.sh $LEGS >> "$LOG" 2>&1
  rc=$?
  if [ "$rc" -eq 0 ] && ! tail -n 50 "$LOG" | grep -q "TUNNEL DOWN"; then
    echo "=== persistent wrapper: batch completed ===" >> "$LOG"
    exit 0
  fi
  echo "=== attempt $attempt ended rc=$rc; cooling 900s ===" >> "$LOG"
  sleep 900
done
echo "=== persistent wrapper: deadline reached ===" >> "$LOG"
