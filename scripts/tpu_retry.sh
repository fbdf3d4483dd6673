#!/bin/bash
# Retry a TPU script until the axon tunnel is reachable (backend init no
# longer raises Unavailable). Usage: tpu_retry.sh <log> <cmd...>
# Each attempt's output goes to its own temp file first, so a stale
# backend-init marker from a previous attempt/invocation can never
# misclassify an unrelated failure as retryable.
LOG="$1"; shift
for i in $(seq 1 60); do
  ATT=$(mktemp)
  echo "=== attempt $i $(date -u +%H:%M:%S)" >> "$LOG"
  "$@" > "$ATT" 2>&1
  rc=$?
  cat "$ATT" >> "$LOG"
  if [ $rc -eq 0 ]; then rm -f "$ATT"; echo "=== SUCCESS rc=0" >> "$LOG"; exit 0; fi
  # Retryable only when the FINAL traceback is the backend-init failure —
  # a tolerated child probe printing the string mid-run must not loop us.
  # 80 lines: chained tracebacks put the marker in the __cause__ section
  # above a >20-line outer traceback plus atexit/log noise (review r5).
  if ! tail -n 80 "$ATT" | grep -q "Unable to initialize backend"; then
    rm -f "$ATT"
    echo "=== FAILED rc=$rc (not a backend-init error; stopping)" >> "$LOG"
    exit $rc
  fi
  rm -f "$ATT"
  sleep 240
done
echo "=== gave up after 60 attempts" >> "$LOG"
exit 1
