#!/bin/bash
# Retry a TPU script until the axon tunnel is reachable (backend init no
# longer raises Unavailable). Usage: tpu_retry.sh <log> <cmd...>
LOG="$1"; shift
for i in $(seq 1 60); do
  echo "=== attempt $i $(date -u +%H:%M:%S)" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then echo "=== SUCCESS rc=0" >> "$LOG"; exit 0; fi
  if ! grep -q "Unable to initialize backend" "$LOG"; then
    echo "=== FAILED rc=$rc (not a backend-init error; stopping)" >> "$LOG"
    exit $rc
  fi
  # backend-unavailable: clear the marker so the next grep is fresh, wait
  sed -i 's/Unable to initialize backend/UNAVAILABLE-RETRIED backend/' "$LOG"
  sleep 240
done
echo "=== gave up after 60 attempts" >> "$LOG"
exit 1
