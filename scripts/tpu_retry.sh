#!/bin/bash
# usage: tpu_retry.sh <log> <cmd...>  — retries up to 3x if the client dies silently
LOG=$1; shift
for i in 1 2 3; do
  "$@" >> "$LOG" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then echo "TPU_RETRY_DONE rc=0 try=$i" >> "$LOG"; exit 0; fi
  echo "TPU_RETRY try=$i rc=$rc; sleeping" >> "$LOG"; sleep 20
done
echo "TPU_RETRY_DONE rc=$rc" >> "$LOG"
