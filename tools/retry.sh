#!/bin/bash
# Retry wrapper for the chip tools' rc=7 contract (wedged device session
# init / fragmented HBM arena): relaunch up to N times, any other rc is
# final.  Usage: tools/retry.sh <max_tries> <cmd...>
MAX=$1; shift
for i in $(seq 1 "$MAX"); do
  "$@"; rc=$?
  if [ $rc -ne 7 ]; then exit $rc; fi
  echo "retry.sh: attempt $i exited rc=7, relaunching" >&2
  sleep 5
done
exit 7
