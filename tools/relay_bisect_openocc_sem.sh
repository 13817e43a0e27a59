#!/bin/bash
# Sub-bisect the openoccupancy semantic-stage TPU-worker crash: one
# repro_openocc_sem.py mode per process (a worker kill names the part).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/relay_bisect_sem.log
echo "=== sem bisect start $(date) HEAD=$(git rev-parse --short HEAD)" >> $LOG
for MODE in proj s0 s1 s2 s3 s3n fpn; do
  timeout 2400 python tools/repro_openocc_sem.py --mode $MODE \
    > /tmp/repro_sem_$MODE.log 2>&1
  rc=$?
  echo "=== mode $MODE rc=$rc $(date)" >> $LOG
  grep -E "RUN OK|init ok|Error|UNAVAILABLE" /tmp/repro_sem_$MODE.log | tail -3 >> $LOG
  if [ $rc -ne 0 ]; then sleep 180; fi
done
echo "=== sem bisect complete $(date)" >> $LOG
