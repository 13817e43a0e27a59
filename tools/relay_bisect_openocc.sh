#!/bin/bash
# Bisect the coocc_multi_r101_openoccupancy TPU-worker crash (round 5).
#
# bench.py's full eval forward crashed the TPU worker at this config's
# real shapes (relay_session_r5a.log: UNAVAILABLE on the warm call;
# jit_init succeeded). Run each stop_at prefix of the REAL model in its
# own process: the first prefix that kills the worker names the stage.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/relay_bisect_openocc.log
echo "=== bisect start $(date) HEAD=$(git rev-parse --short HEAD)" >> $LOG
for STAGE in img pts fuse sem coarse full; do
  timeout 3600 python tools/profile_prefix.py coocc_multi_r101_openoccupancy \
    --stages $STAGE > /tmp/bisect_openocc_$STAGE.log 2>&1
  rc=$?
  echo "=== stage $STAGE rc=$rc $(date)" >> $LOG
  tail -6 /tmp/bisect_openocc_$STAGE.log >> $LOG
  # give a crashed worker time to restart before the next probe
  if [ $rc -ne 0 ]; then sleep 180; fi
done
echo "=== bisect complete $(date)" >> $LOG
