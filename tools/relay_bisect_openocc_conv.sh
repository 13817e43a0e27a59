#!/bin/bash
# Pinpoint the stage-3 conv that kills the TPU worker + A/B the
# alternative z lowerings as fix candidates.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/relay_bisect_conv.log
echo "=== conv bisect start $(date) HEAD=$(git rev-parse --short HEAD)" >> $LOG
run() {
  timeout 1800 env $2 python tools/repro_openocc_sem.py --mode $1 \
    > /tmp/repro_conv_$3.log 2>&1
  rc=$?
  echo "=== $3 rc=$rc $(date)" >> $LOG
  grep -E "RUN OK|UNAVAILABLE|Error" /tmp/repro_conv_$3.log | tail -2 >> $LOG
  if [ $rc -ne 0 ]; then sleep 180; fi
}
run c31 "X=1" c31
run c32 "X=1" c32
run ds3 "X=1" ds3
run c31 "COOCC_ZSLICE_TAP=1" c31_zslice
run c32 "COOCC_ZSLICE_TAP=1" c32_zslice
run c31 "COOCC_ZPAD_STACK=1" c31_zpad
run c32 "COOCC_ZPAD_STACK=1" c32_zpad
echo "=== conv bisect complete $(date)" >> $LOG
