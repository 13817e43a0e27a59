#!/bin/bash
# Multi-host evaluation launcher (reference: tools/dist_test.sh). Each host
# runs one process; per-host eval shards are summed cross-process
# (coocc_tpu/parallel/distributed.py:allgather_metrics).
#
# Usage on each host:
#   MASTER_ADDR=<host0> MASTER_PORT=29500 \
#     bash tools/dist_test.sh CONFIG WORK_DIR $NPROCS $PROC_ID [args...]
CONFIG=$1
WORK_DIR=$2
NPROCS=${3:-1}
PROC_ID=${4:-0}
PORT=${MASTER_PORT:-29500}
ADDR=${MASTER_ADDR:-127.0.0.1}
shift 4 || shift $#

JAX_COORDINATOR="$ADDR:$PORT" NUM_PROCESSES="$NPROCS" PROCESS_ID="$PROC_ID" \
  exec python "$(dirname "$0")/test.py" "$CONFIG" "$WORK_DIR" "$@"
