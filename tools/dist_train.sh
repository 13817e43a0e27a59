#!/bin/bash
# Multi-host data-parallel training launcher (reference: tools/dist_train.sh
# wrapping torch.distributed.launch; here each HOST runs one process and
# jax.distributed coordinates them — see coocc_tpu/parallel/distributed.py).
#
# Usage: CONFIG [NPROCS] [PROC_ID] — on each host:
#   MASTER_ADDR=<host0> MASTER_PORT=29500 \
#     bash tools/dist_train.sh coocc_multi_r50_256x704 $NPROCS $PROC_ID [args...]
CONFIG=$1
NPROCS=${2:-1}
PROC_ID=${3:-0}
PORT=${MASTER_PORT:-29500}
ADDR=${MASTER_ADDR:-127.0.0.1}
shift 3 || shift $#

exec python "$(dirname "$0")/train.py" "$CONFIG" \
  --dist-coordinator "$ADDR:$PORT" \
  --dist-num-processes "$NPROCS" \
  --dist-process-id "$PROC_ID" \
  "$@"
