#!/bin/bash
# Unattended TPU measurement sequence, round 5, part A.
#
# Evidence this produces (VERDICT round-4 "do this" #1/#2/#3):
#   * real-shape compile + timed eval forward for the four never-run
#     configs (coocc_lidar, coocc_cam_r101_896x1600,
#     coocc_multi_r101_896x1600, coocc_multi_r101_openoccupancy) —
#     the per-config proof table
#   * a valid render rays/sec number from the rewritten scanned-K tool
#   * the COOCC_SUBM_SPLIT on-chip A/B (ext vs split packed SubM conv)
# Part B (flagship 5-run distribution + train step) runs at the FINAL
# round-5 HEAD after any perf work these results motivate.
# Serialized (1-core host); never kills a client mid-compile.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/relay_session_r5a.log
echo "=== relay session r5a start $(date) HEAD=$(git rev-parse --short HEAD)" >> $LOG

# 1. probe until the relay answers (tiny matmul, 10 min per attempt)
until timeout 600 python - >> $LOG 2>&1 <<'EOF'
import jax, time
import jax.numpy as jnp
t0 = time.perf_counter()
d = jax.devices()
x = jnp.ones((1024, 1024), jnp.bfloat16)
print("probe ok:", d, float(jax.jit(lambda a: (a @ a).sum())(x)),
      f"{time.perf_counter()-t0:.1f}s", flush=True)
EOF
do
  echo "probe failed $(date), retrying in 120s" >> $LOG
  sleep 120
done

echo "=== relay alive $(date)" >> $LOG

# 2. per-config real-shape proofs, smallest graph first (coocc_lidar probes
#    the relay cheaply; openoccupancy last — the most likely to OOM, and an
#    OOM through the relay can wedge it for a while)
for CFG in coocc_lidar coocc_cam_r101_896x1600 coocc_multi_r101_896x1600 coocc_multi_r101_openoccupancy; do
  timeout 3600 env BENCH_CONFIG=$CFG python bench.py > /tmp/bench_r5_$CFG.json 2>> $LOG
  rc=$?
  echo "=== bench $CFG done rc=$rc $(date)" >> $LOG
  cat /tmp/bench_r5_$CFG.json >> $LOG 2>/dev/null
done

# 3. render rays/sec (rewritten tool: scanned-K marginal, loud failure)
timeout 1800 python tools/bench_render.py > /tmp/bench_r5_render.json 2>> $LOG
echo "=== bench_render done rc=$? $(date)" >> $LOG
cat /tmp/bench_r5_render.json >> $LOG 2>/dev/null

# 4. packed SubM ext-vs-split A/B (hardened: distinct masks per rep)
timeout 3600 python tools/ab_subm_split.py > /tmp/ab_r5_subm.json 2>> $LOG
echo "=== ab_subm_split done rc=$? $(date)" >> $LOG
cat /tmp/ab_r5_subm.json >> $LOG 2>/dev/null

echo "=== relay session r5a complete $(date)" >> $LOG
