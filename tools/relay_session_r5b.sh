#!/bin/bash
# Unattended TPU measurement sequence, round 5, part B — runs at the
# FINAL round-5 HEAD (after perf work motivated by part A).
#
# Evidence this produces (VERDICT round-4 "do this" #2/#3/#4):
#   * the 5-run bench.py distribution at one HEAD (gate: MINIMUM >= 1.0
#     vs baseline, target >= 1.2)
#   * B=2 cross-check + stage-by-stage B=2 attribution (profile_prefix
#     --batch 2) for the per-frame regression
#   * train-step scanned-K marginal + fwd+bwd stage attribution
#     (profile_train) for the backward breakdown
#   * coocc_lidar stage profile (0.466 fps at real shapes needs a cause)
# Serialized (1-core host); never kills a client mid-compile.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/relay_session_r5b.log
echo "=== relay session r5b start $(date) HEAD=$(git rev-parse --short HEAD)" >> $LOG

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

# 1. flagship 5-run distribution
for i in 1 2 3 4 5; do
  timeout 3600 python bench.py > /tmp/bench_r5b_run$i.json 2>> $LOG
  echo "=== bench run $i done rc=$? $(date)" >> $LOG
  cat /tmp/bench_r5b_run$i.json >> $LOG 2>/dev/null
done

# 2. B=2 cross-check + attribution
timeout 3600 env BENCH_BATCH=2 python bench.py > /tmp/bench_r5b_b2.json 2>> $LOG
echo "=== bench B=2 done rc=$? $(date)" >> $LOG
cat /tmp/bench_r5b_b2.json >> $LOG 2>/dev/null
timeout 3600 python tools/profile_prefix.py --batch 2 > /tmp/prefix_r5b_b2.log 2>&1
echo "=== profile_prefix B=2 done rc=$? $(date)" >> $LOG
tail -12 /tmp/prefix_r5b_b2.log >> $LOG 2>/dev/null

# 3. coocc_lidar attribution (real-shape 0.466 fps from part A)
timeout 3600 python tools/profile_prefix.py coocc_lidar --stages pts,sem,coarse,full > /tmp/prefix_r5b_lidar.log 2>&1
echo "=== profile_prefix lidar done rc=$? $(date)" >> $LOG
tail -12 /tmp/prefix_r5b_lidar.log >> $LOG 2>/dev/null

# 4. train step: scanned marginal + fwd+bwd stage attribution
timeout 3600 python tools/bench_train.py --config tiny > /tmp/bench_r5b_train_tiny.json 2>> $LOG
echo "=== bench_train tiny done rc=$? $(date)" >> $LOG
cat /tmp/bench_r5b_train_tiny.json >> $LOG 2>/dev/null
timeout 5400 python tools/bench_train.py --scan-only > /tmp/bench_r5b_train.json 2>> $LOG
echo "=== bench_train flagship done rc=$? $(date)" >> $LOG
cat /tmp/bench_r5b_train.json >> $LOG 2>/dev/null
timeout 5400 python tools/profile_train.py > /tmp/train_prof_r5b.log 2>&1
echo "=== profile_train done rc=$? $(date)" >> $LOG
tail -15 /tmp/train_prof_r5b.log >> $LOG 2>/dev/null

echo "=== relay session r5b complete $(date)" >> $LOG
