#!/bin/bash
# Unattended TPU measurement sequence, round 4.
#
# Evidence this produces (VERDICT round-3 "do this" #1/#2):
#   * a >=5-run bench.py distribution at ONE HEAD (the perf gate must hold
#     outside run-to-run noise: committed MINIMUM >= 1.0 vs baseline)
#   * train-step wall clock at the same HEAD (tiny probe + flagship)
#   * B=2 cross-check (the lax.map de-unroll must not regress per-frame)
#   * render rays/sec (third BASELINE metric axis)
# Serialized (1-core host); never kills a client mid-compile.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/relay_session_r4.log
echo "=== relay session r4 start $(date) HEAD=$(git rev-parse --short HEAD)" >> $LOG

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

# 2. bench distribution: 5 independent process runs at HEAD
for i in 1 2 3 4 5; do
  python bench.py > /tmp/bench_r4_run$i.json 2>> $LOG
  echo "=== bench run $i done $(date)" >> $LOG
  cat /tmp/bench_r4_run$i.json >> $LOG
done

# 3. batch cross-check (de-unroll regression guard)
BENCH_BATCH=2 python bench.py > /tmp/bench_r4_b2.json 2>> $LOG
echo "=== bench B=2 done $(date)" >> $LOG
cat /tmp/bench_r4_b2.json >> $LOG

# 4. render rays/sec
python tools/bench_render.py > /tmp/bench_r4_render.json 2>> $LOG
echo "=== bench_render done $(date)" >> $LOG
cat /tmp/bench_r4_render.json >> $LOG

# 5. train-step wall clock, tiny probe then flagship
python tools/bench_train.py --config tiny > /tmp/bench_r4_train_tiny.json 2>> $LOG
echo "=== bench_train tiny done $(date)" >> $LOG
cat /tmp/bench_r4_train_tiny.json >> $LOG
python tools/bench_train.py --scan-only > /tmp/bench_r4_train.json 2>> $LOG
echo "=== bench_train flagship done $(date)" >> $LOG
cat /tmp/bench_r4_train.json >> $LOG

echo "=== relay session r4 complete $(date)" >> $LOG
