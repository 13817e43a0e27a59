#!/bin/bash
# Unattended TPU measurement sequence (round 3: SubM A/B + evidence table).
# Serialized (1-core host); never kills a client mid-compile.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/relay_session.log
echo "=== relay session start $(date)" >> $LOG

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

# 2. bench at HEAD defaults (confirm the committed 9.63)
python bench.py > /tmp/bench_default.json 2>> $LOG
echo "=== bench default done $(date)" >> $LOG
cat /tmp/bench_default.json >> $LOG

# 3. Pallas SubM A/B (post-Mosaic-fix; biggest single lever at res1)
COOCC_PALLAS_SUBM=1 python bench.py > /tmp/bench_subm.json 2>> $LOG
echo "=== bench subm done $(date)" >> $LOG
cat /tmp/bench_subm.json >> $LOG

# 4. batch cross-check (VERDICT weak #5: methodology evidence)
BENCH_BATCH=2 python bench.py > /tmp/bench_b2.json 2>> $LOG
echo "=== bench B=2 done $(date)" >> $LOG
cat /tmp/bench_b2.json >> $LOG

# 5. render rays/sec (BASELINE metric axis)
python tools/bench_render.py > /tmp/bench_render.json 2>> $LOG
echo "=== bench_render done $(date)" >> $LOG
cat /tmp/bench_render.json >> $LOG

# 6. train-step wall clock, tiny probe first then flagship
python tools/bench_train.py --config tiny > /tmp/bench_train_tiny.json 2>> $LOG
echo "=== bench_train tiny done $(date)" >> $LOG
cat /tmp/bench_train_tiny.json >> $LOG
python tools/bench_train.py > /tmp/bench_train.json 2>> $LOG
echo "=== bench_train flagship done $(date)" >> $LOG
cat /tmp/bench_train.json >> $LOG

echo "=== relay session complete $(date)" >> $LOG
