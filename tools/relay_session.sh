#!/bin/bash
# Unattended TPU measurement sequence for when the axon relay recovers.
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

# 2. Pallas SubM A/B (fastest to compile, biggest single lever)
python tools/perf_session11.py >> $LOG 2>&1
echo "=== ps11 done $(date)" >> $LOG

# 2b. Pallas window-KNN A/B (fuser hotspot)
python tools/perf_session12.py >> $LOG 2>&1
echo "=== ps12 done $(date)" >> $LOG

# 2c. packed-strided vs lane-major A/B
python tools/perf_session13.py >> $LOG 2>&1
echo "=== ps13 done $(date)" >> $LOG

# 3. encoder ztap A/B + image/semantic breakdowns
python tools/perf_session.py >> $LOG 2>&1
echo "=== perf_session done $(date)" >> $LOG

# 4. fresh per-stage breakdown at HEAD (fuser/semantic opts unmeasured)
python tools/profile_stages.py >> $LOG 2>&1
echo "=== profile_stages done $(date)" >> $LOG

# 5. bench: default flags
python bench.py > /tmp/bench_default.json 2>> $LOG
echo "=== bench default done $(date)" >> $LOG
cat /tmp/bench_default.json >> $LOG

# 6. bench: all gated candidates on (component A/Bs above explain deltas)
BENCH_ZTAP=1,2 COOCC_PALLAS_SUBM=1 COOCC_PALLAS_KNN=1 COOCC_S2D_STEM=1 \
  python bench.py > /tmp/bench_candidates.json 2>> $LOG
echo "=== bench candidates done $(date)" >> $LOG
cat /tmp/bench_candidates.json >> $LOG

# 7. render rays/sec (BASELINE metric axis)
python tools/bench_render.py >> $LOG 2>&1
echo "=== bench_render done $(date)" >> $LOG

echo "=== relay session complete $(date)" >> $LOG
