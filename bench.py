"""Benchmark: coocc_multi_r50_256x704 inference frames/sec on one TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Baseline target: >= 10 frames/sec/chip on TPU v5e (BASELINE.md).

Methodology note: on this environment's remote-execution relay,
jax.block_until_ready resolves at enqueue (async), and repeated identical
calls can be served from a result cache — naive timing reports absurd fps.
We therefore time a SINGLE jitted forward with (a) a scalar readback
forcing real synchronization, (b) a DISTINCT pre-staged batch per rep so
no two calls share an argument signature the relay could cache, and
(c) the measured trivial-jit round trip (~25 ms) subtracted to cancel the
fixed relay overhead. A chained lax.scan over K batches (the marginal-cost
methodology tools/bench_train.py and tools/bench_render.py use) would be
stronger, but the remote compile helper OOMs on flagship-size scanned
graphs, so the forward stays unchained here. If the measured forward time
does not clearly exceed the round-trip floor the run FAILS loudly rather
than emitting a garbage number.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 10.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    # persistent compile cache ONLY on the CPU backend — with the axon TPU
    # relay the cache wedges compiles (observed: indefinite hangs that also
    # block other clients)
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        try:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache"))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch
    from coocc_tpu.models.coocc_ray import CoOccRay
    from coocc_tpu.utils.init_utils import jit_init

    # BENCH_CONFIG: time any shipped config with the same methodology —
    # the per-config real-shape proof table (VERDICT round-4 task #1)
    cfg_name = os.environ.get("BENCH_CONFIG", "coocc_multi_r50_256x704")
    cfg = get_config(cfg_name)
    ztap = os.environ.get("BENCH_ZTAP", "")
    if ztap:
        # A/B knob: run the packed encoder's res levels in z-batch tap-fused
        # form, e.g. BENCH_ZTAP=1,2 (see nn/sparse_enc_packed.py)
        import dataclasses
        cfg = dataclasses.replace(
            cfg, pts=dataclasses.replace(
                cfg.pts,
                ztap_levels=tuple(int(t) for t in ztap.split(","))))
    dtype = {"bf16": jnp.bfloat16, "fp32": None}[
        os.environ.get("BENCH_DTYPE", "bf16")]
    model = CoOccRay(cfg=cfg, dtype=dtype)

    def to_dev(b):
        return jax.tree.map(
            lambda x: None if x is None else jnp.asarray(x), b,
            is_leaf=lambda x: x is None)

    # One init trace + one forward trace only: whole-model traces cost ~7 min
    # on this 1-core host and the remote compile helper OOMs on chained
    # (scan/fori) variants, so the bench times a single batched forward with
    # scalar readback and subtracts the measured relay round-trip.
    B = int(os.environ.get("BENCH_BATCH", "1"))
    reps = int(os.environ.get("BENCH_ITERS", "5"))
    # one distinct pre-staged batch per rep: identical-args repeat calls can
    # be served from the relay's result cache (observed round 4: a 0-delta
    # timing), so no two timed calls may share inputs
    batches = [to_dev(synthetic_batch(cfg, batch_size=B, seed=s))
               for s in range(reps + 1)]
    batch = batches[0]

    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                         train=False)

    @jax.jit
    def fwd(variables, batch):
        # reduce EVERY model output (coarse occ + the fine cascade) so XLA
        # cannot dead-code-eliminate the cascade the eval path depends on
        outs = model.apply(variables, batch, train=False)
        return sum(jnp.sum(jnp.abs(v.astype(jnp.float32)))
                   for v in jax.tree.leaves(outs))

    @jax.jit
    def trivial(x):
        return (x * 2.0).sum()

    xsmall = jnp.ones((8, 128))
    float(trivial(xsmall))
    float(fwd(variables, batch))  # compile + warm

    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(trivial(xsmall))
        ts.append(time.perf_counter() - t0)
    t_overhead = float(np.median(ts))

    ts = []
    for i in range(reps):
        b = batches[i + 1]  # fresh inputs every rep — see staging note above
        t0 = time.perf_counter()
        float(fwd(variables, b))
        ts.append(time.perf_counter() - t0)
    t_fwd = float(np.median(ts))

    if t_fwd <= 1.2 * t_overhead:
        raise RuntimeError(
            f"bench invalid: forward ({t_fwd*1e3:.2f} ms) does not clearly "
            f"exceed the relay round-trip floor ({t_overhead*1e3:.2f} ms) — "
            "the relay likely served a cached result; refusing to emit a "
            "garbage fps number")
    dt = (t_fwd - t_overhead) / B
    fps = 1.0 / dt

    print(json.dumps({
        "metric": f"{cfg_name} inference frames/sec/chip",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
