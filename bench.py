"""Benchmark: coocc_multi_r50_256x704 inference frames/sec on one TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Baseline target: >= 10 frames/sec/chip on TPU v5e (BASELINE.md).

Methodology note: on this environment's remote-execution relay,
jax.block_until_ready resolves at enqueue (async), and repeated identical
calls can be served from cache — naive timing reports absurd fps. We
therefore run K model forwards CHAINED INSIDE ONE JIT (lax.scan over K
distinct batches) with a scalar readback forcing real synchronization, and
subtract the measured 1-iteration baseline to cancel the fixed relay
round-trip (~25 ms). Marginal time per forward == true device time
(validated against known-FLOP matmul chains).
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

    cfg = get_config("coocc_multi_r50_256x704")
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
    batch = to_dev(synthetic_batch(cfg, batch_size=B, seed=0))

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

    def timed(fn, *args):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_overhead = timed(trivial, xsmall)
    t_fwd = timed(fwd, variables, batch)
    dt = max((t_fwd - t_overhead) / B, 1e-6)
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "coocc_multi_r50_256x704 inference frames/sec/chip",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
