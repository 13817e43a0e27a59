#!/usr/bin/env python
"""Render-regularizer benchmark: frustum renderer rays/sec on one chip.

BASELINE.md's metric axes name "render rays/sec" alongside frames/sec and
mIoU parity. The reference's inline renderer walks the full stride-16
frustum per camera (coocc_ray.py:364-417): at r50 shapes that is
6 cams x 16 x 44 = 4224 rays/frame, 112 samples/ray. This times the
standalone FrustumRenderer (models/renderer.py) at those shapes.

Methodology (round-5 fix): round 4 timed 5 IDENTICAL calls and subtracted
a trivial-jit round trip; the relay served the repeats from its result
cache, the delta went <= 0, a 1e-6 clamp fired, and the tool printed
4.2e9 rays/sec with nobody noticing. The renderer graph is small enough
to chain, so we now run K frames with DISTINCT feature volumes inside one
jit (lax.scan over a stacked feats array) and difference K=9 against K=1:
dispatch and readback cancel exactly, and per-frame time is the honest
scan marginal. If the K=9 run is not measurably slower than K=1 the run
FAILS loudly instead of emitting garbage.
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch
    from coocc_tpu.geometry.frustum import create_frustum, get_geometry
    from coocc_tpu.models.renderer import FrustumRenderer

    cfg = get_config("coocc_multi_r50_256x704")
    dtype = {"bf16": jnp.bfloat16, "fp32": None}[
        os.environ.get("BENCH_DTYPE", "bf16")]
    reps = int(os.environ.get("BENCH_ITERS", "5"))
    KMAX = 9

    batch = synthetic_batch(cfg, batch_size=1)
    scale = 16
    frustum = jnp.asarray(create_frustum(cfg.data.input_size, scale,
                                         (2.0, 58.0, 0.5)))
    geom = get_geometry(frustum, jnp.asarray(batch.rots),
                        jnp.asarray(batch.trans), jnp.asarray(batch.intrins),
                        jnp.asarray(batch.post_rots),
                        jnp.asarray(batch.post_trans), jnp.asarray(batch.bda))
    B, N, D, H, W, _ = geom.shape
    Xg, Yg, Zg = cfg.lss_grid_size
    C = cfg.lss.numC_Trans
    # KMAX distinct feature volumes, scanned over — no two chained frames
    # share inputs, so no result cache can serve them
    feats_all = jnp.asarray(
        np.random.RandomState(0).randn(KMAX, B, Xg, Yg, Zg, C),
        dtype or jnp.float32)

    renderer = FrustumRenderer(cfg=cfg.render, scale=scale, with_rgb=True,
                               dtype=dtype)
    variables = renderer.init(jax.random.PRNGKey(0), feats_all[0], geom)

    def run_k(v, feats_k, g, K):
        def body(acc, f):
            rgbs, depths = renderer.apply(v, f, g)
            return acc + (jnp.sum(jnp.abs(rgbs.astype(jnp.float32)))
                          + jnp.sum(jnp.abs(depths.astype(jnp.float32)))), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), feats_k)
        return acc

    times = {}
    for K in (1, KMAX):
        jfn = jax.jit(partial(run_k, K=K))
        feats_k = feats_all[:K]
        float(jfn(variables, feats_k, geom))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jfn(variables, feats_k, geom))
            ts.append(time.perf_counter() - t0)
        times[K] = float(np.median(ts))

    if times[KMAX] <= times[1] * 1.02:
        raise RuntimeError(
            f"bench invalid: K={KMAX} chained frames "
            f"({times[KMAX]*1e3:.2f} ms) not measurably slower than K=1 "
            f"({times[1]*1e3:.2f} ms) — the relay likely served cached "
            "results; refusing to emit a garbage rays/sec number")

    dt = (times[KMAX] - times[1]) / (KMAX - 1)
    rays = B * N * H * W
    rays_per_sec = rays / dt

    print(json.dumps({
        "metric": "render rays/sec (stride-16 frustum, 112 samples/ray)",
        "value": round(rays_per_sec, 1),
        "unit": "rays/sec",
        "rays_per_frame": rays,
        "ms_per_frame": round(dt * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
