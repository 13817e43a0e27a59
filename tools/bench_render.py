#!/usr/bin/env python
"""Render-regularizer benchmark: frustum renderer rays/sec on one chip.

BASELINE.md's metric axes name "render rays/sec" alongside frames/sec and
mIoU parity. The reference's inline renderer walks the full stride-16
frustum per camera (coocc_ray.py:364-417): at r50 shapes that is
6 cams x 16 x 44 = 4224 rays/frame, 112 samples/ray. This times the
standalone FrustumRenderer (models/renderer.py) at those shapes with the
relay-safe scalar-readback methodology of bench.py and prints one JSON
line {"metric": "render rays/sec", ...}.
"""
from __future__ import annotations

import json
import os
import sys
import time

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
    feats = jnp.asarray(np.random.RandomState(0).randn(B, Xg, Yg, Zg, C),
                        dtype or jnp.float32)

    renderer = FrustumRenderer(cfg=cfg.render, scale=scale, with_rgb=True,
                               dtype=dtype)
    variables = renderer.init(jax.random.PRNGKey(0), feats, geom)

    @jax.jit
    def run(v, f, g):
        rgbs, depths = renderer.apply(v, f, g)
        return (jnp.sum(jnp.abs(rgbs.astype(jnp.float32)))
                + jnp.sum(jnp.abs(depths.astype(jnp.float32))))

    @jax.jit
    def trivial(x):
        return (x * 2.0).sum()

    xsmall = jnp.ones((8, 128))
    float(trivial(xsmall))
    float(run(variables, feats, geom))  # compile + warm

    def timed(fn, *args):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    dt = max(timed(run, variables, feats, geom) - timed(trivial, xsmall),
             1e-6)
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
