#!/usr/bin/env python
"""Per-level latency breakdown of DenseLiDAREnc8x (cumulative truncations)."""
from __future__ import annotations

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
    from coocc_tpu.nn.sparse_enc_dense import DenseLiDAREnc8x
    from coocc_tpu.ops.voxelize import voxelize_mask

    cfg = get_config("coocc_multi_r50_256x704")
    pts_cfg = cfg.pts
    batch = synthetic_batch(cfg, batch_size=1)
    pts = jnp.asarray(batch.points)
    pm = jnp.asarray(batch.points_mask)

    @jax.jit
    def s_mask(points, mask):
        return jax.vmap(lambda p, m: voxelize_mask(
            p, m, cfg.point_cloud_range, pts_cfg.voxel_size,
            pts_cfg.sparse_shape_xyz,
            max_voxels=pts_cfg.max_voxels_test))(points, mask)

    def readback(out):
        leaf = jax.tree.leaves(out)[0]
        return float(leaf.reshape(-1)[0].astype(jnp.float32))

    def timed(fn, *a, reps=5):
        t0 = time.perf_counter()
        readback(fn(*a))
        print(f"    [compile+run {time.perf_counter() - t0:.0f}s]", flush=True)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            readback(fn(*a))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    @jax.jit
    def trivial(x):
        return (x * 2.0).sum()

    t_rt = timed(trivial, jnp.ones((8, 128)))
    print(f"round-trip {t_rt * 1e3:.1f} ms", flush=True)

    t = timed(s_mask, pts, pm) - t_rt
    print(f"voxelize_mask: {t * 1e3:.1f} ms", flush=True)
    mask0 = s_mask(pts, pm).block_until_ready()

    prev = 0.0
    for stop in ["stem", "res1", "res2", "res3", None]:
        enc = DenseLiDAREnc8x(
            input_channel=pts_cfg.input_channel,
            base_channel=pts_cfg.base_channel,
            out_channel=pts_cfg.out_channel,
            sparse_shape_xyz=pts_cfg.sparse_shape_xyz,
            capacity=pts_cfg.max_voxels_test,
            compute_dtype=jnp.bfloat16, stop_after=stop)
        vs = jax.jit(enc.init, static_argnames="train")(
            jax.random.PRNGKey(0), mask0, train=False)

        @jax.jit
        def run(v, m, enc=enc):
            return enc.apply(v, m, train=False)

        tt = timed(run, vs, mask0) - t_rt
        print(f"through {stop or 'full'}: {tt * 1e3:.1f} ms "
              f"(+{(tt - prev) * 1e3:.1f})", flush=True)
        prev = tt


if __name__ == "__main__":
    main()
