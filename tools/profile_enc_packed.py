#!/usr/bin/env python
"""Per-level latency breakdown of PackedLiDAREnc8x (cumulative truncations)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _prof import enable_compile_cache  # noqa: E402  (sets cache on import)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch
    from coocc_tpu.nn.sparse_enc_packed import PackedLiDAREnc8x
    from coocc_tpu.ops.voxelize import voxelize_mask

    cfg = get_config("coocc_multi_r50_256x704")
    pts_cfg = cfg.pts
    batch = synthetic_batch(cfg, batch_size=1)
    pts = jnp.asarray(batch.points)
    pm = jnp.asarray(batch.points_mask)

    mask0 = jax.jit(lambda p, m: jax.vmap(lambda pp, mm: voxelize_mask(
        pp, mm, cfg.point_cloud_range, pts_cfg.voxel_size,
        pts_cfg.sparse_shape_xyz,
        max_voxels=pts_cfg.max_voxels_test))(p, m))(pts, pm)
    mask0 = jax.block_until_ready(mask0)

    def readback(out):
        leaf = jax.tree.leaves(out)[0]
        return float(leaf.reshape(-1)[0].astype(jnp.float32))

    @jax.jit
    def trivial(x):
        return (x * 2.0).sum()

    readback(trivial(jnp.ones((8, 128))))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        readback(trivial(jnp.ones((8, 128))))
        ts.append(time.perf_counter() - t0)
    t_rt = float(np.median(ts))
    print(f"[rt {t_rt * 1e3:.0f} ms]", flush=True)

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

    ztap = tuple(int(x) for x in sys.argv[1].split(",")) \
        if len(sys.argv) > 1 and sys.argv[1] else ()
    print(f"[ztap_levels {ztap}]", flush=True)
    prev = 0.0
    for stop in ["stem", "res1", "res2", "res3", None]:
        enc = PackedLiDAREnc8x(
            input_channel=pts_cfg.input_channel,
            base_channel=pts_cfg.base_channel,
            out_channel=pts_cfg.out_channel,
            sparse_shape_xyz=pts_cfg.sparse_shape_xyz,
            capacity=pts_cfg.max_voxels_test,
            compute_dtype=jnp.bfloat16, stop_after=stop,
            ztap_levels=ztap)
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
