#!/usr/bin/env python
"""A/B: packed encoder vs hybrid z-batch stem/downsample variant (zb_down)."""
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
    from coocc_tpu.nn.sparse_enc_packed import PackedLiDAREnc8x
    from coocc_tpu.ops.voxelize import voxelize_mask

    cfg = get_config("coocc_multi_r50_256x704")
    pts_cfg = cfg.pts
    batch = synthetic_batch(cfg, batch_size=1)

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

    def timed(tag, fn, *a, reps=5):
        t0 = time.perf_counter()
        readback(fn(*a))
        c = time.perf_counter() - t0
        tt = []
        for _ in range(reps):
            t0 = time.perf_counter()
            readback(fn(*a))
            tt.append(time.perf_counter() - t0)
        ms = (float(np.median(tt)) - t_rt) * 1e3
        print(f"{tag:40s} {ms:8.2f} ms  [compile {c:.0f}s]", flush=True)
        return ms

    pts = jnp.asarray(batch.points)
    pm = jnp.asarray(batch.points_mask)
    mask0 = jax.jit(lambda p, m: jax.vmap(lambda pp, mm: voxelize_mask(
        pp, mm, cfg.point_cloud_range, pts_cfg.voxel_size,
        pts_cfg.sparse_shape_xyz,
        max_voxels=pts_cfg.max_voxels_test))(p, m))(pts, pm)

    for zb in (False, True):
        enc = PackedLiDAREnc8x(
            input_channel=pts_cfg.input_channel,
            base_channel=pts_cfg.base_channel,
            out_channel=pts_cfg.out_channel,
            sparse_shape_xyz=pts_cfg.sparse_shape_xyz,
            capacity=pts_cfg.max_voxels_test,
            compute_dtype=jnp.bfloat16, zb_down=zb)
        vs = jax.jit(enc.init, static_argnames="train")(
            jax.random.PRNGKey(0), mask0, train=False)

        @jax.jit
        def run(v, m, enc=enc):
            return enc.apply(v, m, train=False)

        timed(f"encoder zb_down={zb}", run, vs, mask0)

        # per-level truncation
        if zb:
            prev = 0.0
            for stop in ["stem", "res1", "res2", "res3"]:
                e2 = PackedLiDAREnc8x(
                    input_channel=pts_cfg.input_channel,
                    base_channel=pts_cfg.base_channel,
                    out_channel=pts_cfg.out_channel,
                    sparse_shape_xyz=pts_cfg.sparse_shape_xyz,
                    capacity=pts_cfg.max_voxels_test,
                    compute_dtype=jnp.bfloat16, stop_after=stop, zb_down=zb)
                v2 = jax.jit(e2.init, static_argnames="train")(
                    jax.random.PRNGKey(0), mask0, train=False)

                @jax.jit
                def run2(v, m, e2=e2):
                    return e2.apply(v, m, train=False)

                tt = timed(f"  zb through {stop}", run2, v2, mask0)
                print(f"    (+{tt - prev:.1f})", flush=True)
                prev = tt

    print("[done]", flush=True)


if __name__ == "__main__":
    main()
