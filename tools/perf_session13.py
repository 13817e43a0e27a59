#!/usr/bin/env python
"""Serialized TPU perf session 13: packed-strided vs lane-major stem/downs.

A/Bs the stride-2-z form of the packed encoder (COOCC_LANE_MAJOR_STRIDED
kill switch) at flagship shapes; the packed form computes ~6x fewer MACs
on the stem + downsamples (see nn/sparse_enc_packed._strided_packed_weight).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch
    from coocc_tpu.nn.sparse_enc_packed import PackedLiDAREnc8x
    from coocc_tpu.ops.voxelize import voxelize_mask
    from tools._prof import make_timer

    timed = make_timer()
    cfg = get_config("coocc_multi_r50_256x704")
    pts_cfg = cfg.pts
    batch = synthetic_batch(cfg, batch_size=1)

    pts = jnp.asarray(batch.points)
    pm = jnp.asarray(batch.points_mask)
    mask0 = jax.jit(lambda p, m: jax.vmap(lambda pp, mm: voxelize_mask(
        pp, mm, cfg.point_cloud_range, pts_cfg.voxel_size,
        pts_cfg.sparse_shape_xyz,
        max_voxels=pts_cfg.max_voxels_test))(p, m))(pts, pm)

    enc = PackedLiDAREnc8x(
        input_channel=pts_cfg.input_channel, base_channel=pts_cfg.base_channel,
        out_channel=pts_cfg.out_channel,
        sparse_shape_xyz=pts_cfg.sparse_shape_xyz,
        capacity=pts_cfg.max_voxels_test, compute_dtype=jnp.bfloat16)
    vs = jax.jit(enc.init, static_argnames="train")(
        jax.random.PRNGKey(0), mask0, train=False)

    for flag in ("", "1"):
        if flag:
            os.environ["COOCC_LANE_MAJOR_STRIDED"] = flag
        else:
            os.environ.pop("COOCC_LANE_MAJOR_STRIDED", None)

        @jax.jit
        def run(v, m):
            return enc.apply(v, m, train=False)

        timed(f"encoder LANE_MAJOR='{flag}'", run, vs, mask0)

    # stem-only comparison (the collapsed level-0 conv)
    for flag in ("", "1"):
        if flag:
            os.environ["COOCC_LANE_MAJOR_STRIDED"] = flag
        else:
            os.environ.pop("COOCC_LANE_MAJOR_STRIDED", None)
        encs = PackedLiDAREnc8x(
            input_channel=pts_cfg.input_channel,
            base_channel=pts_cfg.base_channel,
            out_channel=pts_cfg.out_channel,
            sparse_shape_xyz=pts_cfg.sparse_shape_xyz,
            capacity=pts_cfg.max_voxels_test, compute_dtype=jnp.bfloat16,
            stop_after="stem")

        @jax.jit
        def runs(v, m, e=encs):
            return e.apply(v, m, train=False)

        timed(f"stem LANE_MAJOR='{flag}'", runs, vs, mask0)

    print("[perf session 13 done]", flush=True)


if __name__ == "__main__":
    main()
