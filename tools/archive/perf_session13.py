#!/usr/bin/env python
"""Serialized TPU perf session 13: packed-strided vs lane-major stem/downs.

A/Bs the stride-2-z form of the packed encoder at flagship shapes.
COOCC_PACKED_STRIDED=1 selects the packed form (~6x fewer raw MACs, see
nn/sparse_enc_packed._strided_packed_weight); default is lane-major, the
measured winner on v5e (session 13: stem 8.2 vs 22.3 ms).
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
            os.environ["COOCC_PACKED_STRIDED"] = flag
        else:
            os.environ.pop("COOCC_PACKED_STRIDED", None)

        @jax.jit
        def run(v, m):
            return enc.apply(v, m, train=False)

        timed(f"encoder PACKED='{flag}'", run, vs, mask0)

    # stem-only comparison (the collapsed level-0 conv)
    for flag in ("", "1"):
        if flag:
            os.environ["COOCC_PACKED_STRIDED"] = flag
        else:
            os.environ.pop("COOCC_PACKED_STRIDED", None)
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

        timed(f"stem PACKED='{flag}'", runs, vs, mask0)

    print("[perf session 13 done]", flush=True)


if __name__ == "__main__":
    main()
