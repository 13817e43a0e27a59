#!/usr/bin/env python
"""Isolate the B=2 pts-stage regression: packed Enc8x at B=1 vs B=2.

profile_prefix --batch 2 (r5b) measured the pts stage at 158.9 ms where
2x the B=1 marginal predicts ~114 ms. This times the two pieces —
voxelize_mask (B=1 bare vs B=2 lax.map, exactly the model's paths) and
PackedLiDAREnc8x on stacked masks — at both batch sizes to name the
overhead's owner.
"""
from __future__ import annotations

import json
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

    cfg = get_config("coocc_multi_r50_256x704")
    pts = cfg.pts
    timed = make_timer()
    results = {}

    def vox_one(p, m):
        return voxelize_mask(p, m, cfg.point_cloud_range, pts.voxel_size,
                             pts.sparse_shape_xyz,
                             max_voxels=pts.max_voxels_test)

    enc = PackedLiDAREnc8x(
        input_channel=pts.input_channel, base_channel=pts.base_channel,
        out_channel=pts.out_channel, sparse_shape_xyz=pts.sparse_shape_xyz,
        capacity=pts.max_voxels_test, compute_dtype=jnp.bfloat16,
        ztap_levels=tuple(pts.ztap_levels))

    for B in (1, 2):
        b = synthetic_batch(cfg, batch_size=B, seed=B)
        points = jnp.asarray(b.points)
        pmask = jnp.asarray(b.points_mask)

        def vox_model_path(points, pmask):
            # the model's exact B dispatch (coocc_ray._pts_voxels)
            if points.shape[0] == 1:
                return vox_one(points[0], pmask[0])[None]
            return jax.lax.map(lambda a: vox_one(*a), (points, pmask))

        t = timed(f"vox B={B}", jax.jit(vox_model_path), points, pmask)
        results[f"vox_b{B}_ms"] = round(t * 1e3, 2)

        mask0 = jax.jit(vox_model_path)(points, pmask)
        mask0 = jax.block_until_ready(mask0)
        if B == 1:
            ev = jax.jit(lambda r, m: enc.init(r, m, train=False))(
                jax.random.PRNGKey(0), mask0)
        t = timed(f"enc B={B}", jax.jit(
            lambda v, m: enc.apply(v, m, train=False)), ev, mask0)
        results[f"enc_b{B}_ms"] = round(t * 1e3, 2)

    results["enc_b2_over_2x_b1"] = round(
        results["enc_b2_ms"] / (2 * results["enc_b1_ms"]), 3)
    results["vox_b2_over_2x_b1"] = round(
        results["vox_b2_ms"] / (2 * results["vox_b1_ms"]), 3)
    print(json.dumps({"metric": "pts_batch_scaling", **results}), flush=True)


if __name__ == "__main__":
    main()
