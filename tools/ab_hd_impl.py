#!/usr/bin/env python
"""On-chip A/B: SparseEncoderHD gather-GEMM vs the z-packed dense twin.

coocc_lidar measured 0.466 fps at real shapes (round 5, part A); the pts
branch dominates. Both encoder formulations share one param tree, so the
A/B inits the gather module once and applies both with the same
variables at the real coocc_lidar shapes (800x800x65 grid, capacity
90k). Timing per tools/_prof.py (scanned-K, per-rep seed). Also checks
the two outputs agree at active sites (capacity truncation makes the
gather output a SUBSET; compare where gather is active).

Run AFTER the main relay session (serialized chip).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch
    from coocc_tpu.nn.sparse_enc_packed_hd import PackedEncoderHD
    from coocc_tpu.nn.sparse_encoder_hd import SparseEncoderHD
    from coocc_tpu.ops.sparse_conv import SparseTensor
    from coocc_tpu.ops.voxelize import voxelize
    from tools._prof import make_timer

    cfg = get_config("coocc_lidar")
    pts = cfg.pts
    b = synthetic_batch(cfg, batch_size=1)

    def vox_one(p, m):
        return voxelize(p, m, cfg.point_cloud_range, pts.voxel_size,
                        pts.sparse_shape_xyz, max_voxels=pts.max_voxels_test,
                        max_points_per_voxel=pts.max_num_points,
                        num_features=pts.input_channel)

    v = jax.jit(jax.vmap(vox_one))(jnp.asarray(b.points),
                                   jnp.asarray(b.points_mask))
    sp = SparseTensor(ids=v.ids, features=v.features, mask=v.mask)
    sp = jax.tree.map(jax.block_until_ready, sp)
    print("active voxels:", int(sp.mask.sum()), flush=True)

    kw = dict(in_channels=pts.input_channel, base_channels=pts.base_channel,
              output_channels=pts.out_channel,
              sparse_shape_xyz=pts.sparse_shape_xyz,
              capacity=pts.max_voxels_test)
    gather = SparseEncoderHD(**kw)
    packed = PackedEncoderHD(**kw, compute_dtype=jnp.bfloat16)
    vars_ = jax.jit(lambda r, s: gather.init(r, s, train=False))(
        jax.random.PRNGKey(0), sp)

    timed = make_timer()
    results = {}
    t = timed("packed_hd", jax.jit(
        lambda v, s: packed.apply(v, s, train=False)), vars_, sp)
    results["packed_hd_ms"] = round(t * 1e3, 2)
    t = timed("gather", jax.jit(
        lambda v, s: gather.apply(v, s, train=False)), vars_, sp)
    results["gather_ms"] = round(t * 1e3, 2)

    # numeric agreement at gather-active output sites (bf16 packed vs f32
    # gather: expect ~1e-2 relative)
    ref = jax.jit(lambda v, s: gather.apply(v, s, train=False))(vars_, sp)
    got = jax.jit(lambda v, s: packed.apply(v, s, train=False))(vars_, sp)
    ref, got = np.asarray(ref), np.asarray(got)
    act = np.abs(ref).sum(-1) > 0
    d = np.abs(ref - got)[act]
    results["max_abs_diff_at_active"] = float(d.max()) if d.size else 0.0
    results["winner"] = ("packed_hd"
                         if results["packed_hd_ms"] < results["gather_ms"]
                         else "gather")
    print(json.dumps({"metric": "hd_encoder_ms", **results}), flush=True)


if __name__ == "__main__":
    main()
