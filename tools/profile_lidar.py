#!/usr/bin/env python
"""Sub-attribute the coocc_lidar pts branch (0.466 fps at real shapes).

profile_prefix gives stage marginals (pts/sem/coarse/full); this splits
the pts stage into its parts: full feature voxelize (sort-based, cap
90k), SparseEncoderHD (gather-GEMM sparse conv stack), and
SECOND3D + SECOND3DFPN. Each timed as its own jit with the hoist-proof
scanned timer (tools/_prof.py).

Usage: python tools/profile_lidar.py
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
    from coocc_tpu.nn.second3d import SECOND3D, SECOND3DFPN
    from coocc_tpu.nn.sparse_encoder_hd import SparseEncoderHD
    from coocc_tpu.ops.sparse_conv import SparseTensor
    from coocc_tpu.ops.voxelize import voxelize
    from tools._prof import make_timer

    cfg = get_config("coocc_lidar")
    pts = cfg.pts
    dtype = jnp.bfloat16
    b = synthetic_batch(cfg, batch_size=1)
    points = jnp.asarray(b.points)
    pmask = jnp.asarray(b.points_mask)
    timed = make_timer()

    def vox_one(p, m):
        return voxelize(
            p, m, cfg.point_cloud_range, pts.voxel_size,
            pts.sparse_shape_xyz, max_voxels=pts.max_voxels_test,
            max_points_per_voxel=pts.max_num_points,
            num_features=pts.input_channel)

    t_vox = timed("voxelize (full, cap %d)" % pts.max_voxels_test,
                  jax.jit(lambda p, m: jax.vmap(vox_one)(p, m)),
                  points, pmask)

    v = jax.jit(lambda p, m: jax.vmap(vox_one)(p, m))(points, pmask)
    sp = SparseTensor(ids=v.ids, features=v.features, mask=v.mask)
    sp = jax.tree.map(jax.block_until_ready, sp)

    enc = SparseEncoderHD(
        in_channels=pts.input_channel, base_channels=pts.base_channel,
        output_channels=pts.out_channel,
        sparse_shape_xyz=pts.sparse_shape_xyz,
        capacity=pts.max_voxels_test)
    ev = jax.jit(lambda r, s: enc.init(r, s, train=False))(
        jax.random.PRNGKey(0), sp)
    t_enc = timed("SparseEncoderHD (gather-GEMM)",
                  jax.jit(lambda ev, s: enc.apply(ev, s, train=False)),
                  ev, sp)

    dense = jax.jit(lambda ev, s: enc.apply(ev, s, train=False))(ev, sp)
    dense = jax.block_until_ready(dense.astype(dtype))
    print("HD dense out:", dense.shape, flush=True)

    if cfg.second3d is not None:
        zyx = jax.block_until_ready(jnp.transpose(dense, (0, 3, 2, 1, 4)))
        sec = SECOND3D(in_channels=cfg.second3d.in_channels,
                       out_channels=cfg.second3d.out_channels,
                       layer_nums=cfg.second3d.layer_nums,
                       layer_strides=cfg.second3d.layer_strides,
                       is_cascade=cfg.second3d.is_cascade, dtype=dtype)
        sv = jax.jit(lambda r, x: sec.init(r, x, train=False))(
            jax.random.PRNGKey(1), zyx)
        timed("SECOND3D", jax.jit(
            lambda sv, x: tuple(sec.apply(sv, x, train=False))), sv, zyx)
        feats = jax.jit(lambda sv, x: tuple(
            sec.apply(sv, x, train=False)))(sv, zyx)
        feats = tuple(jax.block_until_ready(f) for f in feats)
        fpn = SECOND3DFPN(in_channels=cfg.second3d.out_channels,
                          out_channels=cfg.second3d.fpn_out_channels,
                          upsample_strides=cfg.second3d.fpn_upsample_strides,
                          extra_num_conv=cfg.second3d.fpn_extra_num_conv,
                          dtype=dtype)
        fv = jax.jit(lambda r, x: fpn.init(r, x, train=False))(
            jax.random.PRNGKey(2), feats)
        timed("SECOND3DFPN", jax.jit(
            lambda fv, x: fpn.apply(fv, x, train=False)), fv, feats)

    print("done", flush=True)


if __name__ == "__main__":
    main()
