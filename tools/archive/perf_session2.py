#!/usr/bin/env python
"""Serialized TPU perf session 2: splat glue, fpn3d internals, fuser, head,
voxelize — with inline A/B variants for the splat sort payloads."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch
    from coocc_tpu.geometry.frustum import (create_frustum, gen_dx_bx,
                                            get_geometry, voxel_indices)
    from coocc_tpu.nn.fpn3d import FPN3D
    from coocc_tpu.nn.bifuser import BiFuserN
    from coocc_tpu.nn.occ_head import OccHead
    from coocc_tpu.ops.interpolate import resize_trilinear_chlast
    from coocc_tpu.ops.lift_splat import lift_splat
    from coocc_tpu.ops.voxelize import linearize, voxelize_mask
    from tools._prof import make_timer

    timed = make_timer()
    cfg = get_config("coocc_multi_r50_256x704")
    batch = synthetic_batch(cfg, batch_size=1)
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    B, N = 1, 6
    D = cfg.grid.num_depth_bins
    fH, fW = (cfg.data.input_size[0] // cfg.lss.downsample,
              cfg.data.input_size[1] // cfg.lss.downsample)
    C = cfg.lss.numC_Trans
    frustum = jnp.asarray(create_frustum(cfg.data.input_size,
                                         cfg.lss.downsample, cfg.grid.dbound))
    dx, bx, nxg = gen_dx_bx(cfg.grid.xbound, cfg.grid.ybound, cfg.grid.zbound)
    nx_i = [int(v) for v in nxg]
    n_vox = nx_i[0] * nx_i[1] * nx_i[2]

    depth_logit = jax.random.normal(key, (B * N, fH, fW, D), jnp.float32)
    img_feat = jax.random.normal(jax.random.fold_in(key, 1),
                                 (B * N, fH, fW, C), jnp.float32)
    rots, trans = jnp.asarray(batch.rots), jnp.asarray(batch.trans)
    intrins = jnp.asarray(batch.intrins)
    post_rots, post_trans = (jnp.asarray(batch.post_rots),
                             jnp.asarray(batch.post_trans))
    bda = jnp.asarray(batch.bda)

    # ---- 1. glue pieces of the view transform
    def geom_only(r, t, i, pr, pt, bd):
        return get_geometry(frustum, r, t, i, pr, pt, bd)

    timed("get_geometry", jax.jit(geom_only), rots, trans, intrins,
          post_rots, post_trans, bda)
    geom = jax.jit(geom_only)(rots, trans, intrins, post_rots, post_trans,
                              bda)

    timed("voxel_indices+linearize", jax.jit(
        lambda g: linearize(voxel_indices(g, dx, bx, nxg)[0], nx_i)), geom)

    timed("softmax D", jax.jit(
        lambda dl: jax.nn.softmax(dl, axis=-1)), depth_logit)

    dp = jax.nn.softmax(depth_logit, -1).reshape(B, N, fH, fW, D)
    dp = jnp.transpose(dp, (0, 1, 4, 2, 3))
    imf5 = img_feat.reshape(B, N, fH, fW, C)

    timed("lift_splat (current f32)", jax.jit(
        lambda d, f, g: lift_splat(d, f, g, dx, bx, nxg)), dp, imf5, geom)

    # A/B: 2-key sort + arithmetic pixel recovery + w gather
    P = N * D * fH * fW

    def splat_2key(dpp, ff, g, feat_dtype):
        idx, valid = voxel_indices(g, dx, bx, nxg)
        vox_id = linearize(idx, nx_i)
        vox_id = jnp.where(valid, vox_id, n_vox).reshape(B, P)
        w = dpp.reshape(B, P)

        def one(vb, wb, fb):
            feats = fb.reshape(N * fH * fW, C).astype(feat_dtype)
            p = jnp.arange(P, dtype=jnp.int32)
            vb_s, p_s = jax.lax.sort((vb, p), num_keys=1)
            # pixel id from flat index: p = ((n*D + d)*fH*fW + hw)
            hw = p_s % (fH * fW)
            cam = p_s // (D * fH * fW)
            pix_s = cam * (fH * fW) + hw
            w_s = wb[p_s].astype(feat_dtype)
            contrib = feats[pix_s] * w_s[:, None]
            out = jax.ops.segment_sum(contrib, vb_s, num_segments=n_vox + 1,
                                      indices_are_sorted=True)
            return out[:n_vox].reshape(nx_i[0], nx_i[1], nx_i[2], C)

        return jax.vmap(one)(vox_id, w, ff)

    timed("lift_splat 2key f32", jax.jit(
        lambda d, f, g: splat_2key(d, f, g, jnp.float32)), dp, imf5, geom)
    timed("lift_splat 2key bf16", jax.jit(
        lambda d, f, g: splat_2key(d, f, g, jnp.bfloat16)), dp, imf5, geom)

    # ---- 2. fpn3d internals
    Xg, Yg, Zg = cfg.lss_grid_size
    mids = []
    for i, c in enumerate(cfg.semantic.block_inplanes):
        s = 2 ** i
        mids.append(jax.random.normal(
            jax.random.fold_in(key, 10 + i),
            (1, max(Xg // s, 1), max(Yg // s, 1), max(Zg // s, 1), c), dtype))
    neck = FPN3D(in_channels=cfg.semantic.block_inplanes,
                 out_channels=cfg.semantic.neck_out_channels, dtype=dtype)
    vn = jax.jit(neck.init, static_argnames="train")(
        key, mids, train=False)
    timed("fpn3d full", jax.jit(
        lambda v, m: neck.apply(v, list(m), train=False)), vn, mids)

    timed("resize x2 (50,50,4,256)->2x", jax.jit(
        lambda x: resize_trilinear_chlast(x, (Xg, Yg, Zg), False)),
        jax.random.normal(key, (1, Xg // 2, Yg // 2, Zg // 2, 256), dtype))

    # ---- 3. fuser
    fcfg = cfg.fuser
    imgv = jax.random.normal(key, (1, Xg, Yg, Zg, 128), dtype)
    imgv = imgv * (jax.random.uniform(key, (1, Xg, Yg, Zg, 1)) < 0.5)
    ptsv = jax.random.normal(jax.random.fold_in(key, 2),
                             (1, Xg, Yg, Zg, 128), dtype)
    ptsv = ptsv * (jax.random.uniform(jax.random.fold_in(key, 3),
                                      (1, Xg, Yg, Zg, 1)) < 0.5)
    fus = BiFuserN(in_channels=fcfg.in_channels,
                   out_channels=fcfg.out_channels, knum=fcfg.knum,
                   dist_thresh=fcfg.dist_thresh, dtype=dtype)
    vf = jax.jit(fus.init, static_argnames="train")(
        key, imgv, ptsv, train=False)
    timed("fuser full", jax.jit(
        lambda v, a, b2: fus.apply(v, a, b2, train=False)), vf, imgv, ptsv)

    # ---- 4. head
    head = OccHead(cfg=cfg.occ_head, dtype=dtype)
    sem = [jax.random.normal(jax.random.fold_in(key, 20 + i),
                             m.shape[:-1] + (cfg.semantic.neck_out_channels,),
                             dtype)
           for i, m in enumerate(mids)]
    imgf = jax.random.normal(jax.random.fold_in(key, 30),
                             (1, N, fH, fW, 512), dtype)
    tr = (rots, trans, intrins, post_rots, post_trans, bda)
    vh = jax.jit(head.init, static_argnames="train")(
        key, sem, imgf, tr, train=False)
    timed("head full (eval)", jax.jit(
        lambda v, s, i2, t: head.apply(v, list(s), img_feats=i2, transform=t,
                                       train=False)), vh, sem, imgf, tr)

    # ---- 5. voxelize_mask
    pts = jnp.asarray(batch.points)
    pm = jnp.asarray(batch.points_mask)
    timed("voxelize_mask", jax.jit(
        lambda p, m: jax.vmap(lambda pp, mm: voxelize_mask(
            pp, mm, cfg.point_cloud_range, cfg.pts.voxel_size,
            cfg.pts.sparse_shape_xyz,
            max_voxels=cfg.pts.max_voxels_test))(p, m)), pts, pm)

    print("[perf session 2 done]", flush=True)


if __name__ == "__main__":
    main()
