#!/usr/bin/env python
"""Serialized TPU perf session 3: resize-fix validation + splat sort A/Bs."""
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
    from coocc_tpu.nn.occ_head import OccHead
    from coocc_tpu.ops.interpolate import resize_trilinear_chlast
    from coocc_tpu.ops.lift_splat import lift_splat
    from coocc_tpu.ops.voxelize import linearize
    from tools._prof import make_timer

    timed = make_timer()
    cfg = get_config("coocc_multi_r50_256x704")
    batch = synthetic_batch(cfg, batch_size=1)
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    Xg, Yg, Zg = cfg.lss_grid_size

    B, N = 1, 6
    D = cfg.grid.num_depth_bins
    fH, fW = (cfg.data.input_size[0] // cfg.lss.downsample,
              cfg.data.input_size[1] // cfg.lss.downsample)
    C = cfg.lss.numC_Trans
    rots, trans = jnp.asarray(batch.rots), jnp.asarray(batch.trans)
    intrins = jnp.asarray(batch.intrins)
    post_rots, post_trans = (jnp.asarray(batch.post_rots),
                             jnp.asarray(batch.post_trans))
    bda = jnp.asarray(batch.bda)

    # ---- splat A/Bs with REAL geometry-derived ids
    frustum = jnp.asarray(create_frustum(cfg.data.input_size,
                                         cfg.lss.downsample, cfg.grid.dbound))
    dx, bx, nxg = gen_dx_bx(cfg.grid.xbound, cfg.grid.ybound, cfg.grid.zbound)
    nx_i = [int(v) for v in nxg]
    n_vox = nx_i[0] * nx_i[1] * nx_i[2]
    geom = jax.jit(lambda r, t, i, pr, pt, bd: get_geometry(
        frustum, r, t, i, pr, pt, bd))(
        rots, trans, intrins, post_rots, post_trans, bda)
    depth_logit = jax.random.normal(key, (B * N, fH, fW, D), jnp.float32)
    dp = jax.nn.softmax(depth_logit, -1).reshape(B, N, fH, fW, D)
    dp = jnp.transpose(dp, (0, 1, 4, 2, 3))
    imf5 = jax.random.normal(jax.random.fold_in(key, 1),
                             (B, N, fH, fW, C), jnp.float32)
    P = N * D * fH * fW

    timed("splat current (sort3)", jax.jit(
        lambda d, f, g: lift_splat(d, f, g, dx, bx, nxg)), dp, imf5, geom)
    timed("splat unsorted scatter", jax.jit(
        lambda d, f, g: lift_splat(d, f, g, dx, bx, nxg, sort=False)),
        dp, imf5, geom)

    def splat_percam(dpp, ff, g):
        idx, valid = voxel_indices(g, dx, bx, nxg)
        vox_id = linearize(idx, nx_i)
        vox_id = jnp.where(valid, vox_id, n_vox)  # [B,N,D,fH,fW]
        Pc = D * fH * fW
        vox_id = vox_id.reshape(B, N, Pc)
        w = dpp.reshape(B, N, Pc)
        pix = jnp.broadcast_to(
            (jnp.arange(fH)[:, None] * fW + jnp.arange(fW)[None, :])[None],
            (D, fH, fW)).reshape(Pc)

        def one_cam(vb, wb, fb):
            feats = fb.reshape(fH * fW, C)
            vb_s, w_s, pix_s = jax.lax.sort(
                (vb, wb, jnp.broadcast_to(pix, wb.shape)), num_keys=1)
            contrib = feats[pix_s] * w_s[:, None]
            return jax.ops.segment_sum(contrib, vb_s, num_segments=n_vox + 1,
                                       indices_are_sorted=True)[:n_vox]

        def one_sample(vb, wb, fb):
            grids = jax.vmap(one_cam)(vb, wb, fb)
            return grids.sum(0).reshape(nx_i[0], nx_i[1], nx_i[2], C)

        return jax.vmap(one_sample)(vox_id, w, ff)

    timed("splat per-cam sort", jax.jit(splat_percam), dp, imf5, geom)

    # sort cost in isolation, real ids
    idx, valid = voxel_indices(geom, dx, bx, nxg)
    vox_id = jnp.where(valid, linearize(idx, nx_i), n_vox).reshape(P)
    wflat = dp.reshape(P)
    pixf = jnp.arange(P, dtype=jnp.int32) % (fH * fW)
    timed("sort3 alone (real ids)", jax.jit(
        lambda v, w2, p2: jax.lax.sort((v, w2, p2), num_keys=1)),
        vox_id, wflat, pixf)

    print("[perf session 3 done]", flush=True)


if __name__ == "__main__":
    main()
