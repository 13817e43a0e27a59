#!/usr/bin/env python
"""Find the 6 ms: lift_splat vs inline unvmapped equivalent."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch
    from coocc_tpu.geometry.frustum import (create_frustum, gen_dx_bx,
                                            get_geometry, voxel_indices)
    from coocc_tpu.ops.lift_splat import lift_splat
    from coocc_tpu.ops.voxelize import linearize
    from tools._prof import make_timer

    timed = make_timer()
    cfg = get_config("coocc_multi_r50_256x704")
    batch = synthetic_batch(cfg, batch_size=1)
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
    rots, trans = jnp.asarray(batch.rots), jnp.asarray(batch.trans)
    intrins = jnp.asarray(batch.intrins)
    post_rots, post_trans = (jnp.asarray(batch.post_rots),
                             jnp.asarray(batch.post_trans))
    bda = jnp.asarray(batch.bda)
    geom = jax.jit(lambda: get_geometry(
        frustum, rots, trans, intrins, post_rots, post_trans, bda))()
    geom = geom.block_until_ready()
    P = N * D * fH * fW

    dlogit = jax.random.normal(key, (B, N, D, fH, fW), jnp.float32)
    dp = jax.nn.softmax(dlogit, axis=2).block_until_ready()
    imf5 = jax.random.normal(jax.random.fold_in(key, 1),
                             (B, N, fH, fW, C), jnp.float32)

    timed("lift_splat current", jax.jit(
        lambda d, f, g: lift_splat(d, f, g, dx, bx, nxg)), dp, imf5, geom)

    pix = (jnp.arange(P, dtype=jnp.int32) % (fH * fW)
           + (jnp.arange(P, dtype=jnp.int32) // (D * fH * fW)) * (fH * fW))

    def inline(dpp, ff, g):
        idx, valid = voxel_indices(g, dx, bx, nxg)
        vid = jnp.where(valid, linearize(idx, nx_i), n_vox).reshape(P)
        wb = dpp.reshape(P)
        feats = ff.reshape(N * fH * fW, C)
        vb_s, w_s, pix_s = jax.lax.sort((vid, wb, pix), num_keys=1)
        contrib = feats[pix_s] * w_s[:, None]
        out = jax.ops.segment_sum(contrib, vb_s, num_segments=n_vox + 1,
                                  indices_are_sorted=True)
        return out[:n_vox].reshape(1, nx_i[0], nx_i[1], nx_i[2], C)

    timed("inline unvmapped", jax.jit(inline), dp, imf5, geom)

    # numerical agreement
    a = jax.jit(lambda d, f, g: lift_splat(d, f, g, dx, bx, nxg))(
        dp, imf5, geom)
    b2 = jax.jit(inline)(dp, imf5, geom)
    print("agree:", float(jnp.abs(a - b2).max()), flush=True)
    print("[done]", flush=True)


if __name__ == "__main__":
    main()
