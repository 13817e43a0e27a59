#!/usr/bin/env python
"""Micro-split of the real-geometry splat path."""
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
    P = N * D * fH * fW

    idx, valid = voxel_indices(geom, dx, bx, nxg)
    vox_id = jnp.where(valid, linearize(idx, nx_i), n_vox).reshape(P)
    w = jax.random.uniform(key, (P,), jnp.float32)
    feats = jax.random.normal(jax.random.fold_in(key, 1),
                              (N * fH * fW, C), jnp.float32)
    pix = jnp.arange(P, dtype=jnp.int32) % (fH * fW) \
        + (jnp.arange(P, dtype=jnp.int32) // (D * fH * fW)) * (fH * fW)

    sorted_ = jax.jit(lambda v, ww, p: jax.lax.sort((v, ww, p), num_keys=1))(
        vox_id, w, pix)
    vb_s, w_s, pix_s = [x.block_until_ready() for x in sorted_]

    timed("A sort3", jax.jit(
        lambda v, ww, p: jax.lax.sort((v, ww, p), num_keys=1)),
        vox_id, w, pix)
    timed("B gather+mul", jax.jit(
        lambda f, p, ww: f[p] * ww[:, None]), feats, pix_s, w_s)
    contrib = (feats[pix_s] * w_s[:, None]).block_until_ready()
    timed("C segsum sorted (real)", jax.jit(
        lambda c, v: jax.ops.segment_sum(c, v, num_segments=n_vox + 1,
                                         indices_are_sorted=True)),
        contrib, vb_s)
    timed("C2 segsum sorted=False flag on sorted data", jax.jit(
        lambda c, v: jax.ops.segment_sum(c, v, num_segments=n_vox + 1)),
        contrib, vb_s)
    timed("D all fused (sort+gather+segsum)", jax.jit(
        lambda v, ww, p, f: jax.ops.segment_sum(
            (lambda s: f[s[2]] * s[1][:, None])(
                jax.lax.sort((v, ww, p), num_keys=1)),
            jax.lax.sort((v, ww, p), num_keys=1)[0],
            num_segments=n_vox + 1, indices_are_sorted=True)),
        vox_id, w, pix, feats)
    print("[done]", flush=True)


if __name__ == "__main__":
    main()
