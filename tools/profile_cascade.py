#!/usr/bin/env python
"""OccHead cascade fine-path internal breakdown at flagship eval shapes.

The prefix profile puts the cascade at ~15 ms/frame (coarse->full marginal,
tools/profile_prefix.py --stages sem,coarse,full); this isolates the pieces:
select_occupied, cascade_sample_3d (voxel trilinear GEMM), the image
projection + multicam bilinear GEMM, and the GN/MLP tail.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from coocc_tpu.config import get_config
    from coocc_tpu.nn.occ_head import (fine_coordinates,
                                       project_points_on_img,
                                       select_occupied)
    from coocc_tpu.ops.grid_sample import (cascade_sample_3d,
                                           multicam_bilinear_gemm)
    from tools._prof import make_timer

    cfg = get_config("coocc_multi_r50_256x704")
    hc = cfg.occ_head
    cd = jnp.bfloat16
    X, Y, Z = 100, 100, 8
    Cvox = 64
    cap = hc.max_coarse_occupied
    ratio = hc.cascade_ratio
    N, fH, fW = cfg.data.num_cams, 16, 44
    W_occ, H_occ, D_occ = hc.final_occ_size

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray(rng.randn(X, Y, Z, hc.out_channel), jnp.float32)
    blended_t = jnp.asarray(rng.randn(X, Y, Z, Cvox), cd)
    imf = jnp.asarray(rng.randn(N, fH, fW, Cvox), cd)
    rots = jnp.tile(jnp.eye(3)[None], (N, 1, 1)).astype(jnp.float32)
    trans = jnp.asarray(rng.randn(N, 3), jnp.float32)
    intr = jnp.asarray(np.stack([np.diag([500.0, 500.0, 1.0])] * N),
                       jnp.float32)
    posts = (jnp.tile(jnp.eye(3)[None], (N, 1, 1)).astype(jnp.float32),
             jnp.zeros((N, 3), jnp.float32))
    bda = jnp.eye(3, dtype=jnp.float32)

    timed = make_timer()

    def s_select(lg):
        mask = jnp.argmax(lg, axis=-1) != cfg.empty_idx
        coords, valid = select_occupied(mask, cap, None)
        fine = fine_coordinates(coords, ratio)
        return coords, valid, fine

    timed("select+coords", s_select, logits)

    def s_vox(lg, bl):
        coords, valid, fine = s_select(lg)
        return cascade_sample_3d(bl, coords, ratio, (W_occ, H_occ, D_occ),
                                 compute_dtype=cd)

    timed("+cascade_sample_3d", s_vox, logits, blended_t)

    def s_proj(lg):
        coords, valid, fine = s_select(lg)
        uv, m = project_points_on_img(
            fine.astype(jnp.float32), rots, trans, intr, posts[0], posts[1],
            bda, pts_range=hc.point_cloud_range, img_hw=hc.input_size,
            occ_whd=(W_occ, H_occ, D_occ), data_type=hc.data_type)
        return uv, m

    timed("select+project", s_proj, logits)

    def s_gemm(lg, f):
        uv, m = s_proj(lg)
        return multicam_bilinear_gemm(f, uv, m, align_corners=True,
                                      compute_dtype=cd)

    timed("+multicam_gemm", s_gemm, logits, imf)


if __name__ == "__main__":
    main()
