#!/usr/bin/env python
"""OccHead internals: coarse stack, occupied-selection, voxel/img sampling."""
from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch
    from coocc_tpu.models.coocc_ray import CoOccRay
    from coocc_tpu.nn.occ_head import (OccHead, fine_coordinates,
                                       project_points_on_img,
                                       select_occupied)
    from coocc_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d
    from coocc_tpu.utils.init_utils import jit_init
    from tools._prof import make_timer

    cfg = get_config("coocc_multi_r50_256x704")
    dtype = jnp.bfloat16
    model = CoOccRay(cfg=cfg, dtype=dtype)
    batch = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(x),
        synthetic_batch(cfg, batch_size=1),
        is_leaf=lambda x: x is None)
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                         train=False)
    timed = make_timer()
    key = jax.random.PRNGKey(1)
    sem = [jax.random.normal(jax.random.fold_in(key, i),
                             (1, 100 // (2 ** i), 100 // (2 ** i),
                              max(1, 8 // (2 ** i)), 256), dtype)
           for i in range(4)]
    hv = {c: t["pts_bbox_head"] for c, t in variables.items()
          if "pts_bbox_head" in t}

    coarse_head = OccHead(
        cfg=dataclasses.replace(cfg.occ_head, cascade_ratio=1), dtype=dtype)
    timed("coarse stack", jax.jit(
        lambda v, s: coarse_head.apply(v, list(s), train=False)["occ"]),
        hv, sem)

    cap = cfg.occ_head.max_coarse_occupied
    occ_mask = jax.random.uniform(key, (100, 100, 8)) < 0.3

    def s_select(logits_like):
        mask = logits_like.sum(-1) > 0
        coords, valid = select_occupied(mask[0], cap, None)
        return fine_coordinates(coords, 2), valid

    timed("select+fine coords", s_select,
          jax.random.normal(key, (1, 100, 100, 8, 4), jnp.float32))

    blended = jax.random.normal(key, (8, 100, 100, 128), dtype)
    fine = jax.random.randint(key, (cap * 8, 3), 0, 190).astype(jnp.int32)

    def s_vox_sample(vol, f):
        norm = (f.astype(jnp.float32) / 199.0 - 0.5) * 2
        return grid_sample_3d(vol, norm, align_corners=False,
                              padding_mode="zeros")

    timed("voxel grid_sample 160k", s_vox_sample, blended, fine)

    imf = jax.random.normal(key, (6, 16, 44, 128), dtype)
    tr = tuple(t[0] for t in (batch.rots, batch.trans, batch.intrins,
                              batch.post_rots, batch.post_trans))

    def s_img_sample(imf_, f):
        uv, m = project_points_on_img(
            f.astype(jnp.float32), tr[0], tr[1], tr[2], tr[3], tr[4],
            batch.bda[0], pts_range=cfg.occ_head.point_cloud_range,
            img_hw=cfg.occ_head.input_size, occ_whd=(200, 200, 16))
        s = jax.vmap(lambda img, g: grid_sample_2d(
            img, g, align_corners=True, padding_mode="zeros"))(imf_, uv)
        return (s * m[..., None]).sum(0)

    timed("project+img sample 160k x6", s_img_sample, imf, fine)

    x = jax.random.normal(key, (cap * 8, 192), dtype)
    w1 = jax.random.normal(key, (192, 64), dtype)
    w2 = jax.random.normal(key, (64, 17), dtype)

    def s_mlp(x, w1, w2):
        return jax.nn.relu(x @ w1) @ w2

    timed("fine mlp", s_mlp, x, w1, w2)


if __name__ == "__main__":
    main()
