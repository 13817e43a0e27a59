#!/usr/bin/env python
"""Hoist-proof breakdown: semantic encoder/neck, image branch glue, occ head."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch
    from coocc_tpu.models.coocc_ray import CoOccRay
    from coocc_tpu.nn.fpn3d import FPN3D
    from coocc_tpu.nn.occ_head import OccHead
    from coocc_tpu.nn.resnet3d import CustomResNet3D
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
    vox = jax.random.normal(key, (1, 100, 100, 8, 128), dtype)

    sem_enc = CustomResNet3D(depth=cfg.semantic.depth,
                             block_inplanes=cfg.semantic.block_inplanes,
                             block_strides=cfg.semantic.block_strides,
                             out_indices=cfg.semantic.out_indices, dtype=dtype)
    se = {c: t["semantic_encoder"] for c, t in variables.items()
          if "semantic_encoder" in t}
    timed("resnet3d enc", jax.jit(
        lambda v, x: sem_enc.apply(v, x, train=False)), se, vox)
    mid = jax.jit(lambda v, x: sem_enc.apply(v, x, train=False))(se, vox)
    mid = [m.block_until_ready() for m in mid]

    neck = FPN3D(in_channels=cfg.semantic.block_inplanes,
                 out_channels=cfg.semantic.neck_out_channels,
                 with_cp=False, dtype=dtype)
    sn = {c: t["semantic_neck"] for c, t in variables.items()
          if "semantic_neck" in t}
    timed("fpn3d neck", jax.jit(
        lambda v, x: neck.apply(v, list(x), train=False)), sn, mid)
    sem = jax.jit(lambda v, x: neck.apply(v, list(x), train=False))(sn, mid)
    sem = [s.block_until_ready() for s in sem]

    head = OccHead(cfg=cfg.occ_head, dtype=dtype)
    hv = {c: t["pts_bbox_head"] for c, t in variables.items()
          if "pts_bbox_head" in t}
    transform = tuple(
        getattr(batch, k)
        for k in ("rots", "trans", "intrins", "post_rots", "post_trans",
                  "bda"))
    imgf = jax.random.normal(key, (1, 6, 16, 44, 512), dtype)

    def full_head(v, s, imf):
        return head.apply(v, list(s), img_feats=imf, transform=transform,
                          train=False)["fine_logits"]

    timed("head full (+img)", jax.jit(full_head), hv, sem, imgf)


if __name__ == "__main__":
    main()
