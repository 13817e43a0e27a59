#!/usr/bin/env python
"""Per-stage XLA FLOP/byte breakdown of the flagship eval forward (CPU-safe).

Complements tools/profile_stages.py (wall-time on chip) with compile-time
cost analysis that runs anywhere: each pipeline stage is lowered+compiled
separately and its cost_analysis() reported. FLOP counts are backend-
independent; bytes are indicative only (gathers overcounted).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default="coocc_multi_r50_256x704")
    p.add_argument("--cpu", action="store_true", default=True)
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch
    from coocc_tpu.geometry.frustum import get_mlp_input
    from coocc_tpu.models.coocc_ray import CoOccRay
    from coocc_tpu.nn.bifuser import BiFuserN
    from coocc_tpu.nn.fpn3d import FPN3D
    from coocc_tpu.nn.lss import LSSViewTransformerVoxel
    from coocc_tpu.nn.occ_head import OccHead
    from coocc_tpu.nn.resnet2d import ResNet
    from coocc_tpu.nn.resnet3d import CustomResNet3D
    from coocc_tpu.nn.second_fpn import SECONDFPN
    from coocc_tpu.nn.sparse_enc_packed import PackedLiDAREnc8x
    from coocc_tpu.ops.voxelize import voxelize_mask
    from coocc_tpu.utils.init_utils import jit_init

    cfg = get_config(args.config)
    dtype = jnp.bfloat16
    model = CoOccRay(cfg=cfg, dtype=dtype)
    batch = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(x),
        synthetic_batch(cfg, batch_size=1), is_leaf=lambda x: x is None)
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                         train=False)

    def sub(name):
        return {c: t[name] for c, t in variables.items() if name in t}

    def report(tag, fn, *a):
        comp = jax.jit(fn).lower(*a).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        print(f"{tag:16s} flops {ca.get('flops', 0)/1e12:7.3f} T   "
              f"bytes {ca.get('bytes accessed', 0)/1e9:7.2f} G", flush=True)
        return fn(*a)

    pts_cfg = cfg.pts
    max_vox = pts_cfg.max_voxels_test

    def s_vox(points, mask):
        return jax.vmap(lambda p, m: voxelize_mask(
            p, m, cfg.point_cloud_range, pts_cfg.voxel_size,
            pts_cfg.sparse_shape_xyz, max_voxels=max_vox))(points, mask)

    mask0 = report("voxelize", s_vox, batch.points, batch.points_mask)

    enc = PackedLiDAREnc8x(
        input_channel=pts_cfg.input_channel, base_channel=pts_cfg.base_channel,
        out_channel=pts_cfg.out_channel,
        sparse_shape_xyz=pts_cfg.sparse_shape_xyz, capacity=max_vox,
        compute_dtype=dtype)
    ev = {c: t["pts_middle_encoder"] for c, t in variables.items()
          if "pts_middle_encoder" in t}
    pts_voxel = report("pts_encoder", lambda v, m: enc.apply(
        v, m, train=False), ev, mask0)
    pts_voxel = pts_voxel.astype(dtype)

    # ztap variant for comparison
    encz = PackedLiDAREnc8x(
        input_channel=pts_cfg.input_channel, base_channel=pts_cfg.base_channel,
        out_channel=pts_cfg.out_channel,
        sparse_shape_xyz=pts_cfg.sparse_shape_xyz, capacity=max_vox,
        compute_dtype=dtype, ztap_levels=(1, 2, 3))
    report("pts_enc ztap123", lambda v, m: encz.apply(
        v, m, train=False), ev, mask0)

    bb = ResNet(depth=cfg.img_backbone.depth,
                norm_eval=cfg.img_backbone.norm_eval, dtype=dtype)
    neck = SECONDFPN(in_channels=cfg.img_neck.in_channels,
                     out_channels=cfg.img_neck.out_channels,
                     upsample_strides=cfg.img_neck.upsample_strides,
                     dtype=dtype)
    lss = LSSViewTransformerVoxel(cfg=cfg, dtype=dtype)

    def s_img(bv, nv, vv, b):
        B, N, H, W, _ = b.imgs.shape
        x = b.imgs.reshape(B * N, H, W, 3)
        feats = bb.apply(bv, x, train=False)
        x = neck.apply(nv, feats, train=False)
        fH, fW, C = x.shape[-3:]
        x = x.reshape(B, N, fH, fW, C)
        mlp_input = get_mlp_input(b.rots, b.trans, b.intrins,
                                  b.post_rots, b.post_trans, b.bda)
        return lss.apply(vv, x, b.rots, b.trans, b.intrins, b.post_rots,
                         b.post_trans, b.bda, mlp_input, train=False)

    img_voxel, _, _ = report(
        "img_branch", s_img, sub("img_backbone"), sub("img_neck"),
        sub("img_view_transformer"), batch)
    B, N, H, W, _ = batch.imgs.shape
    x6 = batch.imgs.reshape(B * N, H, W, 3)
    feats = bb.apply(sub("img_backbone"), x6, train=False)
    img_feats = neck.apply(sub("img_neck"), feats, train=False)
    fH, fW, Cn = img_feats.shape[-3:]
    img_feats = img_feats.reshape(B, N, fH, fW, Cn)

    fuser = BiFuserN(in_channels=cfg.fuser.in_channels,
                     out_channels=cfg.fuser.out_channels, knum=cfg.fuser.knum,
                     dist_thresh=cfg.fuser.dist_thresh, dtype=dtype)
    fv = {c: t["occ_fuser"] for c, t in variables.items()
          if "occ_fuser" in t}
    voxel_feats = report("fuser", lambda v, a, b: fuser.apply(
        v, a, b, train=False), fv, img_voxel, pts_voxel)

    sem_enc = CustomResNet3D(depth=cfg.semantic.depth,
                             block_inplanes=cfg.semantic.block_inplanes,
                             block_strides=cfg.semantic.block_strides,
                             out_indices=cfg.semantic.out_indices, dtype=dtype)
    sem_neck = FPN3D(in_channels=cfg.semantic.block_inplanes,
                     out_channels=cfg.semantic.neck_out_channels,
                     with_cp=False, dtype=dtype)
    sev = {c: t["semantic_encoder"] for c, t in variables.items()
           if "semantic_encoder" in t}
    snv = {c: t["semantic_neck"] for c, t in variables.items()
           if "semantic_neck" in t}

    def s_sem(ev_, nv_, x):
        return sem_neck.apply(nv_, sem_enc.apply(ev_, x, train=False),
                              train=False)

    semantic = report("semantic", s_sem, sev, snv, voxel_feats)

    head = OccHead(cfg=cfg.occ_head, dtype=dtype)
    hv = {c: t["pts_bbox_head"] for c, t in variables.items()
          if "pts_bbox_head" in t}
    transform = (batch.rots, batch.trans, batch.intrins,
                 batch.post_rots, batch.post_trans, batch.bda)
    report("occ_head", lambda v, s, f: head.apply(
        v, list(s), img_feats=f, transform=transform,
        train=False)["occ"].sum(), hv, semantic, img_feats)


if __name__ == "__main__":
    main()
