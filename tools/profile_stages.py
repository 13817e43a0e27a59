#!/usr/bin/env python
"""Per-stage on-chip latency breakdown of the flagship model.

Times each pipeline stage as its own jitted sub-graph with scalar readback
(the axon relay resolves block_until_ready at enqueue — see
.claude/skills/verify/SKILL.md), subtracting a trivial-jit round-trip
baseline. Mirrors the reference's record_time/logging_latencies
(coocc_ray.py:76-77,497-508) at stage granularity.

Usage: python tools/profile_stages.py [config] [--reps 5]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default="coocc_multi_r50_256x704")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--stages", default="all",
                   help="comma list: vox,pts,img,fuse,sem,head")
    args = p.parse_args()
    want = set(args.stages.split(",")) if args.stages != "all" else None

    import jax
    import jax.numpy as jnp
    import numpy as np

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch
    from coocc_tpu.models.coocc_ray import Batch, CoOccRay
    from coocc_tpu.nn.bifuser import BiFuserN
    from coocc_tpu.nn.fpn3d import FPN3D
    from coocc_tpu.nn.occ_head import OccHead
    from coocc_tpu.nn.resnet3d import CustomResNet3D
    from coocc_tpu.nn.sparse_enc_packed import PackedLiDAREnc8x
    from coocc_tpu.ops.sparse_conv import SparseTensor
    from coocc_tpu.ops.voxelize import voxelize_mask
    from coocc_tpu.utils.init_utils import jit_init

    cfg = get_config(args.config)
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    dtype = jnp.bfloat16  # bench uses bf16
    model = CoOccRay(cfg=cfg, dtype=dtype)
    batch = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(x),
        synthetic_batch(cfg, batch_size=1),
        is_leaf=lambda x: x is None)
    t0 = time.perf_counter()
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                         train=False)
    print(f"[init {time.perf_counter()-t0:.0f}s]", flush=True)

    def sub_vars(name):
        return {col: {name: tree[name]} for col, tree in variables.items()
                if name in tree}

    def merged_vars(names):
        return {col: {n: tree[n] for n in names if n in tree}
                for col, tree in variables.items()}

    @jax.jit
    def trivial(x):
        return (x * 2.0).sum()

    xsmall = jnp.ones((8, 128))
    float(trivial(xsmall))

    from tools._prof import make_timer
    _timed = make_timer()

    def timed(fn, *a):
        return _timed("stage", fn, *a)

    t_rt = 0.0
    report = {}

    pts_cfg = cfg.pts
    max_vox = pts_cfg.max_voxels_test

    # ---- stage 1: voxelize (mask-only fast path, as the model uses) ----
    @jax.jit
    def s_vox(points, mask):
        return jax.vmap(lambda p, m: voxelize_mask(
            p, m, cfg.point_cloud_range, pts_cfg.voxel_size,
            pts_cfg.sparse_shape_xyz, max_voxels=max_vox))(points, mask)

    if want is None or "vox" in want:
        print("voxelize_mask:", flush=True)
        report["voxelize"] = timed(s_vox, batch.points, batch.points_mask) - t_rt
        print(f"  -> {report['voxelize']*1e3:.1f} ms", flush=True)
    mask0 = s_vox(batch.points, batch.points_mask).block_until_ready()

    # ---- stage 2: lidar encoder (packed) ----
    enc = PackedLiDAREnc8x(
        input_channel=pts_cfg.input_channel, base_channel=pts_cfg.base_channel,
        out_channel=pts_cfg.out_channel,
        sparse_shape_xyz=pts_cfg.sparse_shape_xyz, capacity=max_vox,
        compute_dtype=dtype or jnp.float32)
    enc_vars = {c: t["pts_middle_encoder"] for c, t in variables.items()
                if "pts_middle_encoder" in t}

    @jax.jit
    def s_enc(ev, points, mask):
        m0 = jax.vmap(lambda p, m: voxelize_mask(
            p, m, cfg.point_cloud_range, pts_cfg.voxel_size,
            pts_cfg.sparse_shape_xyz, max_voxels=max_vox))(points, mask)
        return enc.apply(ev, m0, train=False)

    if want is None or "pts" in want:
        print("pts branch (vox+enc):", flush=True)
        report["pts_branch"] = timed(
            s_enc, enc_vars, batch.points, batch.points_mask) - t_rt
        print(f"  -> {report['pts_branch']*1e3:.1f} ms", flush=True)
    pts_voxel = s_enc(enc_vars, batch.points, batch.points_mask)
    pts_voxel = pts_voxel.astype(dtype or jnp.float32).block_until_ready()

    # ---- stage 3: image branch (backbone+neck+depthnet+splat) ----
    from coocc_tpu.geometry.frustum import get_mlp_input
    from coocc_tpu.nn.lss import LSSViewTransformerVoxel
    from coocc_tpu.nn.resnet2d import ResNet
    from coocc_tpu.nn.second_fpn import SECONDFPN

    bb = ResNet(depth=cfg.img_backbone.depth,
                norm_eval=cfg.img_backbone.norm_eval, dtype=dtype)
    neck = SECONDFPN(in_channels=cfg.img_neck.in_channels,
                     out_channels=cfg.img_neck.out_channels,
                     upsample_strides=cfg.img_neck.upsample_strides,
                     dtype=dtype)
    lss = LSSViewTransformerVoxel(cfg=cfg, dtype=dtype)
    bb_vars = {c: t["img_backbone"] for c, t in variables.items()
               if "img_backbone" in t}
    nk_vars = {c: t["img_neck"] for c, t in variables.items()
               if "img_neck" in t}
    vt_vars = {c: t["img_view_transformer"] for c, t in variables.items()
               if "img_view_transformer" in t}

    @jax.jit
    def s_img(bv, nv, vv, b):
        B, N, H, W, _ = b.imgs.shape
        x = b.imgs.reshape(B * N, H, W, 3)
        feats = bb.apply(bv, x, train=False)
        x = neck.apply(nv, feats, train=False)
        fH, fW, C = x.shape[-3:]
        x = x.reshape(B, N, fH, fW, C)
        mlp_input = get_mlp_input(b.rots, b.trans, b.intrins,
                                  b.post_rots, b.post_trans, b.bda)
        bev, depth_prob, geom = lss.apply(
            vv, x, b.rots, b.trans, b.intrins, b.post_rots,
            b.post_trans, b.bda, mlp_input, train=False)
        return bev, depth_prob, x, geom

    if cfg.use_camera and (want is None or "img" in want):
        print("image branch:", flush=True)
        report["img_branch"] = timed(s_img, bb_vars, nk_vars, vt_vars,
                                     batch) - t_rt
        print(f"  -> {report['img_branch']*1e3:.1f} ms", flush=True)
    img_voxel = None
    if cfg.use_camera:
        img_voxel, _, img_feats, _ = s_img(bb_vars, nk_vars, vt_vars, batch)
        img_voxel = img_voxel.block_until_ready()

    # ---- stage 4: fuser ----
    if cfg.fuser is not None and img_voxel is not None:
        fuser = BiFuserN(in_channels=cfg.fuser.in_channels,
                         out_channels=cfg.fuser.out_channels,
                         knum=cfg.fuser.knum,
                         dist_thresh=cfg.fuser.dist_thresh, dtype=dtype)
        f_vars = {c: t["occ_fuser"] for c, t in variables.items()
                  if "occ_fuser" in t}

        @jax.jit
        def s_fuse(vs, a, b):
            return fuser.apply(vs, a, b, train=False)

        if want is None or "fuse" in want:
            print("fuser:", flush=True)
            report["fuser"] = timed(s_fuse, f_vars, img_voxel, pts_voxel) - t_rt
            print(f"  -> {report['fuser']*1e3:.1f} ms", flush=True)
        voxel_feats = jax.jit(s_fuse)(f_vars, img_voxel, pts_voxel)
    else:
        voxel_feats = img_voxel if pts_voxel is None else pts_voxel
    voxel_feats = voxel_feats.block_until_ready()

    # ---- stage 5: semantic encoder + neck ----
    sem_enc = CustomResNet3D(depth=cfg.semantic.depth,
                             block_inplanes=cfg.semantic.block_inplanes,
                             block_strides=cfg.semantic.block_strides,
                             out_indices=cfg.semantic.out_indices, dtype=dtype)
    sem_neck = FPN3D(in_channels=cfg.semantic.block_inplanes,
                     out_channels=cfg.semantic.neck_out_channels,
                     with_cp=False, dtype=dtype)
    se_vars = {c: t["semantic_encoder"] for c, t in variables.items()
               if "semantic_encoder" in t}
    sn_vars = {c: t["semantic_neck"] for c, t in variables.items()
               if "semantic_neck" in t}

    @jax.jit
    def s_sem(ev, nv, x):
        mid = sem_enc.apply(ev, x, train=False)
        return sem_neck.apply(nv, mid, train=False)

    if want is None or "sem" in want:
        print("semantic enc+neck:", flush=True)
        report["semantic"] = timed(s_sem, se_vars, sn_vars, voxel_feats) - t_rt
    semantic = jax.jit(s_sem)(se_vars, sn_vars, voxel_feats)
    semantic = [s.block_until_ready() for s in semantic]

    # ---- stage 6: occ head ----
    head = OccHead(cfg=cfg.occ_head, dtype=dtype)
    h_vars = {c: t["pts_bbox_head"] for c, t in variables.items()
              if "pts_bbox_head" in t}
    transform = None
    if batch.rots is not None:
        transform = (batch.rots, batch.trans, batch.intrins,
                     batch.post_rots, batch.post_trans, batch.bda)

    @jax.jit
    def s_head(hv, sem, imf):
        return head.apply(hv, list(sem), img_feats=imf, transform=transform,
                          train=False)["occ"].sum()

    if want is None or "head" in want:
        print("occ head:", flush=True)
        report["occ_head"] = timed(
            s_head, h_vars, semantic,
            img_feats if cfg.use_camera else None) - t_rt
        print(f"  -> {report['occ_head']*1e3:.1f} ms", flush=True)

    total = sum(report.values())
    print("\n=== stage breakdown (ms, median of %d) ===" % args.reps)
    for k, v in sorted(report.items(), key=lambda kv: -kv[1]):
        print(f"  {k:14s} {v*1e3:8.1f}  ({v/total:5.1%})")
    print(f"  {'SUM':14s} {total*1e3:8.1f}  -> {1.0/total:.2f} fps equiv")


if __name__ == "__main__":
    main()
