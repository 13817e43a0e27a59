#!/usr/bin/env python
"""Image-branch and fuser internal latency breakdown (flagship shapes)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch
    from coocc_tpu.geometry.frustum import (create_frustum, gen_dx_bx,
                                            get_geometry, get_mlp_input)
    from coocc_tpu.models.coocc_ray import CoOccRay
    from coocc_tpu.nn.depthnet import DepthNet
    from coocc_tpu.nn.resnet2d import ResNet
    from coocc_tpu.nn.second_fpn import SECONDFPN
    from coocc_tpu.ops.lift_splat import lift_splat
    from coocc_tpu.ops.window_knn import make_offsets, window_knn
    from coocc_tpu.utils.init_utils import jit_init

    cfg = get_config("coocc_multi_r50_256x704")
    dtype = jnp.bfloat16
    model = CoOccRay(cfg=cfg, dtype=dtype)
    batch = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(x),
        synthetic_batch(cfg, batch_size=1),
        is_leaf=lambda x: x is None)
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                         train=False)

    from tools._prof import make_timer
    timed = make_timer()

    B, N, H, W, _ = batch.imgs.shape
    imgs = batch.imgs.reshape(B * N, H, W, 3)

    bb = ResNet(depth=cfg.img_backbone.depth,
                norm_eval=cfg.img_backbone.norm_eval, dtype=dtype)
    bbv = {c: t["img_backbone"] for c, t in variables.items()
           if "img_backbone" in t}
    timed("resnet50 6cam", jax.jit(
        lambda v, x: bb.apply(v, x, train=False)), bbv, imgs)
    feats = jax.jit(lambda v, x: bb.apply(v, x, train=False))(bbv, imgs)
    feats = [f.block_until_ready() for f in feats]

    neck = SECONDFPN(in_channels=cfg.img_neck.in_channels,
                     out_channels=cfg.img_neck.out_channels,
                     upsample_strides=cfg.img_neck.upsample_strides,
                     dtype=dtype)
    nkv = {c: t["img_neck"] for c, t in variables.items() if "img_neck" in t}
    timed("second_fpn", jax.jit(
        lambda v, f: neck.apply(v, list(f), train=False)), nkv, feats)
    x16 = jax.jit(lambda v, f: neck.apply(v, list(f), train=False))(nkv, feats)
    x16 = x16.block_until_ready()

    dn = DepthNet(mid_channels=cfg.lss.numC_input,
                  context_channels=cfg.lss.numC_Trans,
                  depth_channels=cfg.grid.num_depth_bins,
                  cam_channels=cfg.lss.cam_channels, dtype=dtype)
    dnv = {c: t["img_view_transformer"]["depth_net"]
           for c, t in variables.items() if "img_view_transformer" in t}
    mlp_input = get_mlp_input(batch.rots, batch.trans, batch.intrins,
                              batch.post_rots, batch.post_trans, batch.bda)
    mlp_input = mlp_input.reshape(B * N, -1)
    timed("depth_net", jax.jit(
        lambda v, x, m: dn.apply(v, x, m, train=False)), dnv, x16, mlp_input)
    out = jax.jit(lambda v, x, m: dn.apply(v, x, m, train=False))(
        dnv, x16, mlp_input).block_until_ready()

    D = cfg.grid.num_depth_bins
    fH, fW = x16.shape[1], x16.shape[2]
    depth_logit = out[..., :D]
    img_feat = out[..., D:D + cfg.lss.numC_Trans]
    frustum = jnp.asarray(create_frustum(cfg.data.input_size,
                                         cfg.lss.downsample, cfg.grid.dbound))
    dx, bx, nxg = gen_dx_bx(cfg.grid.xbound, cfg.grid.ybound, cfg.grid.zbound)

    @jax.jit
    def s_splat(dl, imf, rots, trans, intrins, post_rots, post_trans, bda):
        dp = jax.nn.softmax(dl, axis=-1)
        geom = get_geometry(frustum, rots, trans, intrins, post_rots,
                            post_trans, bda)
        dp = dp.reshape(B, N, fH, fW, D).transpose(0, 1, 4, 2, 3)
        return lift_splat(dp.astype(jnp.float32),
                          imf.reshape(B, N, fH, fW, -1).astype(jnp.float32),
                          geom, dx, bx, nxg)

    timed("geom+softmax+lift_splat", s_splat, depth_logit, img_feat,
          batch.rots, batch.trans, batch.intrins, batch.post_rots,
          batch.post_trans, batch.bda)

    # ---- fuser internals ----
    fcfg = cfg.fuser
    X, Y, Z = (s // 2 for s in cfg.occ_size)
    key = jax.random.PRNGKey(1)
    imgv = jax.random.normal(key, (100, 100, 8, 128), dtype)
    imgv = imgv * (jax.random.uniform(key, (100, 100, 8, 1)) < 0.5)
    ptsv = jax.random.normal(key, (100, 100, 8, 128), dtype)
    ptsv = ptsv * (jax.random.uniform(jax.random.fold_in(key, 1),
                                      (100, 100, 8, 1)) < 0.5)
    offsets = make_offsets(4, 4, 7, fcfg.dist_thresh)
    print(f"[window offsets: {offsets.shape[0]}]", flush=True)

    @jax.jit
    def s_knn(iv):
        act = jnp.abs(iv).sum(-1) != 0
        return window_knn(act, offsets, fcfg.knum)

    timed("window_knn (one modality)", s_knn, imgv)
    nn_img = s_knn(imgv).block_until_ready()

    @jax.jit
    def s_gather(iv, idxs):
        flat = iv.reshape(-1, 128)
        safe = jnp.maximum(idxs, 0)
        g = flat[safe.reshape(-1)].reshape(100, 100, 8, 2, 128)
        g = g * (idxs >= 0)[..., None]
        return g.reshape(100, 100, 8, 256)

    timed("knn gather (one modality)", s_gather, imgv, nn_img)


if __name__ == "__main__":
    main()
