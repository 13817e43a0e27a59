#!/usr/bin/env python
"""Per-term fwd+bwd latency of the training loss at flagship shapes.

profile_train.py attributed 159.8 ms (fwd+bwd) to full->loss — the loss
terms themselves, not any model stage. This times value_and_grad of each
term in isolation at the exact flagship shapes: depth BCE on the
DepthNet distribution, mode_pool_gt (target-only, fwd), the four coarse
voxel losses on [1,100,100,8,17], the four fine point losses at
topk=15000, and the render losses. The per-term sum should reconstruct
the marginal; the top terms are the optimization targets.

Usage: python tools/profile_loss.py
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
    from coocc_tpu.config.nuscenes import class_weights
    from coocc_tpu.losses.depth import bce_depth_loss
    from coocc_tpu.losses.gt_pool import mode_pool_gt
    from coocc_tpu.losses.lovasz import lovasz_softmax
    from coocc_tpu.losses.ssc import ce_ssc_loss, geo_scal_loss, sem_scal_loss
    from tools._prof import make_timer

    cfg = get_config("coocc_multi_r50_256x704")
    rng = np.random.RandomState(0)
    C = cfg.num_classes
    Xc, Yc, Zc = (s // 2 for s in cfg.occ_size)
    D = cfg.grid.num_depth_bins
    N = len(cfg.data.cams)
    fH = cfg.data.input_size[0] // cfg.lss.downsample
    fW = cfg.data.input_size[1] // cfg.lss.downsample
    P = cfg.occ_head.fine_topk

    logits = jnp.asarray(rng.randn(1, Xc, Yc, Zc, C).astype("f4"))
    gt_full = jnp.asarray(
        rng.randint(0, C, (1,) + tuple(cfg.occ_size)).astype("i4"))
    target_c = jax.jit(lambda g: mode_pool_gt(g, 2, C))(gt_full)
    target_c = jax.block_until_ready(target_c)
    weights = class_weights(C)
    depth_prob = jnp.asarray(
        rng.rand(1, N, fH, fW, D).astype("f4"))
    gt_depths = jnp.asarray(
        (rng.rand(1, N, *cfg.data.input_size) * 50).astype("f4")
        * (rng.rand(1, N, *cfg.data.input_size) < 0.02))
    fine_logits = jnp.asarray(rng.randn(1, P, C).astype("f4"))
    fg = jnp.asarray(rng.randint(0, C, (1, P)).astype("i4"))

    timed = make_timer()

    def vag(fn):
        def run(x, *a):
            return jax.value_and_grad(lambda xx: fn(xx, *a))(x)
        return run

    timed("mode_pool_gt (fwd only)",
          lambda g: mode_pool_gt(g, 2, C), gt_full)
    timed("depth_bce", vag(lambda dp: bce_depth_loss(
        dp, gt_depths, cfg.lss.downsample, cfg.grid.dbound)), depth_prob)
    timed("coarse_ce", vag(lambda l: ce_ssc_loss(
        l, target_c, weights, 255)), logits)
    timed("coarse_sem_scal", vag(lambda l: sem_scal_loss(
        l, target_c, 255)), logits)
    timed("coarse_geo_scal", vag(lambda l: geo_scal_loss(
        l, target_c, 255, cfg.empty_idx)), logits)
    timed("coarse_lovasz", vag(lambda l: lovasz_softmax(
        jax.nn.softmax(l, -1), target_c, 255)), logits)
    timed("fine_ce", vag(lambda l: ce_ssc_loss(l, fg, None, 255)),
          fine_logits)
    timed("fine_sem_scal", vag(lambda l: sem_scal_loss(l, fg, 255)),
          fine_logits)
    timed("fine_geo_scal", vag(lambda l: geo_scal_loss(
        l, fg, 255, cfg.empty_idx)), fine_logits)
    timed("fine_lovasz", vag(lambda l: lovasz_softmax(
        jax.nn.softmax(l, -1), fg, 255)), fine_logits)
    # fine gt gather at sampled coords (models/losses.py point_losses)
    coords = jnp.asarray(np.stack(
        [rng.randint(0, s, (1, P)) for s in cfg.occ_size], -1).astype("i4"))
    valid = jnp.asarray(rng.rand(1, P) < 0.9)

    def gather_loss(l):
        def gather_gt(t, cc, v):
            g = t[cc[:, 0], cc[:, 1], cc[:, 2]]
            return jnp.where(v, g, 255)
        gt = jax.vmap(gather_gt)(gt_full, coords, valid)
        return ce_ssc_loss(l, gt, None, 255)

    timed("fine_gather+ce", vag(gather_loss), fine_logits)


if __name__ == "__main__":
    main()
