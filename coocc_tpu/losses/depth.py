"""DepthNet supervision: min-pooled one-hot GT + masked BCE.

Capability parity with ViewTransformerLiftSplatShootVoxel.get_bce_depth_loss /
get_downsampled_gt_depth (reference: ViewTransformerLSSVoxel.py:31-71):
GT depth maps are min-pooled (0 = missing -> +inf) to the frustum stride,
binned into D one-hot bins, and the per-pixel BCE over the predicted softmax
is summed over foreground pixels / fg count.
"""
from __future__ import annotations

import jax.numpy as jnp


def downsample_gt_depth(gt_depths, downsample: int, dbound, D: int):
    """[B, N, H, W] -> one-hot [B*N*h*w, D] (and fg mask [B*N*h*w])."""
    B, N, H, W = gt_depths.shape
    h, w = H // downsample, W // downsample
    x = gt_depths.reshape(B * N, h, downsample, w, downsample)
    x = x.transpose(0, 1, 3, 2, 4).reshape(-1, downsample * downsample)
    x = jnp.where(x == 0.0, 1e5, x)
    x = x.min(axis=-1)
    # bin index: (d - (d0 - step/2)) / step, valid bins 1..D after shift
    x = (x - (dbound[0] - dbound[2] / 2.0)) / dbound[2]
    x = jnp.where((x < D + 1) & (x >= 0.0), x, 0.0)
    idx = x.astype(jnp.int32)  # 0 = background
    onehot = (idx[:, None] == jnp.arange(1, D + 1)[None, :]).astype(jnp.float32)
    return onehot


def bce_depth_loss(depth_prob, gt_depths, downsample: int, dbound):
    """depth_prob: [B, N, fH, fW, D] softmax; gt_depths: [B, N, H, W]."""
    B, N, fH, fW, D = depth_prob.shape
    labels = downsample_gt_depth(gt_depths, downsample, dbound, D)
    preds = depth_prob.reshape(-1, D)
    fg = labels.max(axis=1) > 0.0
    p = jnp.clip(preds, 1e-12, 1.0 - 1e-12)
    bce = -(labels * jnp.log(p) + (1.0 - labels) * jnp.log(1.0 - p))
    bce = bce * fg[:, None]
    return bce.sum() / jnp.maximum(fg.sum(), 1.0)
