"""DepthNet supervision: min-pooled one-hot GT + masked BCE.

Capability parity with ViewTransformerLiftSplatShootVoxel.get_bce_depth_loss /
get_downsampled_gt_depth (reference: ViewTransformerLSSVoxel.py:31-71):
GT depth maps are min-pooled (0 = missing -> +inf) to the frustum stride,
binned into D one-hot bins, and the per-pixel BCE over the predicted softmax
is summed over foreground pixels / fg count.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


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


def gaussian_depth_target(gt_depths, downsample: int, dbound, D: int,
                          constant_std: float = 0.5):
    """Gaussian-smoothed depth target (constant-std branch).

    Parity with generate_guassian_depth_target
    (reference: utils/gaussian.py:92-135, constant_std path): per
    downsample-patch min over nonzero depths; the target distribution is the
    bin-differenced CDF of Normal(min/step, std/step) evaluated at the RAW
    depth edge values arange(d0 - step/2, d1, step) — the reference evaluates
    bin-normalized Gaussians at unnormalized edges; we replicate that quirk.

    Returns (depth_dist [B*N, h, w, D], min_depth [B*N, h, w]).
    """
    B, N, H, W = gt_depths.shape
    h, w = H // downsample, W // downsample
    x = gt_depths.reshape(B * N, h, downsample, w, downsample)
    x = x.transpose(0, 1, 3, 2, 4).reshape(B * N, h, w,
                                           downsample * downsample)
    valid = x != 0.0
    xv = jnp.where(valid, x, 1e10)
    min_depth = xv.min(axis=-1)
    min_depth = jnp.where(min_depth == 1e10, 0.0, min_depth)

    edges = np.arange(dbound[0] - dbound[2] / 2.0, dbound[1], dbound[2],
                      dtype=np.float32)
    assert edges.shape[0] == D + 1, (edges.shape, D)
    inv_scale = dbound[2] / constant_std  # 1 / (std/step)
    z = (edges - (min_depth / dbound[2])[..., None]) * inv_scale
    cdfs = jax.scipy.special.ndtr(z)  # [B*N, h, w, D+1]
    return cdfs[..., 1:] - cdfs[..., :-1], min_depth


def kld_depth_loss(depth_prob, gt_depths, downsample: int, dbound,
                   constant_std: float = 0.5):
    """KL(target || pred) over foreground pixels, 'batchmean' reduction.

    Parity with get_klv_depth_loss (ViewTransformerLSSVoxel.py:73-87):
    torch F.kl_div(log(pred + 1e-4), target, reduction='batchmean') masked to
    pixels whose patch-min depth lies in [d0, d1 - step].
    depth_prob: [B, N, fH, fW, D] softmax; gt_depths: [B, N, H, W].
    """
    B, N, fH, fW, D = depth_prob.shape
    labels, min_depth = gaussian_depth_target(
        gt_depths, downsample, dbound, D, constant_std)
    v = min_depth.reshape(-1)
    fg = (v >= dbound[0]) & (v <= dbound[1] - dbound[2])
    labels = labels.reshape(-1, D)
    preds = depth_prob.reshape(-1, D).astype(jnp.float32)
    logp = jnp.log(preds + 1e-4)
    # torch kl_div zero-masks target<=0 entries (xlogy semantics)
    kl = jnp.where(labels > 0,
                   labels * (jnp.log(jnp.maximum(labels, 1e-38)) - logp), 0.0)
    kl = kl * fg[:, None]
    return kl.sum() / jnp.maximum(fg.sum(), 1)


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
