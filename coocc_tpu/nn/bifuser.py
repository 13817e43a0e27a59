"""BiFuser_N: bidirectional grid-space KNN fusion of camera & LiDAR voxels.

Capability parity with the reference GSFusion fuser
(coocc/fuser/bifuser_n.py:14-174): for each nonzero LiDAR voxel, gather the
knum nearest nonzero image voxels' features, encode through a shared
Linear+ReLU, MULTIPLY with the local features; symmetrically for image
voxels; concat [img, pts, fused_img, fused_pts] and mix with a 2-layer
Conv3d+BN3d(eps 1e-3, momentum 0.01)+ReLU stack.

The KNN itself runs dense on the grid (coocc_tpu.ops.window_knn) — see that
module for the exactness/approximation trade vs the reference's FPS+ball
query. Invalid (no in-window/in-threshold) neighbours contribute zeros
instead of the reference's wrap-to-last-voxel indexing quirk.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.window_knn import make_offsets, window_knn
from .layers import BatchNorm, Conv3d, Linear


class BiFuserN(nn.Module):
    in_channels: int = 128
    out_channels: int = 128
    knum: int = 2
    dist_thresh: float = 13.3
    window_rx: int = 4
    window_ry: int = 4
    window_rz: int = 7
    # img-key search radii (None -> window_r*): the image modality covers
    # the LSS frustum densely, so the pts->img direction tolerates a much
    # smaller window at near-equal miss rate (see FuserConfig)
    window_img_rx: Any = None
    window_img_ry: Any = None
    window_img_rz: Any = None
    dtype: Any = None

    @nn.compact
    def __call__(self, img_feats, pts_feats, train: bool = False):
        """img_feats, pts_feats: [B, X, Y, Z, C] -> [B, X, Y, Z, out]."""
        B, X, Y, Z, C = img_feats.shape
        k = self.knum
        offsets = make_offsets(self.window_rx, self.window_ry, self.window_rz,
                               self.dist_thresh)
        offsets_img = make_offsets(
            self.window_img_rx if self.window_img_rx is not None
            else self.window_rx,
            self.window_img_ry if self.window_img_ry is not None
            else self.window_ry,
            self.window_img_rz if self.window_img_rz is not None
            else self.window_rz,
            self.dist_thresh)

        knn_enc = Linear(self.out_channels, dtype=self.dtype, name="knn_enc")

        def gather_knn(feats_flat, idxs):
            """feats_flat: [XYZ, C]; idxs: [X, Y, Z, k] -> [X, Y, Z, k*C]."""
            safe = jnp.maximum(idxs, 0)
            g = feats_flat[safe.reshape(-1)].reshape(X, Y, Z, k, C)
            g = g * (idxs >= 0)[..., None]
            return g.reshape(X, Y, Z, k * C)

        def fuse_one(img_b, pts_b):
            img_active = jnp.abs(img_b).sum(-1) != 0
            pts_active = jnp.abs(pts_b).sum(-1) != 0
            # nearest IMG voxels for every cell; used at pts-active cells
            nn_img = window_knn(img_active, offsets_img, k)
            nn_pts = window_knn(pts_active, offsets, k)
            g_img = gather_knn(img_b.reshape(-1, C), nn_img)
            g_pts = gather_knn(pts_b.reshape(-1, C), nn_pts)
            return g_img, g_pts, pts_active, img_active

        # NOT vmap: batched gathers/min-reductions lower measurably worse
        # than their unbatched forms on TPU (same pathology as the vmapped
        # lift-splat sort). B == 1 keeps the bare unbatched lowering; B > 1
        # runs the same per-sample program under lax.map so the traced HLO
        # stays constant-size in B instead of unrolling.
        if B == 1:
            per = fuse_one(img_feats[0], pts_feats[0])
            g_img, g_pts, pts_active, img_active = (t[None] for t in per)
        else:
            g_img, g_pts, pts_active, img_active = jax.lax.map(
                lambda a: fuse_one(*a), (img_feats, pts_feats))

        fused_img = nn.relu(knn_enc(g_img)) * pts_feats
        fused_img = fused_img * pts_active[..., None]
        fused_pts = nn.relu(knn_enc(g_pts)) * img_feats
        fused_pts = fused_pts * img_active[..., None]

        x = jnp.concatenate([img_feats, pts_feats, fused_img, fused_pts],
                            axis=-1)
        # reference con_enc uses plain nn.BatchNorm3d (default eps/momentum),
        # not the eps=1e-3 norm_cfg (bifuser_n.py:23-30)
        x = Conv3d(self.out_channels * 2, (3, 3, 3), (1, 1, 1), 1,
                   use_bias=False, dtype=self.dtype, name="con_enc0")(x)
        x = BatchNorm(use_running_average=not train,
                      dtype=self.dtype, name="con_bn0")(x)
        x = nn.relu(x)
        x = Conv3d(self.out_channels, (3, 3, 3), (1, 1, 1), 1,
                   use_bias=False, dtype=self.dtype, name="con_enc1")(x)
        x = BatchNorm(use_running_average=not train,
                      dtype=self.dtype, name="con_bn1")(x)
        return nn.relu(x)
