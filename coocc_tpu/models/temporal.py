"""BEVDet4D-style temporal BEV alignment (capability-envelope component).

Capability parity with the reference's temporal detector machinery
(reference: coocc/detectors/bevdepth.py:180-296, BEVDet4D): the previous
frame's BEV features are warped into the current ego frame with a planar
homography derived from the two frames' camera-to-ego extrinsics
(shift_feature, :195-249), then channel-concatenated with the current
frame (:292, prev frame under stop-gradient, :286-288).

TPU form: the ego-motion matrix chain is computed in fp32 on [B] batched
3x3/4x4 matmuls; the warp is one bilinear gather over the (X, Y) plane
applied to all z-slices at once (channels-last [B, X, Y, Z*C]), with the
reference's align_corners=True normalization.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def ego_motion_bev_matrix(rots_curr, trans_curr, rots_adj, trans_adj):
    """Planar (x, y) ego-motion from current to adjacent frame.

    Args (camera 0 of each frame, reference bevdepth.py:206-227):
      rots_curr, rots_adj:  [B, 3, 3] cam->ego rotations.
      trans_curr, trans_adj: [B, 3] cam->ego translations.

    Returns: [B, 3, 3] homogeneous 2D transform l0->l1 with the z row and
    column dropped (reference :229-230).
    """
    B = rots_curr.shape[0]

    def hom(r, t):
        m = jnp.zeros((B, 4, 4), jnp.float32)
        m = m.at[:, :3, :3].set(r.astype(jnp.float32))
        m = m.at[:, :3, 3].set(t.astype(jnp.float32))
        return m.at[:, 3, 3].set(1.0)

    c02l0 = hom(rots_curr, trans_curr)
    c12l0 = hom(rots_adj, trans_adj)
    l02l1 = jnp.einsum("bij,bjk->bik", c02l0, jnp.linalg.inv(c12l0))
    keep = jnp.asarray([0, 1, 3])
    return l02l1[:, keep][:, :, keep]  # [B, 3, 3]


def shift_bev_feature(feat, l02l1_xy, dx, bx):
    """Warp a BEV(+z) feature map into the adjacent ego frame.

    Args:
      feat:     [B, X, Y, K] channels-last (K may be Z*C).
      l02l1_xy: [B, 3, 3] planar ego motion (ego_motion_bev_matrix).
      dx, bx:   (2,) BEV cell size / first-center (x, y) in meters.

    Returns [B, X, Y, K]: feat sampled at the ego-motion-transformed
    coordinates, zeros where the source falls off-grid (reference
    grid_sample zeros padding, :249).
    """
    B, X, Y, K = feat.shape
    f2b = jnp.asarray([
        [dx[0], 0.0, bx[0] - dx[0] / 2.0],
        [0.0, dx[1], bx[1] - dx[1] / 2.0],
        [0.0, 0.0, 1.0]], jnp.float32)
    tf = jnp.einsum("ij,bjk,kl->bil", jnp.linalg.inv(f2b), l02l1_xy, f2b)

    ix, iy = jnp.meshgrid(jnp.arange(X, dtype=jnp.float32),
                          jnp.arange(Y, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([ix, iy, jnp.ones_like(ix)], -1)  # [X, Y, 3]
    src = jnp.einsum("bij,xyj->bxyi", tf, grid)[..., :2]  # [B, X, Y, 2]
    sx, sy = src[..., 0], src[..., 1]

    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]

    def gather(fb, xi, yi):
        inb = (xi >= 0) & (xi < X) & (yi >= 0) & (yi < Y)
        v = fb[jnp.clip(xi, 0, X - 1), jnp.clip(yi, 0, Y - 1)]
        return v * inb[..., None]

    def one(fb, x0b, y0b, wxb, wyb):
        v00 = gather(fb, x0b, y0b)
        v01 = gather(fb, x0b, y0b + 1)
        v10 = gather(fb, x0b + 1, y0b)
        v11 = gather(fb, x0b + 1, y0b + 1)
        return (v00 * (1 - wxb) * (1 - wyb) + v01 * (1 - wxb) * wyb
                + v10 * wxb * (1 - wyb) + v11 * wxb * wyb)

    out = jax.vmap(one)(feat, x0, y0, wx, wy)
    return out.astype(feat.dtype)


class TemporalBEVConcat(nn.Module):
    """Align the previous frame's voxel features and concat channels.

    Equivalent of BEVDet4D.extract_img_feat's temporal assembly
    (reference bevdepth.py:263-296): prev features enter under
    stop-gradient (detach=True default) and are ego-motion aligned when
    `align` is set (align_after_view_transfromation).
    """
    align: bool = True
    detach: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, curr, prev, rots_curr=None, trans_curr=None,
                 rots_adj=None, trans_adj=None, dx=None, bx=None):
        """curr, prev: [B, X, Y, Z, C] -> [B, X, Y, Z, 2C]."""
        B, X, Y, Z, C = curr.shape
        if self.detach:
            prev = jax.lax.stop_gradient(prev)
        if self.align and rots_curr is not None:
            m = ego_motion_bev_matrix(rots_curr[:, 0], trans_curr[:, 0],
                                      rots_adj[:, 0], trans_adj[:, 0])
            prev = shift_bev_feature(
                prev.reshape(B, X, Y, Z * C), m, dx, bx
            ).reshape(B, X, Y, Z, C)
        return jnp.concatenate([curr, prev], axis=-1)
