"""Camera frustum geometry: frustum creation and camera->ego unprojection.

Pure-jnp re-design of the LSS geometry math
(reference: ViewTransformerLiftSplatShoot.create_frustum/get_geometry,
projects/mmdet3d_plugin/coocc/image2bev/ViewTransformerLSSBEVDepth.py:104-150,
and the detector-level get_frustum, coocc_ray.py:732-776).

Everything here depends only on calibration + augmentation parameters; the
frustum pixel grid itself is a compile-time constant per config, so XLA folds
it. Matrix inverses are 3x3 and computed on-device (cheap, batched).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def gen_dx_bx(xbound, ybound, zbound):
    """Voxel size dx, first-voxel-center bx, grid-size nx (as numpy constants)."""
    dx = np.array([row[2] for row in (xbound, ybound, zbound)], np.float32)
    bx = np.array([row[0] + row[2] / 2.0 for row in (xbound, ybound, zbound)],
                  np.float32)
    nx = np.array([int(round((row[1] - row[0]) / row[2]))
                   for row in (xbound, ybound, zbound)], np.int32)
    return dx, bx, nx


def create_frustum(input_size: Tuple[int, int], downsample: int,
                   dbound: Tuple[float, float, float]) -> np.ndarray:
    """[D, fH, fW, 3] grid of (pixel_x, pixel_y, depth) sample points.

    Static per config; returned as numpy so callers can bake it as a constant.
    """
    ogfH, ogfW = input_size
    fH, fW = ogfH // downsample, ogfW // downsample
    ds = np.arange(dbound[0], dbound[1], dbound[2], dtype=np.float32)
    D = ds.shape[0]
    xs = np.linspace(0, ogfW - 1, fW, dtype=np.float32)
    ys = np.linspace(0, ogfH - 1, fH, dtype=np.float32)
    frustum = np.stack(
        [
            np.broadcast_to(xs[None, None, :], (D, fH, fW)),
            np.broadcast_to(ys[None, :, None], (D, fH, fW)),
            np.broadcast_to(ds[:, None, None], (D, fH, fW)),
        ],
        axis=-1,
    )
    return frustum


def get_geometry(frustum, rots, trans, intrins, post_rots, post_trans, bda):
    """Unproject frustum pixels to ego-frame 3D points.

    Args:
      frustum:   [D, fH, fW, 3] (pixel_x, pixel_y, depth)
      rots:      [B, N, 3, 3] cam->ego rotation
      trans:     [B, N, 3]    cam->ego translation
      intrins:   [B, N, 3, 3] (or [B, N, 3, 4] KITTI-style P2)
      post_rots: [B, N, 3, 3] image-aug homography rotation
      post_trans:[B, N, 3]    image-aug translation
      bda:       [B, 3, 3] or [B, 4, 4] bird's-eye data augmentation

    Returns: [B, N, D, fH, fW, 3] ego-frame xyz.
    """
    B, N = trans.shape[:2]
    pts = frustum[None, None] - post_trans[:, :, None, None, None, :]
    inv_post = jnp.linalg.inv(post_rots)
    pts = jnp.einsum("bnij,bndhwj->bndhwi", inv_post, pts)
    # pixel*depth homogeneous -> camera coordinates
    pts = jnp.concatenate([pts[..., :2] * pts[..., 2:3], pts[..., 2:3]], axis=-1)

    if intrins.shape[-1] == 4:  # KITTI P2 with translation column
        shift = intrins[..., :3, 3]
        pts = pts - shift[:, :, None, None, None, :]
        intrins = intrins[..., :3, :3]

    combine = jnp.einsum("bnij,bnjk->bnik", rots, jnp.linalg.inv(intrins))
    pts = jnp.einsum("bnij,bndhwj->bndhwi", combine, pts)
    pts = pts + trans[:, :, None, None, None, :]

    if bda.shape[-1] == 4:
        ones = jnp.ones(pts.shape[:-1] + (1,), pts.dtype)
        pts_h = jnp.concatenate([pts, ones], axis=-1)
        pts = jnp.einsum("bij,bndhwj->bndhwi", bda, pts_h)[..., :3]
    else:
        pts = jnp.einsum("bij,bndhwj->bndhwi", bda, pts)
    return pts


def get_mlp_input(rots, trans, intrins, post_rots, post_trans, bda=None):
    """Camera-parameter conditioning vector for DepthNet.

    27-d for nuScenes 3x3 intrinsics (15 scalars + flattened 3x4 sensor2ego),
    30-d for KITTI 3x4. Reference: get_mlp_input,
    ViewTransformerLSSBEVDepth.py:636-691.
    """
    B, N = rots.shape[:2]
    if bda is None:
        bda = jnp.broadcast_to(jnp.eye(3, dtype=rots.dtype), (B, 3, 3))
    bda_n = jnp.broadcast_to(bda[:, None], (B, N) + bda.shape[-2:])

    if intrins.shape[-1] == 4:
        feats = [
            intrins[:, :, 0, 0], intrins[:, :, 1, 1],
            intrins[:, :, 0, 2], intrins[:, :, 1, 2],
            intrins[:, :, 0, 3], intrins[:, :, 1, 3], intrins[:, :, 2, 3],
            post_rots[:, :, 0, 0], post_rots[:, :, 0, 1], post_trans[:, :, 0],
            post_rots[:, :, 1, 0], post_rots[:, :, 1, 1], post_trans[:, :, 1],
            bda_n[:, :, 0, 0], bda_n[:, :, 0, 1],
            bda_n[:, :, 1, 0], bda_n[:, :, 1, 1], bda_n[:, :, 2, 2],
        ]
        mlp_input = jnp.stack(feats, axis=-1)
        if bda.shape[-1] == 4:
            mlp_input = jnp.concatenate([mlp_input, bda_n[:, :, :3, -1]], axis=2)
    else:
        feats = [
            intrins[:, :, 0, 0], intrins[:, :, 1, 1],
            intrins[:, :, 0, 2], intrins[:, :, 1, 2],
            post_rots[:, :, 0, 0], post_rots[:, :, 0, 1], post_trans[:, :, 0],
            post_rots[:, :, 1, 0], post_rots[:, :, 1, 1], post_trans[:, :, 1],
            bda_n[:, :, 0, 0], bda_n[:, :, 0, 1],
            bda_n[:, :, 1, 0], bda_n[:, :, 1, 1], bda_n[:, :, 2, 2],
        ]
        mlp_input = jnp.stack(feats, axis=-1)

    sensor2ego = jnp.concatenate(
        [rots, trans.reshape(B, N, 3, 1)], axis=-1
    ).reshape(B, N, -1)
    return jnp.concatenate([mlp_input, sensor2ego], axis=-1)


def voxel_indices(geom, dx, bx, nx):
    """Ego-frame points -> integer voxel indices + in-grid validity mask.

    Matches the reference's `((geom - (bx - dx/2)) / dx).long()` convention
    (ViewTransformerLSSVoxel.py:106-118).

    Returns (idx [..., 3] int32, valid [...] bool).
    """
    dx = jnp.asarray(dx, geom.dtype)
    bx = jnp.asarray(bx, geom.dtype)
    coords = (geom - (bx - dx / 2.0)) / dx
    # torch's .long() truncates toward zero (not floor); match it exactly —
    # the difference only shows for out-of-range negatives, which the validity
    # test below then treats the same way the reference does.
    idx = coords.astype(jnp.int32)
    nx = jnp.asarray(nx, jnp.int32)
    valid = jnp.all((idx >= 0) & (idx < nx), axis=-1)
    return idx, valid
