"""FLoSP: features-line-of-sight projection (capability-envelope component).

Capability parity with the reference's registered alternative view
transform (reference: coocc/image2bev/flosp.py:5-41, MonoScene-style):
every voxel gathers the 2D feature at its projected pixel, out-of-FOV
voxels get zeros. The sibling ViewTransformVoxel (ViewTransformVoxel.py)
is non-functional dead code upstream (its forward references undefined
names) and is deliberately not rebuilt.

TPU form: one `take` gather with a clamped out-of-range index instead of
the torch concat-a-zero-column trick; channels-last [X, Y, Z, C] output.
"""
from __future__ import annotations

import jax.numpy as jnp


def flosp(x2d: jnp.ndarray, projected_pix: jnp.ndarray,
          fov_mask: jnp.ndarray, scene_size) -> jnp.ndarray:
    """Project 2D features along lines of sight into a voxel volume.

    Args:
      x2d:           [H, W, C] image features (channels-last).
      projected_pix: [V, 2] integer (pix_x, pix_y) per voxel (row-major
                     voxel raster of `scene_size`).
      fov_mask:      [V] bool, False where the voxel projects off-image.
      scene_size:    (X, Y, Z) voxel grid shape, V == X*Y*Z.

    Returns: [X, Y, Z, C] gathered features (zeros outside the FOV).
    """
    H, W, C = x2d.shape
    X, Y, Z = scene_size
    pix_x = projected_pix[:, 0]
    pix_y = projected_pix[:, 1]
    inb = fov_mask & (pix_x >= 0) & (pix_x < W) & (pix_y >= 0) & (pix_y < H)
    lin = jnp.clip(pix_y * W + pix_x, 0, H * W - 1)
    feat = x2d.reshape(H * W, C)[lin] * inb[:, None]
    return feat.reshape(X, Y, Z, C)
