"""torch-compatible grid_sample (bilinear 2D / trilinear 3D) in pure jnp.

The reference leans on F.grid_sample in the occupancy head's cascade
refinement (occ_head.py:219,232), lidarseg readout (occ_head.py:361) and
image-feature sampling; bit-parity of converted checkpoints requires exact
align_corners / padding_mode semantics, so these are re-implemented here
as gather + lerp (XLA fuses the weighting into the gathers).

Conventions follow torch.nn.functional.grid_sample:
  * grid values in [-1, 1]; the LAST grid dim indexes (x, y[, z]) where x is
    the fastest-varying (width / innermost) input axis.
  * align_corners=True:  -1 and 1 hit the centers of the corner pixels.
  * align_corners=False: -1 and 1 hit the outer edges of the corner pixels.
  * padding_mode 'zeros' or 'border'.
"""
from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord, size, align_corners):
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def _gather_nd_2d(img, ix, iy, padding_mode):
    """img [H, W, C]; ix/iy [...] float already unnormalized to pixel space."""
    H, W = img.shape[:2]
    x0 = jnp.floor(ix).astype(jnp.int32)
    y0 = jnp.floor(iy).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = ix - x0
    wy = iy - y0

    def sample(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        v = img[yc, xc]
        if padding_mode == "zeros":
            v = v * inb[..., None]
        return v

    v00 = sample(x0, y0)
    v01 = sample(x1, y0)
    v10 = sample(x0, y1)
    v11 = sample(x1, y1)
    wx_ = wx[..., None]
    wy_ = wy[..., None]
    return (
        v00 * (1 - wx_) * (1 - wy_)
        + v01 * wx_ * (1 - wy_)
        + v10 * (1 - wx_) * wy_
        + v11 * wx_ * wy_
    )


def grid_sample_2d(img, grid, *, align_corners=False, padding_mode="zeros"):
    """img: [H, W, C]; grid: [..., 2] (x, y) in [-1, 1]. Returns [..., C]."""
    H, W = img.shape[:2]
    ix = _unnormalize(grid[..., 0], W, align_corners)
    iy = _unnormalize(grid[..., 1], H, align_corners)
    if padding_mode == "border":
        ix = jnp.clip(ix, 0, W - 1)
        iy = jnp.clip(iy, 0, H - 1)
    return _gather_nd_2d(img, ix, iy, padding_mode)


def grid_sample_3d(vol, grid, *, align_corners=False, padding_mode="zeros"):
    """vol: [D, H, W, C]; grid: [..., 3] (x, y, z) in [-1, 1] where x indexes
    W (innermost), y indexes H, z indexes D — torch's 5-D convention.
    Returns [..., C]."""
    D, H, W = vol.shape[:3]
    ix = _unnormalize(grid[..., 0], W, align_corners)
    iy = _unnormalize(grid[..., 1], H, align_corners)
    iz = _unnormalize(grid[..., 2], D, align_corners)
    if padding_mode == "border":
        ix = jnp.clip(ix, 0, W - 1)
        iy = jnp.clip(iy, 0, H - 1)
        iz = jnp.clip(iz, 0, D - 1)

    x0 = jnp.floor(ix).astype(jnp.int32)
    y0 = jnp.floor(iy).astype(jnp.int32)
    z0 = jnp.floor(iz).astype(jnp.int32)
    wx = (ix - x0)[..., None]
    wy = (iy - y0)[..., None]
    wz = (iz - z0)[..., None]

    def sample(xi, yi, zi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H) & (zi >= 0) & (zi < D)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        zc = jnp.clip(zi, 0, D - 1)
        v = vol[zc, yc, xc]
        if padding_mode == "zeros":
            v = v * inb[..., None]
        return v

    out = 0.0
    for dz, wz_ in ((0, 1 - wz), (1, wz)):
        for dy, wy_ in ((0, 1 - wy), (1, wy)):
            for dx, wx_ in ((0, 1 - wx), (1, wx)):
                out = out + sample(x0 + dx, y0 + dy, z0 + dz) * wx_ * wy_ * wz_
    return out


def multicam_grid_sample_2d(imgs, grid, *, align_corners=False,
                            padding_mode="zeros"):
    """Batched-camera bilinear sampling through ONE flattened table.

    imgs: [N, H, W, C]; grid: [N, ..., 2] (x, y) in [-1, 1].
    Returns [N, ..., C]. Equivalent to vmap(grid_sample_2d) but gathers from
    the single [N*H*W, C] table with camera-offset indices — measured 4.6x
    faster on TPU than the vmapped form (whose batched gather lowers poorly).
    """
    import jax.numpy as _jnp

    N, H, W, C = imgs.shape
    lead = grid.shape[1:-1]
    flat = imgs.reshape(N * H * W, C)
    ix = _unnormalize(grid[..., 0], W, align_corners)
    iy = _unnormalize(grid[..., 1], H, align_corners)
    if padding_mode == "border":
        ix = _jnp.clip(ix, 0, W - 1)
        iy = _jnp.clip(iy, 0, H - 1)
    x0 = _jnp.floor(ix).astype(_jnp.int32)
    y0 = _jnp.floor(iy).astype(_jnp.int32)
    wx = (ix - x0)[..., None]
    wy = (iy - y0)[..., None]
    cam = _jnp.arange(N, dtype=_jnp.int32).reshape(
        (N,) + (1,) * len(lead)) * (H * W)
    out = 0.0
    for dy, wy_ in ((0, 1 - wy), (1, wy)):
        for dx, wx_ in ((0, 1 - wx), (1, wx)):
            xi, yi = x0 + dx, y0 + dy
            inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            idx = cam + _jnp.clip(yi, 0, H - 1) * W + _jnp.clip(xi, 0, W - 1)
            v = flat[idx.reshape(-1)].reshape(idx.shape + (C,))
            if padding_mode == "zeros":
                v = v * inb[..., None]
            out = out + v * wx_ * wy_
    return out
