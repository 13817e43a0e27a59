"""Stand-alone NeRF-style ray library (stratified + importance sampling).

Capability parity with the reference's auxiliary rendering library
(reference: projects/mmdet3d_plugin/utils/render_ray.py:28-651 — IBRNet-style
ray batching, `sample_along_camera_ray`, `raw2outputs` alpha compositing,
`sample_pdf` importance resampling — and utils/projection.py:20 Projector).
The live training path uses the inline frustum renderer
(models/renderer.py, reference coocc_ray.py:358-494); this module provides
the general ray API for arbitrary ray batches — all static-shape,
jit/vmap-friendly.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class RaySamples(NamedTuple):
    pts: jnp.ndarray      # [R, S, 3] sample positions
    z_vals: jnp.ndarray   # [R, S] depths along the ray


def sample_along_camera_ray(ray_o: jnp.ndarray, ray_d: jnp.ndarray,
                            near: float, far: float, n_samples: int,
                            rng: Optional[jax.Array] = None) -> RaySamples:
    """Stratified depth sampling (reference render_ray.py sample_along_*).

    ray_o/ray_d: [R, 3]. With `rng`, jitter uniformly within each bin
    (training); without, bin centers (eval).
    """
    R = ray_o.shape[0]
    t = jnp.linspace(0.0, 1.0, n_samples + 1)
    edges = near * (1 - t) + far * t  # [S+1]
    lo, hi = edges[:-1], edges[1:]
    if rng is not None:
        u = jax.random.uniform(rng, (R, n_samples))
    else:
        u = jnp.full((R, n_samples), 0.5)
    z_vals = lo[None] + (hi - lo)[None] * u
    pts = ray_o[:, None, :] + ray_d[:, None, :] * z_vals[..., None]
    return RaySamples(pts=pts, z_vals=z_vals)


def raw2outputs(rgb: jnp.ndarray, sigma: jnp.ndarray, z_vals: jnp.ndarray,
                white_bkgd: bool = False):
    """Alpha compositing (reference render_ray.py raw2outputs).

    rgb: [R, S, 3]; sigma: [R, S]; z_vals: [R, S].
    Returns (rgb_map [R,3], depth_map [R], weights [R,S]).
    """
    dists = jnp.diff(z_vals, axis=-1)
    dists = jnp.concatenate(
        [dists, jnp.full(dists.shape[:-1] + (1,), 1e10)], axis=-1)
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    weights = alpha * trans
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    if white_bkgd:
        acc = jnp.sum(weights, axis=-1)
        rgb_map = rgb_map + (1.0 - acc[..., None])
    return rgb_map, depth_map, weights


def sample_pdf(bins: jnp.ndarray, weights: jnp.ndarray, n_importance: int,
               rng: Optional[jax.Array] = None,
               det: bool = False) -> jnp.ndarray:
    """Importance resampling by the piecewise-constant pdf over `bins`
    (reference render_ray.py sample_pdf). bins: [R, B+1]; weights: [R, B].
    Returns [R, n_importance] new depth samples.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    R = bins.shape[0]
    if det or rng is None:
        u = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, n_importance), (R, n_importance))
    else:
        u = jax.random.uniform(rng, (R, n_importance))

    idx = jax.vmap(partial_searchsorted)(cdf, u)  # [R, N] upper-bin index
    below = jnp.clip(idx - 1, 0, cdf.shape[-1] - 1)
    above = jnp.clip(idx, 0, cdf.shape[-1] - 1)
    cdf_lo = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_hi = jnp.take_along_axis(cdf, above, axis=-1)
    bin_lo = jnp.take_along_axis(bins, jnp.clip(below, 0, bins.shape[-1] - 1),
                                 axis=-1)
    bin_hi = jnp.take_along_axis(bins, jnp.clip(above, 0, bins.shape[-1] - 1),
                                 axis=-1)
    denom = jnp.where(cdf_hi - cdf_lo < 1e-5, 1.0, cdf_hi - cdf_lo)
    t = (u - cdf_lo) / denom
    return bin_lo + t * (bin_hi - bin_lo)


def partial_searchsorted(cdf_row, u_row):
    return jnp.searchsorted(cdf_row, u_row, side="right")


def render_rays(ray_o, ray_d, feature_fn, rgb_sigma_fn, near, far,
                n_samples: int, n_importance: int = 0,
                rng: Optional[jax.Array] = None, white_bkgd: bool = False):
    """Full ray rendering: stratified pass (+ optional importance pass).

    feature_fn(pts [R,S,3]) -> features for rgb_sigma_fn;
    rgb_sigma_fn(feats) -> (rgb [R,S,3], sigma [R,S]).
    Mirrors the reference render_rays control flow (render_ray.py:28-120)
    with static shapes.
    """
    r1 = None if rng is None else jax.random.fold_in(rng, 0)
    coarse = sample_along_camera_ray(ray_o, ray_d, near, far, n_samples, r1)
    rgb, sigma = rgb_sigma_fn(feature_fn(coarse.pts))
    rgb_map, depth_map, weights = raw2outputs(rgb, sigma, coarse.z_vals,
                                              white_bkgd)
    out = {"rgb": rgb_map, "depth": depth_map, "weights": weights,
           "z_vals": coarse.z_vals}

    if n_importance > 0:
        mids = 0.5 * (coarse.z_vals[..., 1:] + coarse.z_vals[..., :-1])
        edges = jnp.concatenate(
            [coarse.z_vals[..., :1], mids, coarse.z_vals[..., -1:]], axis=-1)
        r2 = None if rng is None else jax.random.fold_in(rng, 1)
        z_fine = sample_pdf(edges, weights, n_importance, r2, det=rng is None)
        z_all = jnp.sort(
            jnp.concatenate([coarse.z_vals, z_fine], axis=-1), axis=-1)
        pts = ray_o[:, None, :] + ray_d[:, None, :] * z_all[..., None]
        rgb2, sigma2 = rgb_sigma_fn(feature_fn(pts))
        rgb_map2, depth_map2, w2 = raw2outputs(rgb2, sigma2, z_all,
                                               white_bkgd)
        out.update({"rgb_fine": rgb_map2, "depth_fine": depth_map2,
                    "weights_fine": w2, "z_vals_fine": z_all})
    return out


class Projector:
    """World-point -> multi-view image-feature sampler (reference
    utils/projection.py Projector: compute_projections + in-bounds mask)."""

    def __init__(self, intrins, rots, trans, img_hw):
        self.intrins = intrins  # [N, 3, 3]
        self.rots = rots        # [N, 3, 3] cam->ego
        self.trans = trans      # [N, 3]
        self.img_hw = img_hw

    def project(self, pts):
        """pts: [P, 3] ego-frame -> (uv [N, P, 2] pixel coords, mask [N, P])."""
        H, W = self.img_hw
        inv_rots = jnp.linalg.inv(self.rots)
        rel = pts[None, :, :] - self.trans[:, None, :]  # [N, P, 3]
        p = jnp.einsum("nij,npj->npi", inv_rots, rel)
        p = jnp.einsum("nij,npj->npi", self.intrins, p)
        d = p[..., 2:3]
        uv = p[..., :2] / jnp.maximum(d, 1e-5)
        mask = ((d[..., 0] > 1e-5) & (uv[..., 0] >= 0) & (uv[..., 0] < W)
                & (uv[..., 1] >= 0) & (uv[..., 1] < H))
        return uv, mask

    def sample(self, feats, pts, *, align_corners=True):
        """feats: [N, fH, fW, C]; pts: [P, 3] -> ([N, P, C], mask [N, P])."""
        from ..ops.grid_sample import grid_sample_2d
        H, W = self.img_hw
        uv, mask = self.project(pts)
        if align_corners:
            grid = jnp.stack([(uv[..., 0] / (W - 1) - 0.5) * 2,
                              (uv[..., 1] / (H - 1) - 0.5) * 2], axis=-1)
        else:
            # align_corners=False: pixel centers at (i+0.5)/W in [0,1]
            grid = jnp.stack([((uv[..., 0] + 0.5) / W - 0.5) * 2,
                              ((uv[..., 1] + 0.5) / H - 0.5) * 2], axis=-1)
        s = jax.vmap(lambda f, g: grid_sample_2d(
            f, g, align_corners=align_corners, padding_mode="zeros"))(
            feats, grid)
        return s * mask[..., None], mask
