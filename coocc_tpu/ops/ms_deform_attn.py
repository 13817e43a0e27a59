"""Multi-scale 3D deformable attention (capability-envelope op).

Capability parity with the reference's MSDeformAttn3D modules
(reference: coocc/necks/multi_scale_deform_attn_3d.py:17-330 and
multiscale_deformattn_3d.py — CUDA/grid_sample deformable attention used
by the registered-but-unused deformable necks/fusers): each query samples
num_points trilinear taps per head per pyramid level at predicted offsets
around its reference point and mixes them with softmax attention weights.

TPU form: the per-level sampling is one batched trilinear gather
(8 corner `take`s + lerp) over [B, H, Q, P] points — no scatter, no
dynamic shapes; everything fuses into the surrounding matmuls. Locations
follow the torch grid_sample align_corners=False convention on (x, y, z)
indexing the (X, Y, Z) axes, normalized to [0, 1].
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _trilinear(vol, x, y, z):
    """vol: [X, Y, Z, C]; x/y/z: [...] float cell-space coords (already
    unnormalized, align_corners=False: cell centers at i + 0.5).
    Out-of-range taps contribute zeros."""
    X, Y, Z, C = vol.shape
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    wz = (z - z0)[..., None]

    def tap(xi, yi, zi):
        inb = ((xi >= 0) & (xi < X) & (yi >= 0) & (yi < Y)
               & (zi >= 0) & (zi < Z))
        lin = (jnp.clip(xi, 0, X - 1) * Y + jnp.clip(yi, 0, Y - 1)) * Z \
            + jnp.clip(zi, 0, Z - 1)
        return vol.reshape(-1, C)[lin] * inb[..., None]

    c000 = tap(x0, y0, z0)
    c001 = tap(x0, y0, z0 + 1)
    c010 = tap(x0, y0 + 1, z0)
    c011 = tap(x0, y0 + 1, z0 + 1)
    c100 = tap(x0 + 1, y0, z0)
    c101 = tap(x0 + 1, y0, z0 + 1)
    c110 = tap(x0 + 1, y0 + 1, z0)
    c111 = tap(x0 + 1, y0 + 1, z0 + 1)
    c00 = c000 * (1 - wz) + c001 * wz
    c01 = c010 * (1 - wz) + c011 * wz
    c10 = c100 * (1 - wz) + c101 * wz
    c11 = c110 * (1 - wz) + c111 * wz
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wx) + c1 * wx


def ms_deform_attn_3d(values: Sequence[jnp.ndarray],
                      sampling_locations: jnp.ndarray,
                      attention_weights: jnp.ndarray) -> jnp.ndarray:
    """Core sampling/mixing (multi_scale_deformable_attn_pytorch analog).

    Args:
      values: per-level [B, X_l, Y_l, Z_l, H, D] head-split features.
      sampling_locations: [B, Q, H, L, P, 3] in [0, 1] (x, y, z).
      attention_weights:  [B, Q, H, L, P] (softmaxed over L*P).

    Returns: [B, Q, H*D].
    """
    B, Q, H, L, P, _ = sampling_locations.shape
    D = values[0].shape[-1]
    out = jnp.zeros((B, Q, H, D), jnp.float32)
    for lvl, vol in enumerate(values):
        X, Y, Z = vol.shape[1:4]
        loc = sampling_locations[:, :, :, lvl]  # [B, Q, H, P, 3]
        # align_corners=False unnormalize: x * X - 0.5
        x = loc[..., 0] * X - 0.5
        y = loc[..., 1] * Y - 0.5
        z = loc[..., 2] * Z - 0.5
        w = attention_weights[:, :, :, lvl]  # [B, Q, H, P]

        def one(vol_b, xb, yb, zb, wb):
            # per head: gather [Q, P, D] then weight-sum over P
            def head(vh, xh, yh, zh, wh):
                s = _trilinear(vh, xh, yh, zh)  # [Q, P, D]
                return (s * wh[..., None]).sum(1)
            return jax.vmap(head, in_axes=(3, 1, 1, 1, 1), out_axes=1)(
                vol_b, xb, yb, zb, wb)

        out = out + jax.vmap(one)(vol, x, y, z, w).astype(jnp.float32)
    return out.reshape(B, Q, H * D)


class MSDeformAttn3D(nn.Module):
    """Linen wrapper: query -> offsets/weights -> sample -> output proj.

    Mirrors MultiScaleDeformableAttention3D (reference :84-330): value
    projection, per-head ring-initialized offset bias, softmax over
    levels x points, residual add.
    """
    embed_dims: int = 128
    num_heads: int = 4
    num_levels: int = 3
    num_points: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, query, value_levels, reference_points):
        """query: [B, Q, C]; value_levels: list of [B, X, Y, Z, C];
        reference_points: [B, Q, 3] in [0, 1]. Returns [B, Q, C]."""
        C, H, L, P = (self.embed_dims, self.num_heads, self.num_levels,
                      self.num_points)
        assert len(value_levels) == L
        B, Q, _ = query.shape

        def ring_bias(key, shape, dtype=jnp.float32):
            thetas = np.arange(H, dtype=np.float32) * (2 * math.pi / H)
            grid = np.stack([np.cos(thetas), np.sin(thetas),
                             (np.sin(thetas) + np.cos(thetas)) / 2], -1)
            grid = grid / np.abs(grid).max(-1, keepdims=True)
            grid = np.tile(grid[:, None, None], (1, L, P, 1))
            for i in range(P):
                grid[:, :, i] *= i + 1
            return jnp.asarray(grid.reshape(-1), dtype)

        offsets = nn.Dense(H * L * P * 3, kernel_init=nn.initializers.zeros,
                           bias_init=ring_bias, dtype=self.dtype,
                           name="sampling_offsets")(query)
        offsets = offsets.reshape(B, Q, H, L, P, 3).astype(jnp.float32)
        weights = nn.Dense(H * L * P, kernel_init=nn.initializers.zeros,
                           dtype=self.dtype, name="attention_weights")(query)
        weights = jax.nn.softmax(
            weights.reshape(B, Q, H, L * P).astype(jnp.float32), -1
        ).reshape(B, Q, H, L, P)

        vproj = nn.Dense(C, dtype=self.dtype, name="value_proj")
        vals = []
        shapes = []
        for v in value_levels:
            X, Y, Z = v.shape[1:4]
            shapes.append((X, Y, Z))
            v = vproj(v)  # shared across levels (reference projects the
            # flattened multi-level sequence once)
            vals.append(v.reshape(B, X, Y, Z, H, C // H))
        norms = jnp.asarray(shapes, jnp.float32)  # [L, 3]
        loc = reference_points[:, :, None, None, None, :] \
            + offsets / norms[None, None, None, :, None, :]

        out = ms_deform_attn_3d(vals, loc, weights)
        out = nn.Dense(C, dtype=self.dtype, name="output_proj")(
            out.astype(query.dtype))
        return query + out
