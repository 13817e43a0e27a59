"""Deformable image2bev encoder stack (VoxFormer/BEVFormer-style).

Capability parity with the reference's dead-code image2bev transformer
assembly (reference: coocc/image2bev/modules/{encoder.py:33-230,
deformable_self_attention.py:32-277, deformable_cross_attention.py:36-402,
transformer.py:27-192} and utils/transformer.py) — a BEV/voxel query grid
refined by alternating deformable self-attention on the BEV plane and
deformable cross-attention into the multi-camera feature pyramids.

TPU-first design decisions (vs the reference's CUDA path):
- `ms_deform_attn_2d` is a batched gather-based bilinear sampler over the
  *stacked* level pyramid — 4 corner `take`s + lerp per level, everything
  static-shape; XLA fuses the lerp/weighting into the surrounding matmuls.
  Replaces the `ms_deform_attn_forward` CUDA ext and the
  grid_sample fallback (deformable_cross_attention.py:28-33).
- The reference's per-camera dynamic "rebatch" trick
  (deformable_cross_attention.py:141-176 — gathers only queries whose
  pillar projects into each camera to save GPU memory) is a dynamic-shape
  construct. Here every query attends in every camera and a static hit
  mask zeroes the misses; outputs are summed over cameras and divided by
  the clamped hit count — numerically identical, constant-shape, and the
  masked FLOPs ride the MXU for free compared to a gather/scatter pair.
- Reference-point generation and camera projection (`point_sampling`,
  encoder.py:55-149) are pure jnp on static grids.

All shipped configs bypass this stack (LSS is the live view transformer);
it exists for §2.7 capability-envelope parity.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# core sampler
# ---------------------------------------------------------------------------

def _bilinear_2d(img, x, y):
    """img: [H, W, C]; x/y: [...] float pixel-space coords (grid_sample
    align_corners=False convention: pixel centers at i + 0.5, callers pass
    loc * size - 0.5). Out-of-range taps contribute zeros (padding_mode=
    'zeros'), matching torch.nn.functional.grid_sample defaults used by
    the reference's pytorch fallback."""
    H, W, C = img.shape
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        lin = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        return img.reshape(-1, C)[lin] * inb[..., None]

    c00 = tap(x0, y0)
    c01 = tap(x0 + 1, y0)
    c10 = tap(x0, y0 + 1)
    c11 = tap(x0 + 1, y0 + 1)
    top = c00 * (1 - wx) + c01 * wx
    bot = c10 * (1 - wx) + c11 * wx
    return top * (1 - wy) + bot * wy


def ms_deform_attn_2d(value_levels: Sequence[jnp.ndarray],
                      sampling_locations: jnp.ndarray,
                      attention_weights: jnp.ndarray) -> jnp.ndarray:
    """Multi-scale 2D deformable attention core.

    value_levels: per-level [B, H_l, W_l, nH, c] feature maps.
    sampling_locations: [B, Q, nH, L, P, 2] normalized (x, y) in [0, 1].
    attention_weights: [B, Q, nH, L, P] (softmax already applied).
    Returns [B, Q, nH * c].

    Equivalent to mmcv's multi_scale_deformable_attn_pytorch
    (grid_sample per level, weight-sum) but as static gathers.
    """
    B, Q, nH, L, P, _ = sampling_locations.shape
    out = 0.
    for lvl, v in enumerate(value_levels):
        _, H, W, _, c = v.shape
        loc = sampling_locations[:, :, :, lvl]          # [B, Q, nH, P, 2]
        # vmap over (batch, head): each tap gathers only its head's c
        # channels — no cross-head redundancy
        x = (loc[..., 0] * W - 0.5).transpose(0, 2, 1, 3).reshape(
            B * nH, Q * P)
        y = (loc[..., 1] * H - 0.5).transpose(0, 2, 1, 3).reshape(
            B * nH, Q * P)
        vol = v.transpose(0, 3, 1, 2, 4).reshape(B * nH, H, W, c)
        samp = jax.vmap(_bilinear_2d)(vol, x, y).reshape(B, nH, Q, P, c)
        w = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3)
        out = out + (samp * w[..., None]).sum(axis=3)   # [B, nH, Q, c]
    return out.transpose(0, 2, 1, 3).reshape(B, Q, nH * c)


# ---------------------------------------------------------------------------
# attention modules
# ---------------------------------------------------------------------------

def _grid_init_bias(num_heads: int, num_levels: int, num_points: int):
    """Directional sampling-offset bias (deformable-DETR init): head h
    points along angle 2*pi*h/nH, ring radius grows with point index.
    Mirrors deformable_self_attention.py:115-128."""
    thetas = np.arange(num_heads, dtype=np.float32) * (
        2.0 * math.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, num_levels, num_points, 1))
    for i in range(num_points):
        grid[:, :, i, :] *= i + 1
    return grid.reshape(-1)


class MSDeformableAttention2D(nn.Module):
    """Per-camera deformable attention into an image pyramid
    (reference: MSDeformableAttention3D, deformable_cross_attention.py:
    200-402 — "3D" upstream means D z-anchor reference points per query,
    sampling still happens on 2D image planes). No output projection and
    no residual — the DeformCrossAttention wrapper owns those, matching
    the reference split."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 8          # total across z-anchors
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, value_levels, reference_points):
        """query: [B, Q, C]; value_levels: per-level [B, H, W, C];
        reference_points: [B, Q, Z, 2] normalized (x, y) — Z z-anchors per
        query; num_points must be divisible by Z."""
        B, Q, C = query.shape
        nH, L, P = self.num_heads, self.num_levels, self.num_points
        Z = reference_points.shape[2]
        assert P % Z == 0, "num_points must be a multiple of num_Z_anchors"

        # one shared value projection applied per level (the reference
        # projects the concatenated flattened levels with a single Dense)
        value_proj = nn.Dense(self.embed_dims, dtype=self.dtype,
                              name="value_proj")
        values = [value_proj(v) for v in value_levels]
        values = [v.reshape(B, v.shape[1], v.shape[2], nH, C // nH)
                  for v in values]

        off = nn.Dense(nH * L * P * 2, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros,
                       bias_init=lambda k, s, d=jnp.float32: jnp.asarray(
                           _grid_init_bias(nH, L, P), d),
                       name="sampling_offsets")(query)
        off = off.reshape(B, Q, nH, L, P, 2)
        attn = nn.Dense(nH * L * P, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="attention_weights")(query)
        attn = jax.nn.softmax(attn.reshape(B, Q, nH, L * P), axis=-1)
        attn = attn.reshape(B, Q, nH, L, P)

        # normalize offsets by each level's (W, H); anchor every P//Z
        # consecutive points on successive z-anchor projections
        # (deformable_cross_attention.py:361-376)
        norms = jnp.asarray([(v.shape[2], v.shape[1]) for v in values],
                            jnp.float32)                  # [L, 2] (W, H)
        off = off / norms[None, None, None, :, None, :]
        off = off.reshape(B, Q, nH, L, P // Z, Z, 2)
        refs = reference_points[:, :, None, None, None, :, :]
        loc = (refs + off).reshape(B, Q, nH, L, P, 2)

        out = ms_deform_attn_2d(values, loc.astype(jnp.float32),
                                attn.astype(jnp.float32))
        return out.astype(query.dtype)


class DeformSelfAttention(nn.Module):
    """BEV-plane deformable self-attention with a 2-slot temporal queue
    (reference: deformable_self_attention.py:32-277). When no prev_bev is
    given the queue is [bev, bev], matching encoder.py:195-198's hybrid
    ref stacking."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4
    num_bev_queue: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, reference_points, spatial_shape,
                 query_pos=None, prev_bev=None):
        """query: [B, Q, C]; reference_points: [B, Q, 2] normalized;
        spatial_shape: static (H, W) of the BEV plane;
        prev_bev: [B, Q, C] or None."""
        B, Q, C = query.shape
        nH, L, P, K = (self.num_heads, self.num_levels, self.num_points,
                       self.num_bev_queue)
        H, W = spatial_shape
        identity = query
        if query_pos is not None:
            query = query + query_pos
        value = query if prev_bev is None else prev_bev
        # queue slot 0 = history, slot 1 = current
        stacked = jnp.stack([value, query], axis=1)       # [B, K, Q, C]

        # offsets/weights predicted from [history ; current]
        # (deformable_self_attention.py:203-205)
        qcat = jnp.concatenate([value, query], axis=-1)   # [B, Q, 2C]

        vproj = nn.Dense(self.embed_dims, dtype=self.dtype,
                         name="value_proj")(stacked)
        vmaps = vproj.reshape(B * K, H, W, nH, C // nH)

        off = nn.Dense(K * nH * L * P * 2, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros,
                       bias_init=lambda k, s, d=jnp.float32: jnp.asarray(
                           np.tile(_grid_init_bias(nH, L, P), K), d),
                       name="sampling_offsets")(qcat)
        off = off.reshape(B, Q, nH, K, L, P, 2)
        attn = nn.Dense(K * nH * L * P, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="attention_weights")(qcat)
        attn = jax.nn.softmax(
            attn.reshape(B, Q, nH, K, L * P), axis=-1
        ).reshape(B, Q, nH, K, L, P)

        # fold the queue into batch like the reference's bs*2 rebatch
        off = off.transpose(0, 3, 1, 2, 4, 5, 6).reshape(
            B * K, Q, nH, L, P, 2)
        attn = attn.transpose(0, 3, 1, 2, 4, 5).reshape(B * K, Q, nH, L, P)

        norm = jnp.asarray([[W, H]], jnp.float32)         # [1(level), 2]
        refs = jnp.tile(reference_points[:, None], (1, K, 1, 1)).reshape(
            B * K, Q, 2)
        loc = refs[:, :, None, None, None, :] + \
            off / norm[None, None, None, :, None, :]

        out = ms_deform_attn_2d([vmaps], loc.astype(jnp.float32),
                                attn.astype(jnp.float32))
        out = out.reshape(B, K, Q, C).mean(axis=1)        # queue fuse
        out = nn.Dense(self.embed_dims, dtype=self.dtype,
                       name="output_proj")(out)
        return out.astype(identity.dtype) + identity


class DeformCrossAttention(nn.Module):
    """Multi-camera deformable cross-attention
    (reference: DeformCrossAttention, deformable_cross_attention.py:
    36-197). Static-mask formulation — see module docstring."""
    embed_dims: int = 256
    num_cams: int = 6
    num_levels: int = 4
    num_heads: int = 8
    num_points: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, mlvl_feats, reference_points_cam, bev_mask,
                 query_pos=None):
        """query: [B, Q, C]; mlvl_feats: per-level [B, N, H, W, C];
        reference_points_cam: [B, N, Q, Z, 2]; bev_mask: [B, N, Q, Z]."""
        B, Q, C = query.shape
        N = self.num_cams
        identity = query
        if query_pos is not None:
            query = query + query_pos

        attn = MSDeformableAttention2D(
            embed_dims=self.embed_dims, num_heads=self.num_heads,
            num_levels=self.num_levels, num_points=self.num_points,
            dtype=self.dtype, name="deformable_attention")

        # fold cameras into batch: every query attends in every camera
        qc = jnp.tile(query[:, None], (1, N, 1, 1)).reshape(B * N, Q, C)
        refs = reference_points_cam.reshape(B * N, Q, -1, 2)
        feats = [f.reshape((B * N,) + f.shape[2:]) for f in mlvl_feats]
        out = attn(qc, feats, refs).reshape(B, N, Q, C)

        # zero cameras the query's pillar never hits; average over hits
        hit = (bev_mask.sum(axis=-1) > 0)                 # [B, N, Q]
        out = (out * hit[..., None].astype(out.dtype)).sum(axis=1)
        count = jnp.maximum(hit.sum(axis=1).astype(out.dtype), 1.0)
        out = out / count[..., None]
        out = nn.Dense(self.embed_dims, dtype=self.dtype,
                       name="output_proj")(out)
        return out.astype(identity.dtype) + identity


# ---------------------------------------------------------------------------
# encoder assembly
# ---------------------------------------------------------------------------

class VoxFormerLayer(nn.Module):
    """One encoder layer: self_attn -> norm -> cross_attn -> norm -> ffn
    -> norm (reference: VoxFormerLayer, encoder.py:231-394, with the
    standard BEVFormer operation_order)."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points_cross: int = 8
    num_points_self: int = 4
    feedforward_channels: int = 512
    num_cams: int = 6
    use_self_attn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, mlvl_feats, ref_2d, spatial_shape,
                 reference_points_cam, bev_mask, query_pos=None,
                 prev_bev=None):
        if self.use_self_attn:
            query = DeformSelfAttention(
                embed_dims=self.embed_dims, num_heads=self.num_heads,
                num_points=self.num_points_self, dtype=self.dtype,
                name="self_attn")(query, ref_2d, spatial_shape,
                                  query_pos=query_pos, prev_bev=prev_bev)
            query = nn.LayerNorm(dtype=self.dtype, name="norm1")(query)
        query = DeformCrossAttention(
            embed_dims=self.embed_dims, num_cams=self.num_cams,
            num_levels=self.num_levels, num_heads=self.num_heads,
            num_points=self.num_points_cross, dtype=self.dtype,
            name="cross_attn")(query, mlvl_feats, reference_points_cam,
                               bev_mask, query_pos=query_pos)
        query = nn.LayerNorm(dtype=self.dtype, name="norm2")(query)
        y = nn.Dense(self.feedforward_channels, dtype=self.dtype,
                     name="ffn_fc1")(query)
        y = nn.relu(y)
        y = nn.Dense(self.embed_dims, dtype=self.dtype, name="ffn_fc2")(y)
        query = nn.LayerNorm(dtype=self.dtype, name="norm3")(query + y)
        return query


def get_reference_points_3d(H: int, W: int, Z: float,
                            num_points_in_pillar: int) -> np.ndarray:
    """[P, H*W, 3] normalized pillar reference points
    (encoder.py:55-80, dim='3d')."""
    zs = (np.linspace(0.5, Z - 0.5, num_points_in_pillar,
                      dtype=np.float32) / Z)[:, None, None] * np.ones(
        (num_points_in_pillar, H, W), np.float32)
    xs = (np.linspace(0.5, W - 0.5, W, dtype=np.float32) / W)[
        None, None, :] * np.ones((num_points_in_pillar, H, W), np.float32)
    ys = (np.linspace(0.5, H - 0.5, H, dtype=np.float32) / H)[
        None, :, None] * np.ones((num_points_in_pillar, H, W), np.float32)
    ref = np.stack([xs, ys, zs], -1)                     # [P, H, W, 3]
    return ref.reshape(num_points_in_pillar, H * W, 3)


def get_reference_points_2d(H: int, W: int) -> np.ndarray:
    """[H*W, 2] normalized BEV-plane reference points
    (encoder.py:82-95, dim='2d')."""
    ys, xs = np.meshgrid(np.linspace(0.5, H - 0.5, H, dtype=np.float32),
                         np.linspace(0.5, W - 0.5, W, dtype=np.float32),
                         indexing="ij")
    return np.stack([xs.reshape(-1) / W, ys.reshape(-1) / H], -1)


def point_sampling(ref_3d: jnp.ndarray, pc_range: Sequence[float],
                   lidar2img: jnp.ndarray,
                   img_shape: Tuple[int, int]):
    """Project normalized 3D pillar points into each camera
    (encoder.py:98-149).

    ref_3d: [P, Q, 3] normalized; lidar2img: [B, N, 4, 4];
    img_shape: (H_img, W_img).
    Returns reference_points_cam [B, N, Q, P, 2] in [0,1] and
    bev_mask [B, N, Q, P]."""
    P, Q, _ = ref_3d.shape
    pc = jnp.asarray(pc_range, jnp.float32)
    pts = ref_3d * (pc[3:6] - pc[0:3]) + pc[0:3]
    pts_h = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], -1)
    # [B, N, P, Q, 4]
    cam = jnp.einsum("bnij,pqj->bnpqi", lidar2img.astype(jnp.float32),
                     pts_h)
    eps = 1e-5
    depth = cam[..., 2:3]
    mask = depth[..., 0] > eps
    xy = cam[..., 0:2] / jnp.maximum(depth, eps)
    xy = xy / jnp.asarray([img_shape[1], img_shape[0]], jnp.float32)
    mask = (mask & (xy[..., 0] > 0.0) & (xy[..., 0] < 1.0)
            & (xy[..., 1] > 0.0) & (xy[..., 1] < 1.0))
    # [B, N, Q, P, ...]
    return xy.transpose(0, 1, 3, 2, 4), mask.transpose(0, 1, 3, 2)


class VoxFormerEncoder(nn.Module):
    """N stacked VoxFormerLayers over a BEV query grid
    (reference: VoxFormerEncoder, encoder.py:33-230)."""
    embed_dims: int = 256
    num_layers: int = 3
    num_heads: int = 8
    num_levels: int = 4
    num_points_in_pillar: int = 4
    num_cams: int = 6
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    feedforward_channels: int = 512
    use_self_attn: bool = True
    return_intermediate: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, bev_query, mlvl_feats, bev_h, bev_w, lidar2img,
                 img_shape, bev_pos=None, prev_bev=None, ref_3d=None):
        """bev_query: [B, Q, C] (Q = bev_h * bev_w unless a custom ref_3d
        subset is given); mlvl_feats: per-level [B, N, H, W, C];
        lidar2img: [B, N, 4, 4]; img_shape: static (H_img, W_img)."""
        B = bev_query.shape[0]
        if ref_3d is None:
            ref_3d = jnp.asarray(get_reference_points_3d(
                bev_h, bev_w, self.pc_range[5] - self.pc_range[2],
                self.num_points_in_pillar))
        ref_2d = jnp.tile(
            jnp.asarray(get_reference_points_2d(bev_h, bev_w))[None],
            (B, 1, 1))
        refs_cam, bev_mask = point_sampling(
            ref_3d, self.pc_range, lidar2img, img_shape)

        intermediate = []
        out = bev_query
        for i in range(self.num_layers):
            out = VoxFormerLayer(
                embed_dims=self.embed_dims, num_heads=self.num_heads,
                num_levels=self.num_levels, num_cams=self.num_cams,
                feedforward_channels=self.feedforward_channels,
                use_self_attn=self.use_self_attn, dtype=self.dtype,
                name=f"layer{i}")(
                    out, mlvl_feats, ref_2d, (bev_h, bev_w),
                    refs_cam, bev_mask, query_pos=bev_pos,
                    prev_bev=prev_bev)
            intermediate.append(out)
        if self.return_intermediate:
            return jnp.stack(intermediate)
        return out


class Image2BEVTransformer(nn.Module):
    """Perception transformer wrapper: learned BEV queries + cam/level
    embeds -> encoder -> BEV embedding (reference: PerceptionTransformer,
    transformer.py:27-192 get_vox_features/diffuse_vox_features). The
    reference's sparse unmasked-query gather is dynamic-shape; here the
    full static grid is refined (the mask only changed which queries were
    *updated* — masked ones pass through via the residual paths)."""
    embed_dims: int = 256
    num_layers: int = 3
    num_heads: int = 8
    num_feature_levels: int = 4
    num_cams: int = 6
    bev_h: int = 128
    bev_w: int = 128
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    use_cams_embeds: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mlvl_feats, lidar2img, img_shape, prev_bev=None):
        """mlvl_feats: per-level [B, N, H, W, C]; lidar2img: [B, N, 4, 4].
        Returns [B, bev_h * bev_w, embed_dims]."""
        B = mlvl_feats[0].shape[0]
        Q = self.bev_h * self.bev_w
        bev_queries = self.param(
            "bev_queries", nn.initializers.normal(1.0),
            (Q, self.embed_dims))
        bev_pos = self.param(
            "bev_pos", nn.initializers.normal(1.0), (Q, self.embed_dims))
        level_embeds = self.param(
            "level_embeds", nn.initializers.normal(1.0),
            (self.num_feature_levels, self.embed_dims))
        cams_embeds = self.param(
            "cams_embeds", nn.initializers.normal(1.0),
            (self.num_cams, self.embed_dims))

        feats = []
        for lvl, f in enumerate(mlvl_feats):
            f = f + level_embeds[lvl].astype(f.dtype)
            if self.use_cams_embeds:
                f = f + cams_embeds[None, :, None, None, :].astype(f.dtype)
            feats.append(f)

        q = jnp.tile(bev_queries[None], (B, 1, 1)).astype(self.dtype)
        pos = jnp.tile(bev_pos[None], (B, 1, 1)).astype(self.dtype)
        return VoxFormerEncoder(
            embed_dims=self.embed_dims, num_layers=self.num_layers,
            num_heads=self.num_heads, num_levels=self.num_feature_levels,
            num_cams=self.num_cams, pc_range=self.pc_range,
            dtype=self.dtype, name="encoder")(
                q, feats, self.bev_h, self.bev_w, lidar2img, img_shape,
                bev_pos=pos, prev_bev=prev_bev)
