"""Occupancy head: multi-scale blend -> 17-class logits + cascade refinement.

Capability parity with the reference OccHead (coocc/dense_heads/occ_head.py:
16-379): per-level conv+norm+ReLU, softmax-weighted multi-scale blending at
the finest level, 1x1x1 prediction stack, and the coarse-to-fine cascade that
re-classifies the children of predicted-occupied coarse voxels with an MLP
over trilinearly-sampled voxel features (+ projected multi-view image
features).

TPU redesign of the cascade: the dynamic occupied-voxel list becomes a fixed
capacity of `n_fine` coarse cells chosen by top-k over (occupied, priority),
where priority is random during training (the reference randperm-subsamples
to fine_topk, coordinate_transform.py:3-21) and index-order at eval. All
gathers/MLPs run at capacity with validity masks.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config.base import OccHeadConfig
from ..ops.grid_sample import (cascade_sample_3d, grid_sample_2d,
                               grid_sample_3d, multicam_bilinear_gemm,
                               multicam_grid_sample_2d)
from ..ops.interpolate import resize_linear, resize_trilinear_chlast
from .layers import BatchNorm, Conv3d, GroupNorm, Linear


class _LinearParams(nn.Module):
    """Bare kernel/bias with Linear's exact tree (<name>/linear/{kernel,bias}).

    Lets the cascade fold the (linear) fc matrices into the sampled feature
    TABLES instead of applying them after the gathers — the gathers then move
    half the bytes. Mathematically identical: trilinear/bilinear sampling and
    the camera-sum are linear maps, so sample(T) @ W == sample(T @ W).
    """
    features: int

    class _Inner(nn.Module):
        features: int

        @nn.compact
        def __call__(self, cin):
            k = self.param("kernel", nn.initializers.lecun_normal(),
                           (cin, self.features))
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            return k, b

    @nn.compact
    def __call__(self, cin):
        return _LinearParams._Inner(self.features, name="linear")(cin)


class _GNParams(nn.Module):
    """Bare scale/bias with GroupNorm's exact tree (<name>/gn/{scale,bias}).

    Lets the cascade tail run inside lax.map chunks (flax modules cannot be
    called under jax control flow) with a pure group-norm that mirrors
    flax.linen.GroupNorm's fast-variance fp32 math.
    """
    features: int

    class _Inner(nn.Module):
        features: int

        @nn.compact
        def __call__(self):
            s = self.param("scale", nn.initializers.ones, (self.features,))
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            return s, b

    @nn.compact
    def __call__(self):
        return _GNParams._Inner(self.features, name="gn")()


def _group_norm(x, scale, bias, num_groups, eps=1e-5):
    """Pure twin of layers.GroupNorm on [P, C] rows (fp32 stats)."""
    P, C = x.shape
    g = x.astype(jnp.float32).reshape(P, num_groups, C // num_groups)
    mean = g.mean(-1, keepdims=True)
    var = (g * g).mean(-1, keepdims=True) - mean * mean
    y = ((g - mean) * jax.lax.rsqrt(var + eps)).reshape(P, C)
    return y * scale[None] + bias[None]


class _OccConv(nn.Module):
    mid: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, zb: bool = False):
        x = Conv3d(self.mid, (3, 3, 3), (1, 1, 1), 1, use_bias=False,
                   dtype=self.dtype, name="conv")(x, zb=zb)
        x = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      name="bn")(x)
        return nn.relu(x)


def select_occupied(coarse_mask: jnp.ndarray, capacity: int,
                    rng: Optional[jax.Array] = None):
    """[X, Y, Z] bool -> ([capacity, 3] int32 coords, [capacity] bool valid).

    Training (rng given): random subset of occupied cells (reference
    randperm topk); eval: index order. Static shapes throughout.
    """
    X, Y, Z = coarse_mask.shape
    flat = coarse_mask.reshape(-1)
    n = flat.shape[0]
    if rng is not None:
        prio = jax.random.uniform(rng, (n,))
        score = jnp.where(flat, prio, -jnp.inf)
        # NOTE: lax.top_k with k ~ 20000 lowers to an O(n*k) TopK on TPU
        # (terabytes of modeled traffic); a full argsort is n log n and
        # orders of magnitude faster here.
        idx = jnp.argsort(-score)[:capacity]
        valid = flat[idx]
    else:
        # eval keeps index order: occupancy-rank prefix sum + scatter of
        # cell ids beats the argsort (1.3 ms -> ~0 on-chip); invalid slots
        # read cell 0 with valid=False (the argsort path reads arbitrary
        # unoccupied cells there — both are masked downstream)
        fi = flat.astype(jnp.int32)
        rank = jnp.cumsum(fi) - fi
        tgt = jnp.where(flat & (rank < capacity), rank, capacity)
        idx = jnp.zeros((capacity + 1,), jnp.int32).at[tgt].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")[:capacity]
        valid = jnp.arange(capacity) < jnp.sum(fi)
    z = idx % Z
    y = (idx // Z) % Y
    x = idx // (Z * Y)
    coords = jnp.stack([x, y, z], axis=-1).astype(jnp.int32)
    return coords, valid


def fine_coordinates(coarse_coords: jnp.ndarray, ratio: int) -> jnp.ndarray:
    """[K, 3] coarse -> [K * ratio^3, 3] fine children."""
    K = coarse_coords.shape[0]
    r = jnp.arange(ratio)
    cell = jnp.stack(jnp.meshgrid(r, r, r, indexing="ij"), axis=-1)
    cell = cell.reshape(-1, 3)  # [r^3, 3]
    fine = coarse_coords[:, None, :] * ratio + cell[None, :, :]
    return fine.reshape(K * ratio ** 3, 3).astype(jnp.int32)


def project_points_on_img(points, rots, trans, intrins, post_rots, post_trans,
                          bda, pts_range, img_hw, occ_whd, data_type="nus"):
    """Fine voxel coords -> normalized image uv per camera + validity mask.

    Mirrors utils/coordinate_transform.py:25-66: voxel -> world via
    (range / (size-1)) scaling, inverse BDA, cam projection, post-aug
    homography, uv normalized to [-1, 1] over (W-1, H-1).

    data_type branches as the reference does: 'nus' applies the full inverse
    BDA (3x3 there); 'kitti' applies only the rotation block of a 4x4 BDA
    (no translation) and projects through homogeneous 3x4 intrinsics
    (coordinate_transform.py:33-51).

    points: [P, 3] float fine coords; rots/trans/...: per-sample [N, ...].
    Returns uv [N, P, 2], mask [N, P].
    """
    W_occ, H_occ, D_occ = occ_whd
    H_img, W_img = img_hw
    pr = jnp.asarray(pts_range, jnp.float32)
    voxel_size = (pr[3:] - pr[:3]) / jnp.array(
        [W_occ - 1, H_occ - 1, D_occ - 1], jnp.float32)
    pts = points * voxel_size[None] + pr[:3][None]

    inv_bda = jnp.linalg.inv(bda)
    if data_type == "kitti" or inv_bda.shape[-1] == 4:
        # rotation block only — the reference's kitti branch drops the
        # translation row of the 4x4 BDA (coordinate_transform.py:36-38)
        pts = jnp.einsum("ij,pj->pi", inv_bda[:3, :3], pts)
    else:
        pts = jnp.einsum("ij,pj->pi", inv_bda, pts)

    p = pts[None, :, :] - trans[:, None, :]  # [N, P, 3]
    inv_rots = jnp.linalg.inv(rots)
    p = jnp.einsum("nij,npj->npi", inv_rots, p)
    if intrins.shape[-1] == 4:
        ones = jnp.ones(p.shape[:-1] + (1,), p.dtype)
        p = jnp.einsum("nij,npj->npi", intrins, jnp.concatenate([p, ones], -1))
    else:
        p = jnp.einsum("nij,npj->npi", intrins, p)
    d = p[..., 2:3]
    uv = p[..., :2] / (d + 1e-5)
    uv = jnp.einsum("nij,npj->npi", post_rots[:, :2, :2], uv) \
        + post_trans[:, None, :2]
    u = (uv[..., 0] / (W_img - 1) - 0.5) * 2
    v = (uv[..., 1] / (H_img - 1) - 0.5) * 2
    mask = (d[..., 0] > 1e-5) & (u > -1) & (u < 1) & (v > -1) & (v < 1)
    return jnp.stack([u, v], axis=-1), mask


class OccHead(nn.Module):
    cfg: OccHeadConfig
    dtype: Any = None

    def _coarse(self, voxel_feats, train, zb=False):
        """zb=True: voxel_feats are z-batch-resident [B, Z, X, Y, C]; the
        returned blended/logits are in the same layout."""
        cfg = self.cfg
        mid = cfg.in_channels[0] // 2
        outs = [
            _OccConv(cfg.in_channels[i] // 2, dtype=self.dtype,
                     name=f"occ_conv{i}")(voxel_feats[i], train, zb)
            for i in range(cfg.num_level)
        ]
        if cfg.soft_weights:
            w = Conv3d(mid // 2, (1, 1, 1), (1, 1, 1), 0, use_bias=False,
                       dtype=self.dtype, name="soft_w_conv0")(outs[0], zb=zb)
            w = BatchNorm(use_running_average=not train, dtype=self.dtype,
                          name="soft_w_bn")(w)
            w = nn.relu(w)
            w = Conv3d(cfg.num_level, (1, 1, 1), (1, 1, 1), 0, use_bias=False,
                       dtype=self.dtype, name="soft_w_conv1")(w, zb=zb)
            weights = nn.softmax(w, axis=-1)  # [B, ..., L]
        else:
            weights = jnp.full(outs[0].shape[:-1] + (cfg.num_level,),
                               1.0 / cfg.num_level, outs[0].dtype)

        size = outs[0].shape[1:4] if zb else outs[0].shape[-4:-1]
        blended = 0.0
        for i, f in enumerate(outs):
            if f.shape[1:4] != size:
                if zb:
                    f = resize_linear(f, size, (1, 2, 3),
                                      align_corners=False)
                else:
                    f = resize_trilinear_chlast(f, size,
                                                align_corners=False)
            blended = blended + f * weights[..., i:i + 1]

        x = Conv3d(mid // 2, (1, 1, 1), (1, 1, 1), 0, use_bias=False,
                   dtype=self.dtype, name="pred_conv0")(blended, zb=zb)
        x = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      name="pred_bn")(x)
        x = nn.relu(x)
        logits = Conv3d(cfg.out_channel, (1, 1, 1), (1, 1, 1), 0,
                        use_bias=False, dtype=self.dtype,
                        name="pred_conv1")(x, zb=zb)
        return blended, logits

    @nn.compact
    def __call__(self, voxel_feats, img_feats=None, transform=None,
                 train: bool = False, fine_rng: Optional[jax.Array] = None,
                 zb: bool = False, coarse_only: bool = False):
        """voxel_feats: list of [B, X, Y, Z, C] (or z-batch [B, Z, X, Y, C]
        when zb=True); img_feats: [B, N, fH, fW, C2].

        Returns dict with 'occ' (coarse logits [B, X, Y, Z, out]), and when
        cascade is on: 'fine_logits' [B, K*r^3, out], 'fine_coords'
        [B, K*r^3, 3], 'fine_valid' [B, K*r^3].
        """
        cfg = self.cfg
        blended, logits = self._coarse(voxel_feats, train, zb)
        if zb:
            # back to channels-last [B, X, Y, Z, C] for outputs + cascade
            blended = jnp.transpose(blended, (0, 2, 3, 1, 4))
            logits = jnp.transpose(logits, (0, 2, 3, 1, 4))
        out = {"occ": logits}
        if coarse_only or cfg.cascade_ratio == 1 or not (
                cfg.sample_from_voxel or cfg.sample_from_img):
            return out

        B = logits.shape[0]
        ratio = cfg.cascade_ratio
        cap = cfg.fine_topk if train else cfg.max_coarse_occupied
        W_occ, H_occ, D_occ = cfg.final_occ_size

        if cfg.sample_from_img and img_feats is not None:
            Bi, Ni, fH, fW, Ci = img_feats.shape
            imf = nn.Conv(128, (1, 1), name="img_mlp_0_conv")(
                img_feats.reshape(Bi * Ni, fH, fW, Ci))
            imf = GroupNorm(16, name="img_mlp_0_gn")(imf)
            imf = nn.relu(imf).reshape(Bi, Ni, fH, fW, 128)
        else:
            imf = None

        # instantiate shared param holders once; the per-sample loop below
        # reuses them. fc weights are FOLDED INTO THE SAMPLED TABLES (see
        # _LinearParams): the gathers then move 64-dim instead of 128-dim
        # rows. The whole fine pipeline runs as a lax.map over coarse-cell
        # chunks so every intermediate ([chunk, 64] samples, one-hot GEMM
        # blocks, GN/MLP activations) stays VMEM-resident — XLA materialized
        # them at full capacity inside the big graph otherwise
        # (tools/profile_head_real.py).
        cd = self.dtype or jnp.float32
        Cvox = blended.shape[-1] if cfg.sample_from_voxel else 0
        Cimg = 64 if (cfg.sample_from_img and imf is not None) else 0
        k1, b1 = _LinearParams(64, name="fine_mlp_fc1")(Cvox + Cimg)
        gn_s, gn_b = _GNParams(64, name="fine_mlp_gn")()
        k2, b2 = _LinearParams(cfg.out_channel, name="fine_mlp_fc2")(64)
        if Cimg:
            kf, bf = _LinearParams(64, name="img_mlp_fc")(imf.shape[-1])
            ign_s, ign_b = _GNParams(64, name="img_mlp_gn")()
            # pre-transform the per-cam tables: sample(T @ W) == sample(T) @ W
            imf = jnp.einsum("bnhwc,cd->bnhwd", imf, kf.astype(cd))
        if Cvox:
            blended_t = jnp.einsum("bxyzc,cd->bxyzd", blended,
                                   k1[:Cvox].astype(cd))

        occ_mask = jnp.argmax(logits, axis=-1) != cfg.empty_idx  # [B, X, Y, Z]

        CH = 1000  # coarse cells per chunk (x r^3 fine rows)

        def per_sample(args):
            (mask_b, blended_b, imf_b, tr_b, rng_b) = args
            coords, valid = select_occupied(mask_b, cap, rng_b)
            fvalid = jnp.repeat(valid, ratio ** 3)

            def chunk_fn(coords_c):
                fine_c = fine_coordinates(coords_c, ratio)  # [CH*r^3, 3]
                acc = jnp.broadcast_to(
                    b1.astype(jnp.float32),
                    (fine_c.shape[0], b1.shape[0])).astype(jnp.float32)
                if cfg.sample_from_voxel:
                    # windowed batched-GEMM twin of trilinear grid_sample
                    # over the children (ops.grid_sample.cascade_sample_3d)
                    sampled = cascade_sample_3d(
                        blended_b, coords_c, ratio, (W_occ, H_occ, D_occ),
                        compute_dtype=cd)
                    acc = acc + sampled.astype(jnp.float32)
                if Cimg:
                    rots, trans, intrins, post_rots, post_trans, bda = tr_b
                    uv, m = project_points_on_img(
                        fine_c.astype(jnp.float32), rots, trans, intrins,
                        post_rots, post_trans, bda,
                        pts_range=cfg.point_cloud_range,
                        img_hw=cfg.input_size,
                        occ_whd=(W_occ, H_occ, D_occ),
                        data_type=cfg.data_type)
                    s = multicam_bilinear_gemm(
                        imf_b, uv, m, align_corners=True,
                        compute_dtype=cd, chunk=None) \
                        + bf.astype(cd)  # [CH*r^3, 64]
                    s = nn.relu(_group_norm(s, ign_s, ign_b, 16)).astype(cd)
                    acc = acc + (s @ k1[Cvox:].astype(cd)).astype(jnp.float32)
                x = nn.relu(_group_norm(acc, gn_s, gn_b, 16))
                return (x @ k2.astype(jnp.float32)
                        + b2.astype(jnp.float32)), fine_c

            if cap % CH == 0:
                nch = cap // CH
                xs, fines = jax.lax.map(
                    chunk_fn, coords.reshape(nch, CH, 3))
                x = xs.reshape(cap * ratio ** 3, -1)
                fine = fines.reshape(cap * ratio ** 3, 3)
            else:
                x, fine = chunk_fn(coords)
            return x, fine, fvalid

        # batch handling with shared params (B is 1 per device in all shipped
        # configs). B == 1 keeps the bare unbatched lowering; B > 1 runs the
        # same per-sample program under lax.map (None leaves pass through the
        # xs pytree untouched) so the traced HLO stays constant-size in B.
        if B == 1:
            rng0 = None if fine_rng is None else jax.random.fold_in(fine_rng, 0)
            tr0 = None if transform is None else tuple(t[0] for t in transform)
            fl, fc, fv = per_sample(
                (occ_mask[0], blended_t[0] if Cvox else None,
                 None if imf is None else imf[0], tr0, rng0))
            fl, fc, fv = fl[None], fc[None], fv[None]
        else:
            rngs = None if fine_rng is None else jax.vmap(
                lambda i: jax.random.fold_in(fine_rng, i))(jnp.arange(B))
            fl, fc, fv = jax.lax.map(
                per_sample,
                (occ_mask, blended_t if Cvox else None, imf, transform, rngs))
        out["fine_logits"] = fl
        out["fine_coords"] = fc
        out["fine_valid"] = fv
        # Overflow diagnostic: the reference refines ALL occupied voxels at
        # eval (occ_head.py:182-237, topk only in training); our static cap
        # silently drops cells past `cap` when exceeded. Surface the count so
        # the eval loop can warn (train/loop.py logs it).
        n_occ = occ_mask.reshape(B, -1).sum(axis=-1)
        out["fine_overflow"] = jnp.maximum(n_occ - cap, 0)
        return out


def forward_lidarseg(voxel_logits, points, points_mask, pc_range,
                     align_corners=True, padding_mode="border"):
    """Sample per-point class logits from the voxel prediction.

    Capability parity with OccHead.forward_lidarseg (occ_head.py:339-379):
    normalize point xyz into the grid, grid_sample the logits trilinearly
    (border padding, align_corners=True), return [B, Q, C] logits.

    voxel_logits: [B, X, Y, Z, C]; points: [B, Q, >=3]; points_mask: [B, Q].
    """
    pr = jnp.asarray(pc_range, jnp.float32)
    lo = pr[:3]
    extent = pr[3:] - lo

    def one(logits_b, pts_b):
        norm = (pts_b[:, :3] - lo) / extent * 2.0 - 1.0  # (x, y, z) in [-1,1]
        # volume [Z, Y, X, C] with torch grid (x, y, z) convention
        vol = jnp.transpose(logits_b, (2, 1, 0, 3))
        return grid_sample_3d(vol, norm, align_corners=align_corners,
                              padding_mode=padding_mode)

    out = jax.vmap(one)(voxel_logits, points)
    return out * points_mask[..., None]
