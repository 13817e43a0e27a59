"""COOCC_Ray: the multi-modal (and camera-only) occupancy model.

Capability parity with the reference detector
(coocc/detectors/coocc_ray.py:31-723):

  image branch   ResNet -> SECONDFPN -> DepthNet/LSS splat -> [B,X,Y,Z,C]
  lidar branch   voxelize -> SparseLiDAREnc8x -> dense [B,X,Y,Z,C]
  fusion         BiFuser_N grid-space KNN fusion
  semantics      CustomResNet3D (4 scales) -> FPN3D -> OccHead (+cascade)
  regularizer    frustum volume renderer (rgb + depth MSE)

The torch detector is a stateful class hierarchy (BEVDepth -> BEVDet ->
CenterPoint); here it is one linen module with a pure apply, batch layouts
channels-last, every capacity static.
"""
from __future__ import annotations

import os
from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config.base import CoOccConfig
from ..geometry.frustum import get_geometry, get_mlp_input
from ..nn.bifuser import BiFuserN
from ..nn.fpn3d import FPN3D
from ..nn.lss import LSSViewTransformerVoxel
from ..nn.occ_head import OccHead
from ..nn.resnet2d import ResNet
from ..nn.resnet3d import CustomResNet3D
from ..nn.second_fpn import SECONDFPN
from ..nn.sparse_enc import SparseLiDAREnc4x, SparseLiDAREnc8x
from ..ops.sparse_conv import SparseTensor
from ..ops.voxelize import voxelize
from .renderer import FrustumRenderer


class Batch(NamedTuple):
    """One training/eval batch, fixed shapes. Unused fields may be None.

    The reference's `img_inputs` 14-tuple (loading.py:128-129) maps onto the
    named fields here; `points` is the padded multi-sweep cloud.
    """
    imgs: Optional[jnp.ndarray] = None          # [B, N, H, W, 3] in [0, 1]
    rots: Optional[jnp.ndarray] = None          # [B, N, 3, 3]
    trans: Optional[jnp.ndarray] = None         # [B, N, 3]
    intrins: Optional[jnp.ndarray] = None       # [B, N, 3, 3]
    post_rots: Optional[jnp.ndarray] = None     # [B, N, 3, 3]
    post_trans: Optional[jnp.ndarray] = None    # [B, N, 3]
    bda: Optional[jnp.ndarray] = None           # [B, 3, 3]
    gt_depths: Optional[jnp.ndarray] = None     # [B, N, H, W]
    points: Optional[jnp.ndarray] = None        # [B, P, 5]
    points_mask: Optional[jnp.ndarray] = None   # [B, P]
    gt_occ: Optional[jnp.ndarray] = None        # [B, X, Y, Z] int
    points_occ: Optional[jnp.ndarray] = None    # [B, Q, 4+] lidarseg points
    points_occ_mask: Optional[jnp.ndarray] = None
    visible_mask: Optional[jnp.ndarray] = None  # [B, X, Y, Z] uint8 (openocc)
    gt_occ_2: Optional[jnp.ndarray] = None      # [B, X/2, Y/2, Z/2] (kitti 1_2)
    # temporal-stereo depth inputs (cfg.lss.stereo; nn/lss_stereo.py)
    imgs_prev: Optional[jnp.ndarray] = None     # [B, N, H, W, 3]
    k2s_rots: Optional[jnp.ndarray] = None      # [B, N, 3, 3] key-cam -> prev-cam
    k2s_trans: Optional[jnp.ndarray] = None     # [B, N, 3]


class CoOccRay(nn.Module):
    cfg: CoOccConfig
    dtype: Any = None

    def _image_voxels(self, batch: Batch, train: bool):
        cfg = self.cfg
        B, N, H, W, _ = batch.imgs.shape
        x = batch.imgs.reshape(B * N, H, W, 3)
        if cfg.img_backbone.type == "SwinTransformer":
            from ..nn.swin import SwinTransformer
            feats = SwinTransformer(
                embed_dims=cfg.img_backbone.embed_dims,
                depths=cfg.img_backbone.swin_depths,
                num_heads=cfg.img_backbone.swin_num_heads,
                window_size=cfg.img_backbone.window_size,
                out_indices=cfg.img_backbone.out_indices,
                dtype=self.dtype, name="img_backbone")(x, train=train)
        else:
            backbone = ResNet(depth=cfg.img_backbone.depth,
                              norm_eval=cfg.img_backbone.norm_eval,
                              dtype=self.dtype, name="img_backbone")
            feats = backbone(x, train=train)
        stereo_inputs = None
        if cfg.lss is not None and cfg.lss.stereo \
                and batch.imgs_prev is not None:
            # BEVStereo temporal-stereo depth: re-run the SHARED backbone on
            # the previous keyframe; its stride-4 stage feeds the plane-sweep
            # cost volume. Prev features enter under stop_gradient, like the
            # reference's adjacent-frame convention (bevdepth.py:292).
            assert cfg.img_backbone.type != "SwinTransformer", \
                "stereo LSS expects the ResNet stride-4 stage as stereo feats"
            assert 0 in cfg.img_backbone.out_indices
            xp = batch.imgs_prev.reshape(B * N, H, W, 3)
            feats_prev = backbone(xp, train=train)
            stereo_inputs = dict(
                key_stereo=feats[0],
                sweep_stereo=jax.lax.stop_gradient(feats_prev[0]),
                key_intrin=batch.intrins.reshape(B * N, 3, 3),
                sweep_intrin=batch.intrins.reshape(B * N, 3, 3),
                k2s_rot=batch.k2s_rots.reshape(B * N, 3, 3),
                k2s_tran=batch.k2s_trans.reshape(B * N, 3))
        x = SECONDFPN(in_channels=cfg.img_neck.in_channels,
                      out_channels=cfg.img_neck.out_channels,
                      upsample_strides=cfg.img_neck.upsample_strides,
                      dtype=self.dtype, name="img_neck")(feats, train=train)
        fH, fW, C = x.shape[-3:]
        x = x.reshape(B, N, fH, fW, C)
        img_feats = x

        mlp_input = get_mlp_input(batch.rots, batch.trans, batch.intrins,
                                  batch.post_rots, batch.post_trans, batch.bda)
        bev, depth_prob, geom = LSSViewTransformerVoxel(
            cfg=cfg, dtype=self.dtype, name="img_view_transformer")(
            x, batch.rots, batch.trans, batch.intrins, batch.post_rots,
            batch.post_trans, batch.bda, mlp_input, train=train,
            stereo_inputs=stereo_inputs)
        return bev, depth_prob, img_feats, geom

    def _pts_voxels(self, batch: Batch, train: bool):
        cfg = self.cfg
        pts = cfg.pts
        max_vox = pts.max_voxels if train else pts.max_voxels_test

        impl = pts.impl
        if impl == "auto":
            if pts.encoder == "SparseLiDAREnc8x":
                impl = "packed"
            elif pts.encoder == "SparseEncoderHD":
                # packed_hd (z-packed dense twin) won the round-5 on-chip
                # A/B 425.77 ms vs 2088.49 ms gather-GEMM at real
                # coocc_lidar shapes (tools/ab_hd_impl.py, docs/ab_hd.log)
                # and drops the gather path's capacity truncation of
                # dilated downsample sets (at 120k cap the truncation was
                # ACTIVE at real occupancy). COOCC_HD_IMPL=gather restores
                # the rulebook form.
                impl = os.environ.get("COOCC_HD_IMPL", "packed_hd")
            else:
                impl = "gather"
        if impl in ("dense", "packed") \
                and pts.encoder == "SparseLiDAREnc8x":
            # The dense encoders only consume voxel OCCUPANCY (their stem
            # GroupNorm erases features) — use the sort-free mask voxelizer.
            from ..nn.sparse_enc_dense import DenseLiDAREnc8x
            from ..nn.sparse_enc_packed import PackedLiDAREnc8x
            from ..ops.voxelize import voxelize_mask
            # NOT vmap: the batched scatter lowers ~2x slower than B
            # unbatched scatters on TPU. B == 1 keeps the bare unbatched
            # lowering; B > 1 runs the same per-sample program under
            # lax.map so the traced HLO stays constant-size in B.
            def vox_mask_one(p, m):
                return voxelize_mask(p, m, cfg.point_cloud_range,
                                     pts.voxel_size, pts.sparse_shape_xyz,
                                     max_voxels=max_vox)
            if batch.points.shape[0] == 1:
                mask0 = vox_mask_one(batch.points[0], batch.points_mask[0])[None]
            else:
                mask0 = jax.lax.map(lambda a: vox_mask_one(*a),
                                    (batch.points, batch.points_mask))
            enc_cls = (PackedLiDAREnc8x if impl == "packed"
                       else DenseLiDAREnc8x)
            kw = {}
            if impl == "packed":
                kw["ztap_levels"] = tuple(pts.ztap_levels)
            dense = enc_cls(
                input_channel=pts.input_channel, base_channel=pts.base_channel,
                out_channel=pts.out_channel,
                sparse_shape_xyz=pts.sparse_shape_xyz,
                capacity=max_vox,
                compute_dtype=self.dtype or jnp.float32,
                name="pts_middle_encoder", **kw,
            )(mask0, train=train)
            return dense.astype(self.dtype or jnp.float32)

        if impl in ("dense", "packed"):
            raise ValueError(
                f"pts.impl='{impl}' has a dense/packed twin only for "
                f"SparseLiDAREnc8x, not {pts.encoder}; use impl='gather'")

        def vox_one(p, m):
            return voxelize(
                p, m, cfg.point_cloud_range, pts.voxel_size,
                pts.sparse_shape_xyz, max_voxels=max_vox,
                max_points_per_voxel=pts.max_num_points,
                num_features=pts.input_channel)

        v = jax.vmap(vox_one)(batch.points, batch.points_mask)
        sp = SparseTensor(ids=v.ids, features=v.features, mask=v.mask)
        if pts.encoder == "SparseEncoderHD":
            from ..nn.second3d import SECOND3D, SECOND3DFPN
            if impl == "packed_hd":
                # z-packed dense twin (same params/scopes): one conv2d per
                # sparse conv instead of rulebook+gather chains — the
                # round-5 fix for coocc_lidar's 0.466 fps (see
                # nn/sparse_enc_packed_hd.py)
                from ..nn.sparse_enc_packed_hd import PackedEncoderHD
                dense = PackedEncoderHD(
                    in_channels=pts.input_channel,
                    base_channels=pts.base_channel,
                    output_channels=pts.out_channel,
                    sparse_shape_xyz=pts.sparse_shape_xyz,
                    capacity=max_vox,
                    compute_dtype=self.dtype or jnp.float32,
                    name="pts_middle_encoder",
                )(sp, train=train)
            else:
                from ..nn.sparse_encoder_hd import SparseEncoderHD
                dense = SparseEncoderHD(
                    in_channels=pts.input_channel,
                    base_channels=pts.base_channel,
                    output_channels=pts.out_channel,
                    sparse_shape_xyz=pts.sparse_shape_xyz,
                    capacity=max_vox, name="pts_middle_encoder",
                )(sp, train=train)
            if cfg.second3d is not None:
                # dense [B, X, Y, Z, C] -> conv axes (Z, Y, X) like the
                # reference's (D, H, W) layout, then back
                # (coocc_ray_lidar.py:214-236 permute(0,1,4,3,2))
                zyx = jnp.transpose(dense, (0, 3, 2, 1, 4))
                feats = SECOND3D(
                    in_channels=cfg.second3d.in_channels,
                    out_channels=cfg.second3d.out_channels,
                    layer_nums=cfg.second3d.layer_nums,
                    layer_strides=cfg.second3d.layer_strides,
                    is_cascade=cfg.second3d.is_cascade,
                    dtype=self.dtype, name="pts_backbone",
                )(zyx, train=train)
                out = SECOND3DFPN(
                    in_channels=cfg.second3d.out_channels,
                    out_channels=cfg.second3d.fpn_out_channels,
                    upsample_strides=cfg.second3d.fpn_upsample_strides,
                    extra_num_conv=cfg.second3d.fpn_extra_num_conv,
                    dtype=self.dtype, name="pts_neck",
                )(feats, train=train)
                dense = jnp.transpose(out, (0, 3, 2, 1, 4))
        else:
            enc_cls = {"SparseLiDAREnc8x": SparseLiDAREnc8x,
                       "SparseLiDAREnc4x": SparseLiDAREnc4x}[pts.encoder]
            dense = enc_cls(
                input_channel=pts.input_channel, base_channel=pts.base_channel,
                out_channel=pts.out_channel,
                sparse_shape_xyz=pts.sparse_shape_xyz,
                capacity=max_vox, name="pts_middle_encoder",
            )(sp, train=train)
        return dense.astype(self.dtype or jnp.float32)

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False,
                 fine_rng: Optional[jax.Array] = None,
                 stop_at: Optional[str] = None):
        """stop_at: profiling hook — truncate the forward after a stage
        ('img' | 'pts' | 'fuse' | 'sem') and return that stage's outputs.
        Marginal prefix timings account for every inter-stage boundary cost
        the isolated-stage profiler misses (tools/profile_prefix.py)."""
        cfg = self.cfg
        img_voxel, depth_prob, img_feats, geom = (None, None, None, None)
        if cfg.use_camera and batch.imgs is not None:
            img_voxel, depth_prob, img_feats, geom = self._image_voxels(
                batch, train)
        if stop_at == "img":
            return {"img_voxel": img_voxel}
        pts_voxel = None
        if cfg.use_lidar and batch.points is not None:
            pts_voxel = self._pts_voxels(batch, train)
        if stop_at == "pts":
            return {"img_voxel": img_voxel, "pts_voxel": pts_voxel}

        if cfg.fuser is not None and img_voxel is not None \
                and pts_voxel is not None:
            voxel_feats = BiFuserN(
                in_channels=cfg.fuser.in_channels,
                out_channels=cfg.fuser.out_channels,
                knum=cfg.fuser.knum, dist_thresh=cfg.fuser.dist_thresh,
                window_rx=cfg.fuser.window_rx,
                window_ry=cfg.fuser.window_ry,
                window_rz=cfg.fuser.window_rz,
                window_img_rx=getattr(cfg.fuser, "window_img_rx", None),
                window_img_ry=getattr(cfg.fuser, "window_img_ry", None),
                window_img_rz=getattr(cfg.fuser, "window_img_rz", None),
                dtype=self.dtype, name="occ_fuser",
            )(img_voxel, pts_voxel, train=train)
        else:
            voxel_feats = img_voxel if pts_voxel is None else pts_voxel
        if stop_at == "fuse":
            return {"voxel_feats": voxel_feats}

        # the semantic stack runs z-batch-resident end-to-end (one boundary
        # transpose instead of two per conv3d; identical params/math)
        mid = CustomResNet3D(
            depth=cfg.semantic.depth,
            block_inplanes=cfg.semantic.block_inplanes,
            block_strides=cfg.semantic.block_strides,
            out_indices=cfg.semantic.out_indices,
            dtype=self.dtype, name="semantic_encoder",
        )(voxel_feats, train=train, zb=True, zb_out=True)
        semantic = FPN3D(
            in_channels=cfg.semantic.block_inplanes,
            out_channels=cfg.semantic.neck_out_channels,
            with_cp=cfg.semantic.neck_with_cp and train,
            dtype=self.dtype, name="semantic_neck",
        )(mid, train=train, zb=True)

        if stop_at == "sem":
            return {"semantic": list(semantic)}

        transform = None
        if batch.rots is not None:
            transform = (batch.rots, batch.trans, batch.intrins,
                         batch.post_rots, batch.post_trans, batch.bda)
        head_out = OccHead(cfg=cfg.occ_head, dtype=self.dtype,
                           name="pts_bbox_head")(
            list(semantic), img_feats=img_feats, transform=transform,
            train=train, fine_rng=fine_rng, zb=True,
            coarse_only=(stop_at == "coarse"))
        if stop_at == "coarse":
            return dict(head_out)

        outs = dict(head_out)
        if train:
            # training intermediates for the loss fns (depth BCE, renderer);
            # the reference's simple_test returns only occupancy outputs
            # (coocc_ray.py:520-656), so eval graphs skip materializing these
            outs["depth_prob"] = depth_prob
            outs["voxel_feats"] = voxel_feats
            outs["geom"] = geom

        if cfg.render.use_rendering and (train or cfg.render.test_rendering):
            # the reference renders on a stride-16 frustum and upsamples x16
            # regardless of cfg.scale (coocc_ray.py:364-417 uses the LSS
            # geometry; the lidar-only branch hardcodes 16, :494)
            renderer = FrustumRenderer(
                cfg=cfg.render, scale=16,
                with_rgb=cfg.use_camera, dtype=self.dtype, name="renderer")
            if geom is None and batch.rots is not None:
                from ..geometry.frustum import create_frustum
                frustum = jnp.asarray(create_frustum(
                    cfg.data.input_size, 16, (2.0, 58.0, 0.5)))
                geom = get_geometry(frustum, batch.rots, batch.trans,
                                    batch.intrins, batch.post_rots,
                                    batch.post_trans, batch.bda)
            # renderer consumes the FUSED voxel features (pre-semantic stack)
            if geom is not None:
                rgbs, depths = renderer(voxel_feats, geom)
                if rgbs is not None:
                    outs["render_rgb"] = rgbs  # [B, N, H, W, 3]
                outs["render_depth"] = depths  # [B, N, H, W]
        return outs
