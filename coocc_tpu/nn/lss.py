"""LSS view transformer (voxel variant): DepthNet -> lift -> fused splat.

Capability parity with ViewTransformerLiftSplatShootVoxel
(reference: ViewTransformerLSSVoxel.py:15-145 over
ViewTransformerLSSBEVDepth.py:609-799). TPU redesign: the depth⊗feature
outer-product volume is never materialized — the splat kernel
(coocc_tpu.ops.lift_splat) fuses the depth weighting into the scatter.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..config.base import CoOccConfig
from ..geometry.frustum import create_frustum, gen_dx_bx, get_geometry
from ..ops.lift_splat import lift_splat
from .depthnet import DepthNet


class LSSViewTransformerVoxel(nn.Module):
    """[B, N, fH, fW, C_in] + calibration -> [B, X, Y, Z, numC_Trans] voxels."""
    cfg: CoOccConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x, rots, trans, intrins, post_rots, post_trans, bda,
                 mlp_input, train: bool = False, stereo_inputs=None):
        cfg = self.cfg
        lss = cfg.lss
        B, N, fH, fW, Cin = x.shape
        D = cfg.grid.num_depth_bins

        if stereo_inputs is not None:
            # BEVStereo temporal-stereo depth (nn/lss_stereo.py): mono depth
            # + plane-sweep cost volume against the previous keyframe's
            # stride-4 features, EM-refined Gaussian hypotheses per range.
            from .lss_stereo import LSSBEVStereo
            img_feat, depth_prob = LSSBEVStereo(
                mid_channels=lss.numC_input,
                context_channels=lss.numC_Trans,
                depth_channels=D,
                dbound=cfg.grid.dbound,
                num_ranges=lss.stereo_num_ranges,
                range_list=lss.stereo_range_list,
                em_iteration=lss.stereo_em_iteration,
                num_samples=lss.stereo_num_samples,
                num_groups=lss.stereo_num_groups,
                stereo_downsample=lss.stereo_downsample,
                downsample=lss.downsample,
                dtype=self.dtype,
                name="depth_net",
            )(x.reshape(B * N, fH, fW, Cin),
              stereo_inputs["sweep_stereo"], stereo_inputs["key_stereo"],
              mlp_input.reshape(B * N, -1), stereo_inputs["key_intrin"],
              stereo_inputs["sweep_intrin"], stereo_inputs["k2s_rot"],
              stereo_inputs["k2s_tran"], train=train)
        else:
            out = DepthNet(
                mid_channels=lss.numC_input,
                context_channels=lss.numC_Trans,
                depth_channels=D,
                cam_channels=lss.cam_channels,
                dtype=self.dtype,
                name="depth_net",
            )(x.reshape(B * N, fH, fW, Cin),
              mlp_input.reshape(B * N, -1), train=train)

            depth_logit = out[..., :D]
            img_feat = out[..., D:D + lss.numC_Trans]
            depth_prob = nn.softmax(depth_logit, axis=-1)

        frustum = jnp.asarray(
            create_frustum(cfg.data.input_size, lss.downsample,
                           cfg.grid.dbound))
        geom = get_geometry(frustum, rots, trans, intrins, post_rots,
                            post_trans, bda)

        dx, bx, nx = gen_dx_bx(cfg.grid.xbound, cfg.grid.ybound,
                               cfg.grid.zbound)
        # [BN, fH, fW, D] -> [B, N, D, fH, fW]
        dp = depth_prob.reshape(B, N, fH, fW, D).transpose(0, 1, 4, 2, 3)
        # feats stay in model dtype; the splat gathers them natively and
        # upcasts after the gather (identical values, half the traffic)
        bev = lift_splat(dp.astype(jnp.float32),
                         img_feat.reshape(B, N, fH, fW, -1),
                         geom, dx, bx, nx)
        return bev.astype(x.dtype), depth_prob.reshape(B, N, fH, fW, D), geom
