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
                 mlp_input, train: bool = False):
        cfg = self.cfg
        lss = cfg.lss
        B, N, fH, fW, Cin = x.shape
        D = cfg.grid.num_depth_bins

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
        bev = lift_splat(dp.astype(jnp.float32),
                         img_feat.reshape(B, N, fH, fW, -1).astype(jnp.float32),
                         geom, dx, bx, nx)
        return bev.astype(x.dtype), depth_prob.reshape(B, N, fH, fW, D), geom
