"""Alternative 2D necks (capability-envelope components).

The reference registers three extra image necks no shipped config uses:

  * SECONDFPN2 (reference: coocc/necks/secondfpn.py:12-95) — the SECONDFPN
    deblock stack that returns the per-level list instead of a concat;
  * GeneralizedLSSFPN (generalized_lss.py:13-103) — top-down
    upsample-cat-conv1x1-conv3x3 FPN (BEVFusion-style, align_corners=True
    bilinear);
  * FPN_Render (fpn_render.py:10-203) — the standard mmdet FPN (lateral
    1x1 + top-down add + 3x3 out convs).

All channels-last; BN(eps 1e-3, momentum 0.01) like the reference's
norm_cfg; bilinear resizes via ops.interpolate.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.interpolate import resize_bilinear_chlast
from .layers import BatchNorm, Conv2d
from .second_fpn import SECONDFPN


class SECONDFPN2(nn.Module):
    """SECONDFPN deblocks returning the per-level list (secondfpn.py:75-95)."""
    in_channels: Tuple[int, ...] = (128, 128, 256)
    out_channels: Tuple[int, ...] = (256, 256, 256)
    upsample_strides: Tuple[float, ...] = (1, 2, 4)
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        assert len(feats) == len(self.in_channels)
        outs = []
        for i, oc in enumerate(self.out_channels):
            fpn = SECONDFPN(
                in_channels=(self.in_channels[i],), out_channels=(oc,),
                upsample_strides=(self.upsample_strides[i],),
                dtype=self.dtype, name=f"deblock{i}")
            outs.append(fpn([feats[i]], train=train))
        return tuple(outs)


class _ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel
        x = Conv2d(self.features, (k, k), (1, 1), k // 2, use_bias=False,
                   dtype=self.dtype, name="conv")(x)
        x = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      name="bn")(x)
        return nn.relu(x)


class GeneralizedLSSFPN(nn.Module):
    """Top-down cat FPN (generalized_lss.py:81-103): for each level i,
    upsample level i+1 to i's size (align_corners=True), concat, 1x1
    lateral conv, 3x3 fpn conv; returns all but the coarsest level."""
    in_channels: Tuple[int, ...] = (192, 384, 768)
    out_channels: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        assert len(feats) == len(self.in_channels)
        n = len(feats) - 1
        laterals = list(feats)
        for i in range(n - 1, -1, -1):
            up = resize_bilinear_chlast(
                laterals[i + 1], laterals[i].shape[-3:-1],
                align_corners=True)
            x = jnp.concatenate([laterals[i], up], axis=-1)
            x = _ConvBNReLU(self.out_channels, kernel=1, dtype=self.dtype,
                            name=f"lateral{i}")(x, train=train)
            x = _ConvBNReLU(self.out_channels, kernel=3, dtype=self.dtype,
                            name=f"fpn{i}")(x, train=train)
            laterals[i] = x
        return tuple(laterals[:n])


class FPNRender(nn.Module):
    """Standard mmdet FPN (fpn_render.py:151-203): 1x1 laterals, top-down
    nearest-add, 3x3 output convs; num_outs == num levels (no extra)."""
    in_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    out_channels: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        assert len(feats) == len(self.in_channels)
        n = len(feats)
        laterals = [
            Conv2d(self.out_channels, (1, 1), (1, 1), 0,
                   dtype=self.dtype, name=f"lateral{i}")(feats[i])
            for i in range(n)]
        for i in range(n - 1, 0, -1):
            H, W = laterals[i - 1].shape[-3:-1]
            up = laterals[i]
            # nearest x2 (mmdet FPN default upsample_cfg mode='nearest')
            up = jnp.repeat(jnp.repeat(up, 2, axis=-3), 2, axis=-2)
            laterals[i - 1] = laterals[i - 1] + up[..., :H, :W, :]
        return tuple(
            Conv2d(self.out_channels, (3, 3), (1, 1), 1,
                   dtype=self.dtype, name=f"fpn{i}")(laterals[i])
            for i in range(n))
