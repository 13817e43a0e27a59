"""SECOND3D backbone + SECOND3DFPN neck (LiDAR-only config dense stack).

Capability parity with the reference modules
(coocc/backbones/second3d.py:12-114, coocc/necks/second3d_fpn.py:12-143) as
configured by coocc_lidar.py:113-130: Conv3d blocks with (1,3,3) kernels and
strides on the H/W axes only (z untouched), BN3d(eps 1e-3, momentum 0.01),
parallel (is_cascade=False) multi-scale outputs; FPN deblocks are 1x1x1 conv
(stride 1, use_conv_for_no_stride) or deconv3d k=(1,s,s), summed, followed by
3 extra 3x3x3 conv blocks.

Layout: channels-last [B, Z, Y, X, C] (z first to mirror the reference's
(D, H, W) conv axes; the model wrapper permutes to/from [B, X, Y, Z, C]).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNorm, Conv3d


class SECOND3D(nn.Module):
    in_channels: Tuple[int, ...] = (128, 128, 128)
    out_channels: Tuple[int, ...] = (128, 256, 512)
    layer_nums: Tuple[int, ...] = (5, 5, 5)
    layer_strides: Tuple[int, ...] = (1, 2, 4)
    is_cascade: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, Z, Y, X, C] -> tuple of per-stage feature maps."""
        bn = lambda name: BatchNorm(eps=1e-3, momentum=0.01,
                                    use_running_average=not train,
                                    dtype=self.dtype, name=name)
        outs = []
        inp = x
        for i, n_layers in enumerate(self.layer_nums):
            s = self.layer_strides[i]
            y = Conv3d(self.out_channels[i], (1, 3, 3), (1, s, s),
                       ((0, 0), (1, 1), (1, 1)), use_bias=False,
                       dtype=self.dtype, name=f"block{i}_conv0")(inp)
            y = bn(f"block{i}_bn0")(y)
            y = nn.relu(y)
            for j in range(n_layers):
                y = Conv3d(self.out_channels[i], (1, 3, 3), (1, 1, 1),
                           ((0, 0), (1, 1), (1, 1)), use_bias=False,
                           dtype=self.dtype, name=f"block{i}_conv{j + 1}")(y)
                y = bn(f"block{i}_bn{j + 1}")(y)
                y = nn.relu(y)
            outs.append(y)
            if self.is_cascade:
                inp = y
        return tuple(outs)


class SECOND3DFPN(nn.Module):
    in_channels: Tuple[int, ...] = (128, 256, 512)
    out_channels: Tuple[int, ...] = (128, 128, 128)
    upsample_strides: Tuple[int, ...] = (1, 2, 4)
    use_conv_for_no_stride: bool = True
    extra_num_conv: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats: tuple of [B, Z, Y, X, C_i] -> [B, Z, Y, X, out]."""
        bn = lambda name: BatchNorm(eps=1e-3, momentum=0.01,
                                    use_running_average=not train,
                                    dtype=self.dtype, name=name)
        ups = []
        for i, x in enumerate(feats):
            s = int(self.upsample_strides[i])
            oc = self.out_channels[i]
            if s > 1 or (s == 1 and not self.use_conv_for_no_stride):
                y = nn.ConvTranspose(
                    features=oc, kernel_size=(1, s, s), strides=(1, s, s),
                    padding="VALID", use_bias=False, transpose_kernel=True,
                    dtype=self.dtype, name=f"deblock{i}_deconv")(x)
            else:
                y = Conv3d(oc, (1, 1, 1), (1, 1, 1), 0, use_bias=False,
                           dtype=self.dtype, name=f"deblock{i}_conv")(x)
            y = bn(f"deblock{i}_bn")(y)
            y = nn.relu(y)
            ups.append(y)
        out = sum(ups) if len(ups) > 1 else ups[0]
        for j in range(self.extra_num_conv):
            out = Conv3d(self.out_channels[-1], (3, 3, 3), (1, 1, 1), 1,
                         use_bias=False, dtype=self.dtype,
                         name=f"extra{j}_conv")(out)
            out = bn(f"extra{j}_bn")(out)
            out = nn.relu(out)
        return out
