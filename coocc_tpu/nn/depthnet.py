"""Camera-aware DepthNet: SE-conditioned depth + context heads with ASPP+DCN.

Capability parity with the reference DepthNet
(ViewTransformerLSSBEVDepth.py:495-549 and helpers Mlp:455, SELayer:480,
ASPP:382, BasicBlock from mmdet). Produces [B*N, fH, fW, D + C_ctx]:
first D channels are depth logits, the rest the image context features.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.dcn import deform_conv2d
from ..ops.interpolate import resize_bilinear_chlast
from .layers import BatchNorm, Conv2d, GroupNorm, Linear, avg_pool_global_2d


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = Linear(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = Linear(self.out, dtype=self.dtype, name="fc2")(x)
        return x


class SELayer(nn.Module):
    channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, x_se):
        """x: [B, H, W, C]; x_se: [B, C] conditioning -> gated features."""
        se = Linear(self.channels, dtype=self.dtype, name="conv_reduce")(x_se)
        se = nn.relu(se)
        se = Linear(self.channels, dtype=self.dtype, name="conv_expand")(se)
        gate = nn.sigmoid(se)
        return x * gate[:, None, None, :]


class _ASPPModule(nn.Module):
    planes: int
    kernel: int
    padding: int
    dilation: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.planes, (self.kernel, self.kernel), (1, 1),
                   self.padding, dilation=(self.dilation, self.dilation),
                   use_bias=False, dtype=self.dtype, name="atrous_conv")(x)
        x = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      name="bn")(x)
        return nn.relu(x)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (dilations 1/6/12/18 + global pool)."""
    mid_channels: int
    dropout_rate: float = 0.5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mc = self.mid_channels
        x1 = _ASPPModule(mc, 1, 0, 1, dtype=self.dtype, name="aspp1")(x, train)
        x2 = _ASPPModule(mc, 3, 6, 6, dtype=self.dtype, name="aspp2")(x, train)
        x3 = _ASPPModule(mc, 3, 12, 12, dtype=self.dtype, name="aspp3")(x, train)
        x4 = _ASPPModule(mc, 3, 18, 18, dtype=self.dtype, name="aspp4")(x, train)
        g = avg_pool_global_2d(x)
        g = Conv2d(mc, (1, 1), (1, 1), 0, use_bias=False, dtype=self.dtype,
                   name="gap_conv")(g)
        g = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      name="gap_bn")(g)
        g = nn.relu(g)
        # reference upsamples the pooled branch bilinearly, align_corners=True
        x5 = resize_bilinear_chlast(g, x4.shape[-3:-1], align_corners=True)
        x5 = jnp.broadcast_to(x5, x4.shape)
        y = jnp.concatenate([x1, x2, x3, x4, x5], axis=-1)
        y = Conv2d(mc, (1, 1), (1, 1), 0, use_bias=False, dtype=self.dtype,
                   name="conv1")(y)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      name="bn1")(y)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout_rate, deterministic=not train,
                       name="dropout")(y)
        return y


class BasicBlock2D(nn.Module):
    """mmdet ResNet BasicBlock (stride 1, same channels) used in depth_conv."""
    planes: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = Conv2d(self.planes, (3, 3), (1, 1), 1, use_bias=False,
                     dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(use_running_average=not train, dtype=self.dtype,
                        name="bn1")(out)
        out = nn.relu(out)
        out = Conv2d(self.planes, (3, 3), (1, 1), 1, use_bias=False,
                     dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(use_running_average=not train, dtype=self.dtype,
                        name="bn2")(out)
        return nn.relu(out + x)


class DCNLayer(nn.Module):
    """mmcv DeformConv2dPack equivalent: conv_offset + deformable conv."""
    features: int
    groups: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        offset = Conv2d(2 * 9, (3, 3), (1, 1), 1, use_bias=True,
                        dtype=self.dtype, name="conv_offset")(x)
        weight = self.param(
            "weight", nn.initializers.kaiming_normal(),
            (3, 3, x.shape[-1] // self.groups, self.features),
        )
        return deform_conv2d(x, offset, weight, kernel_size=3, padding=1,
                             groups=self.groups, deform_groups=1)


class DepthNet(nn.Module):
    mid_channels: int
    context_channels: int
    depth_channels: int
    cam_channels: int = 27
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mlp_input, train: bool = False):
        """x: [BN, fH, fW, C_in]; mlp_input: [BN, cam_channels]."""
        mlp_input = BatchNorm(use_running_average=not train,
                              dtype=self.dtype, name="bn")(mlp_input)
        x = Conv2d(self.mid_channels, (3, 3), (1, 1), 1, use_bias=True,
                   dtype=self.dtype, name="reduce_conv")(x)
        x = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      name="reduce_bn")(x)
        x = nn.relu(x)

        context_se = Mlp(self.mid_channels, self.mid_channels,
                         dtype=self.dtype, name="context_mlp")(mlp_input)
        context = SELayer(self.mid_channels, dtype=self.dtype,
                          name="context_se")(x, context_se)
        context = Conv2d(self.context_channels, (1, 1), (1, 1), 0,
                         use_bias=True, dtype=self.dtype,
                         name="context_conv")(context)

        depth_se = Mlp(self.mid_channels, self.mid_channels,
                       dtype=self.dtype, name="depth_mlp")(mlp_input)
        depth = SELayer(self.mid_channels, dtype=self.dtype,
                        name="depth_se")(x, depth_se)
        for i in range(3):
            depth = BasicBlock2D(self.mid_channels, dtype=self.dtype,
                                 name=f"depth_block{i}")(depth, train)
        depth = ASPP(self.mid_channels, dtype=self.dtype,
                     name="aspp")(depth, train)
        depth = DCNLayer(self.mid_channels, groups=4, dtype=self.dtype,
                         name="dcn")(depth)
        depth = Conv2d(self.depth_channels, (1, 1), (1, 1), 0, use_bias=True,
                       dtype=self.dtype, name="depth_pred")(depth)
        return jnp.concatenate([depth, context], axis=-1)
