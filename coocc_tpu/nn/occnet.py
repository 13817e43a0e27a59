"""OccFormer-style dual-path 3D encoder (capability-envelope component).

Capability parity with the reference's registered alternative semantic
encoder (reference: coocc/backbones/occnet.py:13-74 OccupancyEncoder +
dualpath_block.py:13-82 DualpathTransformerBlock + modules/aspp.py:132-172
BottleNeckASPP): each block runs a SHARED shifted-window attention over
the BEV-mean plane and every z-slice (batched together), refines the BEV
path with a bottleneck ASPP, and merges it back per-voxel through a
sigmoid coefficient, with a strided-conv residual.

Channels-last [B, X, Y, Z, C]; the shared Swin block batches the BEV map
with the z-slices in one window-attention call exactly like the
reference's torch.cat along batch.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .depthnet import ASPP
from .layers import BatchNorm, Conv2d, Conv3d, GroupNorm
from .swin import SwinBlock


class BottleNeckASPP(nn.Module):
    """1x1 reduce (GN) -> ASPP -> 1x1 expand (GN) + residual."""
    inplanes: int
    reduction: int = 4
    dropout: float = 0.1
    num_groups: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = self.inplanes // self.reduction

        def fit_groups(g, ch):
            # reference reduces num_groups when channels get small
            # (aspp.py:152-154); also force divisibility for tiny test dims
            g = ch // 2 if ch <= g else g
            while g > 1 and ch % g:
                g -= 1
            return max(g, 1)

        groups = fit_groups(self.num_groups, C)
        groups_out = fit_groups(self.num_groups, self.inplanes)
        y = Conv2d(C, (1, 1), (1, 1), 0, use_bias=False, dtype=self.dtype,
                   name="input_conv")(x)
        y = GroupNorm(num_groups=groups, name="input_gn")(y)
        y = nn.relu(y)
        y = ASPP(mid_channels=C, dropout_rate=self.dropout,
                 dtype=self.dtype, name="aspp")(y, train=train)
        y = Conv2d(self.inplanes, (1, 1), (1, 1), 0, use_bias=False,
                   dtype=self.dtype, name="output_conv")(y)
        y = GroupNorm(num_groups=groups_out, name="output_gn")(y)
        y = nn.relu(y)
        return x + y


class DualpathTransformerBlock(nn.Module):
    """Shared window attention over BEV + z-slices, ASPP global path."""
    channels: int
    stride: int = 1
    shift: bool = False
    head_channels: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, X, Y, Z, Cin = x.shape
        C = self.channels
        identity = x

        y = Conv3d(C, (3, 3, 3), (self.stride,) * 3, 1, use_bias=False,
                   dtype=self.dtype, name="input_conv")(x)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      name="input_bn")(y)
        y = nn.relu(y)
        B, X, Y, Z, _ = y.shape

        bev = y.mean(axis=3)                               # [B, X, Y, C]
        slices = jnp.transpose(y, (0, 3, 1, 2, 4)).reshape(B * Z, X, Y, C)
        tokens = jnp.concatenate([bev, slices], axis=0)
        tokens = SwinBlock(C, max(1, C // self.head_channels),
                           window_size=7,
                           shift=3 if self.shift else 0, mlp_ratio=1,
                           dtype=self.dtype, name="bev_encoder")(tokens)
        bev, slices = tokens[:B], tokens[B:]
        y = jnp.transpose(slices.reshape(B, Z, X, Y, C), (0, 2, 3, 1, 4))

        bev = BottleNeckASPP(C, dtype=self.dtype, name="aspp")(
            bev, train=train)
        coeff = nn.sigmoid(
            Conv3d(1, (1, 1, 1), (1, 1, 1), 0, dtype=self.dtype,
                   name="combine_coeff")(y))
        y = y + coeff * bev[:, :, :, None, :]

        if self.stride > 1 or Cin != C:
            identity = Conv3d(C, (1, 1, 1), (self.stride,) * 3, 0,
                              use_bias=False, dtype=self.dtype,
                              name="downsample_conv")(identity)
            identity = BatchNorm(use_running_average=not train,
                                 dtype=self.dtype,
                                 name="downsample_bn")(identity)
        return y + identity


class OccupancyEncoder(nn.Module):
    """Stacked dual-path stages with multi-scale outputs."""
    block_numbers: Sequence[int] = (2, 2, 2, 2)
    block_inplanes: Sequence[int] = (64, 128, 256, 512)
    block_strides: Sequence[int] = (1, 2, 2, 2)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        layer_index = 0
        for i, (n, c, s) in enumerate(zip(self.block_numbers,
                                          self.block_inplanes,
                                          self.block_strides)):
            for b in range(n):
                x = DualpathTransformerBlock(
                    c, stride=s if b == 0 else 1,
                    shift=(layer_index % 2) == 1, dtype=self.dtype,
                    name=f"stage{i}_block{b}")(x, train=train)
                layer_index += 1
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
