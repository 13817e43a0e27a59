"""CustomResNet3D semantic voxel encoder (channels-last 3D convs).

Capability parity with the reference backbone
(coocc/backbones/resnet3d.py:106-205): 1x1x1 input projection, 4 stages of
BasicBlock3D (depth 18: 2 blocks each) with strides (1, 2, 2, 2) and widths
block_inplanes, multi-scale outputs. Dense conv3d maps straight onto the MXU
(grids are 100x100x8 .. 13x13x1 for the r50 config).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNorm, Conv3d

RESNET3D_LAYERS = {10: (1, 1, 1, 1), 18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}


class BasicBlock3D(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, zb: bool = False):
        """zb=True: x is z-batch-resident [B, Z, X, Y, C] (same params)."""
        s = (self.stride,) * 3
        out = Conv3d(self.planes, (3, 3, 3), s, 1, use_bias=False,
                     dtype=self.dtype, name="conv1")(x, zb=zb)
        out = BatchNorm(use_running_average=not train, dtype=self.dtype,
                        name="bn1")(out)
        out = nn.relu(out)
        out = Conv3d(self.planes, (3, 3, 3), (1, 1, 1), 1, use_bias=False,
                     dtype=self.dtype, name="conv2")(out, zb=zb)
        out = BatchNorm(use_running_average=not train, dtype=self.dtype,
                        name="bn2")(out)
        if self.has_downsample:
            identity = Conv3d(self.planes, (1, 1, 1), s, 0, use_bias=False,
                              dtype=self.dtype, name="downsample_conv")(
                x, zb=zb)
            identity = BatchNorm(use_running_average=not train,
                                 dtype=self.dtype, name="downsample_bn")(identity)
        else:
            identity = x
        return nn.relu(out + identity)


class CustomResNet3D(nn.Module):
    """[B, X, Y, Z, C] -> tuple of per-stage [B, X/s, Y/s, Z/s, C_i]."""
    depth: int = 18
    block_inplanes: Tuple[int, ...] = (128, 256, 512, 1024)
    block_strides: Tuple[int, ...] = (1, 2, 2, 2)
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, zb: bool = False,
                 zb_out: bool = False, stop_stage: Optional[int] = None):
        """zb=True computes (and with zb_out=True also returns) every stage
        in z-batch-resident [B, Z, X, Y, C] layout — identical params/math,
        one boundary transpose instead of two per conv.
        stop_stage: debugging/profiling hook — truncate after stage i
        (-1 = after input_proj only); used to bisect the openoccupancy
        TPU-worker crash (tools/repro_openocc_sem.py)."""
        layers = RESNET3D_LAYERS[self.depth]
        if zb:
            x = jnp.transpose(x, (0, 3, 1, 2, 4))  # [B, Z, X, Y, C]
        x = Conv3d(self.block_inplanes[0], (1, 1, 1), (1, 1, 1), 0,
                   use_bias=False, dtype=self.dtype,
                   name="input_proj_conv")(x, zb=zb)
        x = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      name="input_proj_bn")(x)
        x = nn.relu(x)
        if stop_stage is not None and stop_stage < 0:
            return (x,)

        outs = []
        in_planes = self.block_inplanes[0]
        for i, planes in enumerate(self.block_inplanes):
            stride = self.block_strides[i]
            for b in range(layers[i]):
                s = stride if b == 0 else 1
                needs_ds = (b == 0) and (s != 1 or in_planes != planes)
                x = BasicBlock3D(planes=planes, stride=s,
                                 has_downsample=needs_ds, dtype=self.dtype,
                                 name=f"layer{i}_{b}")(x, train=train, zb=zb)
                in_planes = planes
            if i in self.out_indices:
                outs.append(
                    jnp.transpose(x, (0, 2, 3, 1, 4))
                    if (zb and not zb_out) else x)
            if stop_stage is not None and i >= stop_stage:
                return tuple(outs)
        return tuple(outs)
