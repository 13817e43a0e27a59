"""FPN3D neck: lateral 1x1x1 convs + trilinear top-down + 3x3x3 fpn convs.

Capability parity with the reference neck (coocc/necks/fpn3d.py:14-108):
lateral ConvModule (conv+norm+ReLU, bias=False), top-down adds via trilinear
interpolation (align_corners=False), per-level fpn conv. Uses
jax.checkpoint-style remat through nn.remat when with_cp is set, mirroring
the reference's torch.utils.checkpoint use (fpn3d.py:84-104).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn

from ..ops.interpolate import resize_linear, resize_trilinear_chlast
from .layers import BatchNorm, Conv3d


class _ConvNormReLU3D(nn.Module):
    features: int
    kernel: int
    padding: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, zb: bool = False):
        k = (self.kernel,) * 3
        x = Conv3d(self.features, k, (1, 1, 1), self.padding, use_bias=False,
                   dtype=self.dtype, name="conv")(x, zb=zb)
        x = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      name="bn")(x)
        return nn.relu(x)


class FPN3D(nn.Module):
    in_channels: Tuple[int, ...] = (128, 256, 512, 1024)
    out_channels: int = 256
    with_cp: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, train: bool = False, zb: bool = False):
        """zb=True: inputs/outputs are z-batch-resident [B, Z, X, Y, C]
        (same params; pairs with CustomResNet3D(zb=True, zb_out=True))."""
        assert len(inputs) == len(self.in_channels)
        n = len(inputs)
        block = _ConvNormReLU3D
        if self.with_cp:
            block = nn.remat(block, static_argnums=(2, 3))

        laterals = [
            block(self.out_channels, 1, 0, dtype=self.dtype,
                  name=f"lateral{i}")(inputs[i], train, zb)
            for i in range(n)
        ]
        for i in range(n - 1, 0, -1):
            if zb:
                tgt = laterals[i - 1].shape[1:4]  # (Z, X, Y)
                up = resize_linear(laterals[i], tgt, (1, 2, 3),
                                   align_corners=False)
            else:
                up = resize_trilinear_chlast(
                    laterals[i], laterals[i - 1].shape[-4:-1],
                    align_corners=False)
            laterals[i - 1] = laterals[i - 1] + up

        outs = [
            block(self.out_channels, 3, 1, dtype=self.dtype,
                  name=f"fpn{i}")(laterals[i], train, zb)
            for i in range(n)
        ]
        return tuple(outs)
