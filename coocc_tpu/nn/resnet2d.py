"""2D ResNet backbone (torchvision/mmdet 'pytorch' style), channels-last.

Capability parity with the mmdet ResNet the reference configures
(reference: coocc_multi_r50_256x704.py:97-106 — depth 50/101,
out_indices (0,1,2,3), BN, 'pytorch' style = stride on the 3x3 conv of each
bottleneck). Weight-compatible with torchvision resnet50/101 checkpoints via
the converter (coocc_tpu.train.checkpoint).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNorm, Conv2d, max_pool_2d

RESNET_LAYERS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3),
                 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    norm_eval: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: BatchNorm(name=name,
                                    use_running_average=not train or self.norm_eval,
                                    dtype=self.dtype)
        out = Conv2d(self.planes, (1, 1), (1, 1), 0, use_bias=False,
                     dtype=self.dtype, name="conv1")(x)
        out = bn("bn1")(out)
        out = nn.relu(out)
        out = Conv2d(self.planes, (3, 3), (self.stride, self.stride), 1,
                     use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = bn("bn2")(out)
        out = nn.relu(out)
        out = Conv2d(self.planes * 4, (1, 1), (1, 1), 0, use_bias=False,
                     dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)
        if self.has_downsample:
            identity = Conv2d(self.planes * 4, (1, 1),
                              (self.stride, self.stride), 0, use_bias=False,
                              dtype=self.dtype, name="downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        else:
            identity = x
        return nn.relu(out + identity)


class BasicBlock2d(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    norm_eval: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: BatchNorm(name=name,
                                    use_running_average=not train or self.norm_eval,
                                    dtype=self.dtype)
        out = Conv2d(self.planes, (3, 3), (self.stride, self.stride), 1,
                     use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = bn("bn1")(out)
        out = nn.relu(out)
        out = Conv2d(self.planes, (3, 3), (1, 1), 1, use_bias=False,
                     dtype=self.dtype, name="conv2")(out)
        out = bn("bn2")(out)
        if self.has_downsample:
            identity = Conv2d(self.planes, (1, 1),
                              (self.stride, self.stride), 0, use_bias=False,
                              dtype=self.dtype, name="downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        else:
            identity = x
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """[B*, H, W, 3] -> tuple of stage features at strides 4/8/16/32."""
    depth: int = 50
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    norm_eval: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        layers = RESNET_LAYERS[self.depth]
        block_cls = Bottleneck if self.depth >= 50 else BasicBlock2d
        expansion = 4 if self.depth >= 50 else 1

        x = Conv2d(64, (7, 7), (2, 2), 3, use_bias=False, dtype=self.dtype,
                   name="conv1")(x)
        x = BatchNorm(name="bn1", use_running_average=not train or self.norm_eval,
                      dtype=self.dtype)(x)
        x = nn.relu(x)
        x = max_pool_2d(x, 3, 2, 1)

        outs = []
        in_planes = 64
        for i, n_blocks in enumerate(layers):
            planes = 64 * (2 ** i)
            stride = 1 if i == 0 else 2
            for b in range(n_blocks):
                s = stride if b == 0 else 1
                needs_ds = (b == 0) and (s != 1 or in_planes != planes * expansion)
                x = block_cls(planes=planes, stride=s, has_downsample=needs_ds,
                              norm_eval=self.norm_eval, dtype=self.dtype,
                              name=f"layer{i + 1}_{b}")(x, train=train)
                in_planes = planes * expansion
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
