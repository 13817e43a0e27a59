"""2D ResNet backbone (torchvision/mmdet 'pytorch' style), channels-last.

Capability parity with the mmdet ResNet the reference configures
(reference: coocc_multi_r50_256x704.py:97-106 — depth 50/101,
out_indices (0,1,2,3), BN, 'pytorch' style = stride on the 3x3 conv of each
bottleneck). Weight-compatible with torchvision resnet50/101 checkpoints via
the converter (coocc_tpu.train.checkpoint).
"""
from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import BatchNorm, Conv2d, max_pool_2d

RESNET_LAYERS = {10: (1, 1, 1, 1), 18: (2, 2, 2, 2), 34: (3, 4, 6, 3),
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


class _KernelLeaf(nn.Module):
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


class _StemKernel(nn.Module):
    """Param holder matching Conv2d's tree: <scope>/conv/kernel."""
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return _KernelLeaf(self.shape, name="conv")()


def _s2d_stem_weight(w: jnp.ndarray) -> jnp.ndarray:
    """[7, 7, 3, Co] -> [4, 4, 12, Co] exact space-to-depth stem weight.

    With x' the factor-2 space-to-depth of x (channel order (r, s, c):
    x'[a, b, r*6+s*3+c] = x[2a+r, 2b+s, c]), the 7x7 stride-2 pad-3 conv of
    x equals a 4x4 stride-1 conv of x' padded (2, 1): output row i reads
    input rows 2i-3..2i+3 = s2d rows i-2..i+1, each (u-3) splitting as
    2*((u-3)//2) + ((u-3)%2).  Raises the contraction density from 3 to 12
    input channels (the 3-channel conv wastes >90% of the MXU's lane dim)
    for 4*4*12/147 = 1.31x the MACs.
    """
    k1, k2, Ci, Co = w.shape
    assert (k1, k2, Ci) == (7, 7, 3)
    w2 = jnp.zeros((4, 4, 12, Co), w.dtype)
    for u in range(7):
        ka, r = (u - 3) // 2 + 2, (u - 3) % 2
        for v in range(7):
            kb, s = (v - 3) // 2 + 2, (v - 3) % 2
            c0 = r * 6 + s * 3
            w2 = w2.at[ka, kb, c0:c0 + 3].set(w[u, v])
    return w2


def _space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4*C], channel order (r, s, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        B, H // 2, W // 2, 4 * C)


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

        s2d = bool(os.environ.get("COOCC_S2D_STEM")) \
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        if s2d:
            # same param tree as the Conv2d branch (conv1/conv/kernel)
            w = _StemKernel((7, 7, 3, 64), name="conv1")()
            cd = self.dtype or x.dtype
            x = jax.lax.conv_general_dilated(
                _space_to_depth2(x).astype(cd),
                _s2d_stem_weight(w).astype(cd),
                (1, 1), [(2, 1), (2, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            x = Conv2d(64, (7, 7), (2, 2), 3, use_bias=False,
                       dtype=self.dtype, name="conv1")(x)
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
