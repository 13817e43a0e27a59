"""EfficientNet 2D backbone (capability-envelope component).

Capability parity with the reference's registered alternative backbone
(reference: coocc/backbones/efficientnet.py:275-520, mmcls-style
CustomEfficientNet): b0-b8 and es/em/el archs via width/depth scaling of
the shared layer table, InvertedResidual (MBConv with SE) and EdgeResidual
(fused-MBConv) blocks, Swish activations, multi-scale out_indices.

Channels-last NHWC; depthwise convs via feature_group_count (XLA lowers
these to efficient TPU convolutions); no drop-path (inference parity).
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNorm, Conv2d

# per-stage block rows [kernel, out_ch, se_ratio, stride, expand, type]
# type -1: plain ConvBNSwish, 0: InvertedResidual, 1: EdgeResidual
# (reference efficientnet.py:308-349)
_LAYERS_B = [
    [[3, 32, 0, 2, 0, -1]],
    [[3, 16, 4, 1, 1, 0]],
    [[3, 24, 4, 2, 6, 0], [3, 24, 4, 1, 6, 0]],
    [[5, 40, 4, 2, 6, 0], [5, 40, 4, 1, 6, 0]],
    [[3, 80, 4, 2, 6, 0], [3, 80, 4, 1, 6, 0], [3, 80, 4, 1, 6, 0],
     [5, 112, 4, 1, 6, 0], [5, 112, 4, 1, 6, 0], [5, 112, 4, 1, 6, 0]],
    [[5, 192, 4, 2, 6, 0], [5, 192, 4, 1, 6, 0], [5, 192, 4, 1, 6, 0],
     [5, 192, 4, 1, 6, 0], [3, 320, 4, 1, 6, 0]],
    [[1, 1280, 0, 1, 0, -1]],
]
_LAYERS_E = [
    [[3, 32, 0, 2, 0, -1]],
    [[3, 24, 0, 1, 3, 1]],
    [[3, 32, 0, 2, 8, 1], [3, 32, 0, 1, 8, 1]],
    [[3, 48, 0, 2, 8, 1], [3, 48, 0, 1, 8, 1], [3, 48, 0, 1, 8, 1],
     [3, 48, 0, 1, 8, 1]],
    [[5, 96, 0, 2, 8, 0], [5, 96, 0, 1, 8, 0], [5, 96, 0, 1, 8, 0],
     [5, 96, 0, 1, 8, 0], [5, 96, 0, 1, 8, 0], [5, 144, 0, 1, 8, 0],
     [5, 144, 0, 1, 8, 0], [5, 144, 0, 1, 8, 0], [5, 144, 0, 1, 8, 0]],
    [[5, 192, 0, 2, 8, 0], [5, 192, 0, 1, 8, 0]],
    [[1, 1280, 0, 1, 0, -1]],
]
# width factor, depth factor (reference :354-368)
ARCHS = {"b0": (1.0, 1.0), "b1": (1.0, 1.1), "b2": (1.1, 1.2),
         "b3": (1.2, 1.4), "b4": (1.4, 1.8), "b5": (1.6, 2.2),
         "b6": (1.8, 2.6), "b7": (2.0, 3.1), "b8": (2.2, 3.6),
         "es": (1.0, 1.0), "em": (1.0, 1.1), "el": (1.2, 1.4)}


def _make_divisible(v: float, divisor: int = 8) -> int:
    new = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new < 0.9 * v:
        new += divisor
    return new


def scaled_layers(arch: str):
    """Width/depth-scaled per-stage block table for `arch`."""
    wf, df = ARCHS[arch]
    table = _LAYERS_E if arch[0] == "e" else _LAYERS_B
    out = []
    for si, stage in enumerate(table):
        rows = [list(r) for r in stage]
        for r in rows:
            r[1] = _make_divisible(r[1] * wf)
        if 0 < si < len(table) - 1:
            n = int(math.ceil(len(rows) * df))
            rows = rows + [list(rows[-1]) for _ in range(n - len(rows))]
            for r in rows[len(stage):]:
                r[3] = 1  # repeated blocks keep stride 1
        out.append(rows)
    return out


def _swish(x):
    return x * nn.sigmoid(x)


class _SE(nn.Module):
    """Squeeze-excitation with hidden = channels // ratio (mmcls SELayer)."""
    ratio: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        hidden = max(1, int(C / self.ratio))
        s = x.mean(axis=(-3, -2), keepdims=True)
        s = Conv2d(hidden, (1, 1), (1, 1), 0, dtype=self.dtype,
                   name="fc1")(s)
        s = _swish(s)
        s = Conv2d(C, (1, 1), (1, 1), 0, dtype=self.dtype, name="fc2")(s)
        return x * nn.sigmoid(s)


class _ConvBNSwish(nn.Module):
    features: int
    kernel: int
    stride: int
    groups: int = 1
    act: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        k = self.kernel
        x = nn.Conv(self.features, (k, k), (self.stride, self.stride),
                    padding=[(k // 2, k // 2)] * 2, use_bias=False,
                    feature_group_count=self.groups, dtype=self.dtype,
                    name="conv")(x)
        x = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      name="bn")(x)
        return _swish(x) if self.act else x


class InvertedResidual(nn.Module):
    """MBConv: 1x1 expand -> depthwise k -> SE -> 1x1 project (+res)."""
    features: int
    kernel: int
    stride: int
    expand: int
    se_ratio: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        Cin = x.shape[-1]
        mid = int(Cin * self.expand)
        y = x
        if self.expand != 1:
            y = _ConvBNSwish(mid, 1, 1, dtype=self.dtype,
                             name="expand")(y, train)
        y = _ConvBNSwish(mid, self.kernel, self.stride, groups=mid,
                         dtype=self.dtype, name="dw")(y, train)
        if self.se_ratio > 0:
            y = _SE(self.expand * self.se_ratio, dtype=self.dtype,
                    name="se")(y)
        y = _ConvBNSwish(self.features, 1, 1, act=False, dtype=self.dtype,
                         name="project")(y, train)
        if self.stride == 1 and Cin == self.features:
            y = y + x
        return y


class EdgeResidual(nn.Module):
    """Fused-MBConv: kxk expand conv -> 1x1 project (+res)."""
    features: int
    kernel: int
    stride: int
    expand: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        Cin = x.shape[-1]
        mid = int(Cin * self.expand)
        y = _ConvBNSwish(mid, self.kernel, self.stride, dtype=self.dtype,
                         name="expand")(x, train)
        y = _ConvBNSwish(self.features, 1, 1, act=False, dtype=self.dtype,
                         name="project")(y, train)
        if self.stride == 1 and Cin == self.features:
            y = y + x
        return y


class EfficientNet(nn.Module):
    """Multi-scale EfficientNet backbone, NHWC in/out."""
    arch: str = "b0"
    out_indices: Sequence[int] = (2, 3, 4, 5)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for si, stage in enumerate(scaled_layers(self.arch)):
            if si > max(self.out_indices):
                break
            for bi, (k, oc, se, s, e, bt) in enumerate(stage):
                name = f"stage{si}_block{bi}"
                if bt == -1:
                    x = _ConvBNSwish(oc, k, s, dtype=self.dtype,
                                     name=name)(x, train)
                elif bt == 1:
                    x = EdgeResidual(oc, k, s, e, dtype=self.dtype,
                                     name=name)(x, train)
                else:
                    x = InvertedResidual(oc, k, s, e, se, dtype=self.dtype,
                                         name=name)(x, train)
            if si in self.out_indices:
                outs.append(x)
        return tuple(outs)
