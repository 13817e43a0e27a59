"""SECONDFPN image neck: per-stage deblocks (deconv/conv + BN + ReLU), concat.

Capability parity with mmdet3d SECONDFPN as configured by the reference
(reference: mmdetection3d/mmdet3d/models/necks/second_fpn.py:12-94; config
coocc_multi_r50_256x704.py:107-111 — strides (0.25, 0.5, 1, 2) resampling the
four ResNet stages to stride 16, concat to 512 channels).

deblock rules (second_fpn.py:45-62): stride > 1 -> deconv(k=s, s);
stride == 1 (and not use_conv_for_no_stride) -> deconv(k=1, s=1);
stride < 1 -> conv(k=round(1/s), s=round(1/s)).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNorm, Conv2d, ConvTranspose3d


class SECONDFPN(nn.Module):
    in_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    out_channels: Tuple[int, ...] = (128, 128, 128, 128)
    upsample_strides: Tuple[float, ...] = (0.25, 0.5, 1.0, 2.0)
    use_conv_for_no_stride: bool = False
    bn_eps: float = 1e-3
    bn_momentum: float = 0.01
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        assert len(feats) == len(self.in_channels)
        ups = []
        for i, (x, oc) in enumerate(zip(feats, self.out_channels)):
            s = self.upsample_strides[i]
            if s > 1 or (s == 1 and not self.use_conv_for_no_stride):
                k = int(round(s))
                y = nn.ConvTranspose(
                    features=oc, kernel_size=(k, k), strides=(k, k),
                    padding="VALID", use_bias=False, transpose_kernel=True,
                    dtype=self.dtype, name=f"deblock{i}_deconv",
                )(x)
            else:
                k = int(round(1.0 / s))
                y = Conv2d(oc, (k, k), (k, k), 0, use_bias=False,
                           dtype=self.dtype, name=f"deblock{i}_conv")(x)
            y = BatchNorm(eps=self.bn_eps, momentum=self.bn_momentum,
                          use_running_average=not train, dtype=self.dtype,
                          name=f"deblock{i}_bn")(y)
            y = nn.relu(y)
            ups.append(y)
        return jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
