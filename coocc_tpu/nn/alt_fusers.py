"""Alternative fusion layers (registered-but-unused capability envelope).

Capability parity with the reference's alternative fusers
(coocc/fuser/addfuse.py:11-54 AddFuser — gated additive fusion;
coocc/fuser/attnfuse.py:13-142 AttnFuser — cross-attention fusion, realized
here with standard dot-product cross-attention over voxel tokens instead of
CUDA MSDeformAttn; the deformable variant's role is local cross-modal
attention, which windowed dot-product attention covers on TPU).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNorm, Conv3d


class AddFuser(nn.Module):
    """Gated additive fusion: sigmoid gates weigh per-modality contributions."""
    in_channels: int = 128
    out_channels: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, img_feats, pts_feats, train: bool = False):
        x = jnp.concatenate([img_feats, pts_feats], axis=-1)
        gate = Conv3d(2, (3, 3, 3), (1, 1, 1), 1, use_bias=True,
                      dtype=self.dtype, name="gate_conv")(x)
        gate = nn.sigmoid(gate)
        fused = img_feats * gate[..., 0:1] + pts_feats * gate[..., 1:2]
        fused = Conv3d(self.out_channels, (3, 3, 3), (1, 1, 1), 1,
                       use_bias=False, dtype=self.dtype, name="out_conv")(fused)
        fused = BatchNorm(use_running_average=not train, dtype=self.dtype,
                          name="out_bn")(fused)
        return nn.relu(fused)


class AttnFuser(nn.Module):
    """Cross-attention fusion over z-column tokens.

    Each (x, y) column's voxels attend across modalities: queries from the
    LiDAR features, keys/values from the camera features (and vice versa),
    with a residual merge. Local (per-column) attention keeps the cost
    linear in grid size — the TPU-native counterpart of the reference's
    deformable cross-attention modules.
    """
    in_channels: int = 128
    out_channels: int = 128
    num_heads: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, img_feats, pts_feats, train: bool = False):
        B, X, Y, Z, C = img_feats.shape
        tok_img = img_feats.reshape(B * X * Y, Z, C)
        tok_pts = pts_feats.reshape(B * X * Y, Z, C)

        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=C, dtype=self.dtype,
            name="cross_attn")
        pts_enh = tok_pts + attn(tok_pts, tok_img)
        img_enh = tok_img + attn(tok_img, tok_pts)

        fused = jnp.concatenate([img_enh, pts_enh], axis=-1)
        fused = fused.reshape(B, X, Y, Z, 2 * C)
        fused = Conv3d(self.out_channels, (3, 3, 3), (1, 1, 1), 1,
                       use_bias=False, dtype=self.dtype, name="out_conv")(fused)
        fused = BatchNorm(use_running_average=not train, dtype=self.dtype,
                          name="out_bn")(fused)
        return nn.relu(fused)
