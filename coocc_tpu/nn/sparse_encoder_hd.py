"""SparseEncoderHD: SECOND-style sparse encoder keeping the depth dim.

Capability parity with the reference (coocc/voxel_encoder/sparse_encoder_hd.py
:11-209) at the coocc_lidar.py:104-113 configuration: block_type='basicblock',
encoder_channels ((16,16,32),(32,32,64),(64,64,128),(128,128)),
encoder_strides (2,2,2,1), norm BN1d(eps 1e-3, momentum 0.01), keep_depth.
Each stage = SparseBasicBlocks then (except the last) a strided SparseConv3d
whose zyx paddings follow encoder_paddings; conv_out is a 1x1x1 SparseConv3d
to output_channels.

Grid evolution in xyz order for sparse_shape_xyz (800, 800, 65):
(800,800,65) -> (400,400,33) -> (200,200,17) -> (100,100,8), densified to
[B, X, Y, Z, C].
"""
from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.sparse_conv import (
    SparseTensor, build_strided_rulebook, conv_output_shape, downsample_sites,
    to_dense,
)
from .sparse_enc import (
    _MaskedBN, _SparseBasicBlock, _SubMConv, _kaiming, batched_conv,
    batched_subm_rulebook,
)


class _GeneralStridedBlock(nn.Module):
    """Strided SparseConv3d + BN + ReLU with per-axis kernel/stride/padding."""
    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (2, 2, 2)
    padding: Tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, sp: SparseTensor, grid, capacity, train: bool = False):
        out_grid = conv_output_shape(grid, self.kernel, self.stride,
                                     self.padding)
        k3 = self.kernel[0] * self.kernel[1] * self.kernel[2]
        out_ids, out_mask = jax.vmap(partial(
            downsample_sites, grid_size=grid, out_grid_size=out_grid,
            out_capacity=capacity, kernel=self.kernel, stride=self.stride,
            padding=self.padding))(sp)
        rb = jax.vmap(partial(
            build_strided_rulebook, grid_size=grid, out_grid_size=out_grid,
            kernel=self.kernel, stride=self.stride,
            padding=self.padding))(sp, out_ids, out_mask)
        w = self.param("weight", _kaiming,
                       (k3, sp.features.shape[-1], self.features))
        f = batched_conv(sp.features, sp.mask, rb, w, out_mask)
        f = _MaskedBN(1e-3, 0.01, name="norm")(f, out_mask, train)
        f = nn.relu(f) * out_mask[..., None]
        return SparseTensor(out_ids, f, out_mask), out_grid


class SparseEncoderHD(nn.Module):
    in_channels: int = 4
    base_channels: int = 16
    output_channels: int = 128
    sparse_shape_xyz: Tuple[int, int, int] = (800, 800, 65)
    encoder_channels: Tuple[Tuple[int, ...], ...] = (
        (16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128))
    # strided-conv xyz paddings per stage (reference zyx (1, 1, [0,1,1], -))
    strided_paddings: Tuple[Tuple[int, int, int], ...] = (
        (1, 1, 1), (1, 1, 1), (1, 1, 0))
    encoder_strides: Tuple[int, ...] = (2, 2, 2, 1)
    capacity: int = 90000

    @nn.compact
    def __call__(self, sp: SparseTensor, train: bool = False):
        grid = self.sparse_shape_xyz

        # conv_input: SubM k3 p1 + BN + ReLU ('conv_module' stem)
        rb = batched_subm_rulebook(sp, grid)
        x = _SubMConv(self.base_channels, name="conv_input")(sp, rb)
        f = _MaskedBN(1e-3, 0.01, name="norm_input")(x.features, x.mask, train)
        f = nn.relu(f) * x.mask[..., None]
        x = SparseTensor(x.ids, f, x.mask)

        for i, blocks in enumerate(self.encoder_channels):
            last_stage = i == len(self.encoder_channels) - 1
            for j, oc in enumerate(blocks):
                is_strided = (j == len(blocks) - 1) and not last_stage
                if is_strided:
                    x, grid = _GeneralStridedBlock(
                        oc, stride=(self.encoder_strides[i],) * 3,
                        padding=self.strided_paddings[i],
                        name=f"stage{i}_down",
                    )(x, grid, self.capacity, train)
                    rb = batched_subm_rulebook(x, grid)
                else:
                    x = _SparseBasicBlock(oc, bn_eps=1e-3, bn_momentum=0.01,
                                          name=f"stage{i}_block{j}")(
                        x, rb, train)

        # conv_out: SparseConv3d 1x1x1 s1 (same sites) + BN + ReLU
        w = self.param("conv_out_weight", _kaiming,
                       (1, x.features.shape[-1], self.output_channels))
        f = batched_conv(x.features, x.mask,
                         jnp.arange(x.ids.shape[-1])[None, :, None].repeat(
                             x.ids.shape[0], axis=0),
                         w, x.mask)
        f = _MaskedBN(1e-3, 0.01, name="norm_out")(f, x.mask, train)
        f = nn.relu(f) * x.mask[..., None]
        x = SparseTensor(x.ids, f, x.mask)
        return jax.vmap(partial(to_dense, grid_size=grid))(x)
