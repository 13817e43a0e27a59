"""Sparse LiDAR middle encoders on the gather-GEMM-scatter engine (batched).

Capability parity with SparseLiDAREnc8x / SparseLiDAREnc4x
(reference: coocc/voxel_encoder/sparse_lidar_enc.py:67-178, built on
spconv 2.x) re-designed for TPU: fixed-capacity SparseTensors with a leading
batch axis, rulebooks shared across all SubM layers of a level (the
indice_key pattern), one MXU GEMM per conv, vmap over the batch for the
id-space ops. Norm semantics preserved: GroupNorm acts per active voxel,
BatchNorm1d over all active voxels of the batch (masked).

Grid evolution for Enc8x (800,800,64) input: /2 -> /4 -> /8 = (100,100,8),
densified to channels-last [B, X, Y, Z, C].
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.sparse_conv import (
    SparseTensor, apply_conv, build_strided_rulebook, build_subm_rulebook,
    downsample_sites, to_dense,
)
from .layers import GroupNorm, MaskedBatchNorm


def _kaiming(key, shape, dtype=jnp.float32):
    fan_in = shape[0] * shape[1]  # [K3, Cin, Cout]
    std = (2.0 / fan_in) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


def batched_subm_rulebook(sp: SparseTensor, grid):
    return jax.vmap(partial(build_subm_rulebook, grid_size=grid))(sp)


def batched_downsample(sp: SparseTensor, grid, out_grid, capacity):
    out_ids, out_mask = jax.vmap(
        partial(downsample_sites, grid_size=grid, out_grid_size=out_grid,
                out_capacity=capacity))(sp)
    rb = jax.vmap(
        partial(build_strided_rulebook, grid_size=grid,
                out_grid_size=out_grid))(sp, out_ids, out_mask)
    return out_ids, out_mask, rb


def batched_conv(features, mask, rulebook, weight, out_mask):
    return jax.vmap(
        lambda f, m, rb, om: apply_conv(f, m, rb, weight, om)
    )(features, mask, rulebook, out_mask)


class _SubMConv(nn.Module):
    features: int

    @nn.compact
    def __call__(self, sp: SparseTensor, rulebook):
        w = self.param("weight", _kaiming,
                       (27, sp.features.shape[-1], self.features))
        f = batched_conv(sp.features, sp.mask, rulebook, w, sp.mask)
        return SparseTensor(sp.ids, f.astype(sp.features.dtype), sp.mask)


class _MaskedBN(nn.Module):
    """BatchNorm1d over all active voxels of the batch."""
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, feats, mask, train):
        B, A, C = feats.shape
        f = MaskedBatchNorm(eps=self.eps, momentum=self.momentum,
                            use_running_average=not train, name="bn")(
            feats.reshape(B * A, C), mask.reshape(B * A))
        return f.reshape(B, A, C)


class _SparseBasicBlock(nn.Module):
    """SubM->BN->ReLU->SubM->BN + residual, ReLU (sparse_lidar_enc.py:41-63)."""
    features: int
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, sp: SparseTensor, rulebook, train: bool = False):
        identity = sp.features
        x = _SubMConv(self.features, name="conv1")(sp, rulebook)
        f = _MaskedBN(self.bn_eps, self.bn_momentum,
                      name="norm1")(x.features, x.mask, train)
        f = nn.relu(f) * x.mask[..., None]
        x = SparseTensor(sp.ids, f, sp.mask)
        x = _SubMConv(self.features, name="conv2")(x, rulebook)
        f = _MaskedBN(self.bn_eps, self.bn_momentum,
                      name="norm2")(x.features, x.mask, train)
        f = nn.relu(f + identity) * sp.mask[..., None]
        return SparseTensor(sp.ids, f, sp.mask)


class _StridedBlock(nn.Module):
    """spconv stride-2 conv + BN + ReLU (post_act_block, conv_type='spconv')."""
    features: int

    @nn.compact
    def __call__(self, sp: SparseTensor, grid, out_grid, capacity,
                 train: bool = False):
        out_ids, out_mask, rb = batched_downsample(sp, grid, out_grid, capacity)
        w = self.param("weight", _kaiming,
                       (27, sp.features.shape[-1], self.features))
        f = batched_conv(sp.features, sp.mask, rb, w, out_mask)
        f = _MaskedBN(name="norm")(f, out_mask, train)
        f = nn.relu(f) * out_mask[..., None]
        return SparseTensor(out_ids, f, out_mask)


class _GNReLU(nn.Module):
    groups: int

    @nn.compact
    def __call__(self, sp: SparseTensor):
        # torch GroupNorm on [N_active, C] normalizes each voxel over its own
        # channel groups; flatten so flax doesn't reduce over the row axis
        B, A, C = sp.features.shape
        f = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         name="gn")(sp.features.reshape(B * A, C))
        f = f.reshape(B, A, C)
        f = nn.relu(f) * sp.mask[..., None]
        return SparseTensor(sp.ids, f, sp.mask)


class SparseLiDAREnc8x(nn.Module):
    """3 stride-2 stages: base -> 2b -> 4b -> 8b channels; /8 spatial.

    Input: batched SparseTensor over sparse_shape_xyz.
    Output: dense [B, X/8, Y/8, Z/8, out_channel].
    """
    input_channel: int = 4
    base_channel: int = 16
    out_channel: int = 128
    sparse_shape_xyz: Tuple[int, int, int] = (800, 800, 64)
    capacity: int = 90000

    @nn.compact
    def __call__(self, sp: SparseTensor, train: bool = False):
        b = self.base_channel
        g0 = self.sparse_shape_xyz
        g1 = tuple(s // 2 for s in g0)
        g2 = tuple(s // 2 for s in g1)
        g3 = tuple(s // 2 for s in g2)

        rb0 = batched_subm_rulebook(sp, g0)
        x = _SubMConv(b, name="conv_input")(sp, rb0)
        x = _GNReLU(16, name="gn_input")(x)

        x = _StridedBlock(b * 2, name="down1")(x, g0, g1, self.capacity, train)
        rb1 = batched_subm_rulebook(x, g1)
        x = _SparseBasicBlock(b * 2, name="res1_0")(x, rb1, train)
        x = _SparseBasicBlock(b * 2, name="res1_1")(x, rb1, train)

        x = _StridedBlock(b * 4, name="down2")(x, g1, g2, self.capacity, train)
        rb2 = batched_subm_rulebook(x, g2)
        x = _SparseBasicBlock(b * 4, name="res2_0")(x, rb2, train)
        x = _SparseBasicBlock(b * 4, name="res2_1")(x, rb2, train)

        x = _StridedBlock(b * 8, name="down3")(x, g2, g3, self.capacity, train)
        rb3 = batched_subm_rulebook(x, g3)
        x = _SparseBasicBlock(b * 8, name="res3_0")(x, rb3, train)
        x = _SparseBasicBlock(b * 8, name="res3_1")(x, rb3, train)

        x = _SubMConv(self.out_channel, name="conv_out")(x, rb3)
        x = _GNReLU(16, name="gn_out")(x)

        return jax.vmap(partial(to_dense, grid_size=g3))(x)


class SparseLiDAREnc4x(nn.Module):
    """SubM stem + 2 res blocks, then 2 stride-2 stages (/4 spatial).

    Reference: sparse_lidar_enc.py:67-119.
    """
    input_channel: int = 4
    base_channel: int = 16
    out_channel: int = 128
    sparse_shape_xyz: Tuple[int, int, int] = (800, 800, 64)
    capacity: int = 90000

    @nn.compact
    def __call__(self, sp: SparseTensor, train: bool = False):
        b = self.base_channel
        g0 = self.sparse_shape_xyz
        g1 = tuple(s // 2 for s in g0)
        g2 = tuple(s // 2 for s in g1)

        rb0 = batched_subm_rulebook(sp, g0)
        x = _SubMConv(b, name="conv_input")(sp, rb0)
        x = _GNReLU(16, name="gn_input")(x)
        x = _SparseBasicBlock(b, name="res1_0")(x, rb0, train)
        x = _SparseBasicBlock(b, name="res1_1")(x, rb0, train)

        x = _StridedBlock(b * 2, name="down2")(x, g0, g1, self.capacity, train)
        rb1 = batched_subm_rulebook(x, g1)
        x = _SparseBasicBlock(b * 2, name="res2_0")(x, rb1, train)
        x = _SparseBasicBlock(b * 2, name="res2_1")(x, rb1, train)

        x = _StridedBlock(b * 4, name="down3")(x, g1, g2, self.capacity, train)
        rb2 = batched_subm_rulebook(x, g2)
        x = _SparseBasicBlock(b * 4, name="res3_0")(x, rb2, train)
        x = _SparseBasicBlock(b * 4, name="res3_1")(x, rb2, train)

        x = _SubMConv(self.out_channel, name="conv_out")(x, rb2)
        x = _GNReLU(16, name="gn_out")(x)
        return jax.vmap(partial(to_dense, grid_size=g2))(x)
