"""Dense-conv3d implementation of the sparse LiDAR encoders (TPU fast path).

Mathematically identical to the gather-GEMM path (nn/sparse_enc.py) — and to
spconv's SubM/strided semantics — but computed as masked DENSE convolutions:

  * inactive cells hold zeros, so a dense conv produces exactly the sparse
    conv's sums at every site;
  * SubM layers multiply outputs by the level's activity mask (outputs only
    at active sites);
  * strided SparseConv3d layers dilate the activity: the new mask is a
    max-pool (k/s/p of the conv) of the old one;
  * norms see only active cells (masked statistics / per-cell group norm).

Why dense: on TPU, the sparse path's random row gathers cost
~operand_size x (queries/8K) in HBM traffic (measured ~64 GB per rulebook
build and ~11 GB per conv at the r50 config's shapes); dense conv3d streams
each tensor once and runs on the MXU. At these occupancies (2-40%) dense
wins despite the extra FLOPs. Parameters are IDENTICAL in name and shape to
the gather path ([K^3, Cin, Cout], same norms), so the two implementations
are interchangeable per config flag and cross-validated in tests.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.sparse_conv import SparseTensor, to_dense
from .layers import MaskedBatchNorm
from .sparse_enc import _kaiming


def _dense_conv3d(x, weight, stride=(1, 1, 1), padding=(1, 1, 1), k=3):
    """x: [B, X, Y, Z, Cin]; weight: [K^3, Cin, Cout] (kx-major taps)."""
    k3, Cin, Cout = weight.shape
    w = weight.reshape(k, k, k, Cin, Cout).astype(x.dtype)
    from ..ops.conv_acc import conv_f32acc
    return conv_f32acc(
        x, w, tuple(stride), tuple((p, p) for p in padding), 1,
        ("NXYZC", "XYZIO", "NXYZC")).astype(x.dtype)


def _dilate_mask(mask, kernel=(3, 3, 3), stride=(2, 2, 2), padding=(1, 1, 1)):
    """Strided sparse conv's output-site mask: any active input in field.

    Separable boolean max over shifted slices (reduce_window on a full-res
    f32 mask provokes pathological tiled layouts — a 20 GB allocation for a
    [2,800,800,64] convert was observed)."""
    out = mask
    for ax, (k, p) in enumerate(zip(kernel, padding)):
        axis = 1 + ax
        r = k // 2
        padded = jnp.pad(out, [(0, 0) if a != axis else (p, p)
                               for a in range(out.ndim)])
        n = mask.shape[axis]
        acc = None
        for off in range(k):
            # window tap at offset off reads padded[off : off + n_out_prestride]
            sl = jax.lax.slice_in_dim(padded, off, off + n + 2 * p - (k - 1),
                                      axis=axis)
            acc = sl if acc is None else (acc | sl)
        out = acc
    s = (1,) + tuple(stride)
    return out[tuple(slice(None, None, st) for st in s)]


class PerRowGroupNorm(nn.Module):
    """torch GroupNorm over rows: each cell normalized over its own channel
    groups (params named scale/bias like flax GroupNorm for converter
    compatibility)."""
    groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        xs = x.reshape(x.shape[:-1] + (self.groups, C // self.groups))
        mu = xs.mean(axis=-1, keepdims=True)
        var = xs.var(axis=-1, keepdims=True)
        y = (xs - mu) / jnp.sqrt(var + self.eps)
        return y.reshape(x.shape) * scale + bias


class _PerCellGN(nn.Module):
    groups: int

    @nn.compact
    def __call__(self, x, mask):
        y = PerRowGroupNorm(self.groups, name="gn")(x)
        return y * mask[..., None]


class _DenseMaskedBN(nn.Module):
    """BatchNorm over active cells of a dense [B, X, Y, Z, C] grid."""
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, mask, train):
        B = x.shape[0]
        C = x.shape[-1]
        f = MaskedBatchNorm(eps=self.eps, momentum=self.momentum,
                            use_running_average=not train, name="bn")(
            x.reshape(-1, C), mask.reshape(-1))
        return f.reshape(x.shape)


class _DenseSubM(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, mask):
        w = self.param("weight", _kaiming, (27, x.shape[-1], self.features))
        return _dense_conv3d(x, w, (1, 1, 1), (1, 1, 1)) * mask[..., None]


class _DenseBasicBlock(nn.Module):
    """SubM->BN->ReLU->SubM->BN + residual, ReLU (masked)."""
    features: int
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, x, mask, train):
        identity = x
        y = _DenseSubM(self.features, name="conv1")(x, mask)
        y = _DenseMaskedBN(self.bn_eps, self.bn_momentum,
                           name="norm1")(y, mask, train)
        y = nn.relu(y) * mask[..., None]
        y = _DenseSubM(self.features, name="conv2")(y, mask)
        y = _DenseMaskedBN(self.bn_eps, self.bn_momentum,
                           name="norm2")(y, mask, train)
        return nn.relu(y + identity) * mask[..., None]


class _DenseStrided(nn.Module):
    features: int
    stride: Tuple[int, int, int] = (2, 2, 2)
    padding: Tuple[int, int, int] = (1, 1, 1)
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, x, mask, train):
        w = self.param("weight", _kaiming, (27, x.shape[-1], self.features))
        y = _dense_conv3d(x, w, self.stride, self.padding)
        new_mask = _dilate_mask(mask, (3, 3, 3), self.stride, self.padding)
        y = y * new_mask[..., None]
        y = _DenseMaskedBN(self.bn_eps, self.bn_momentum,
                           name="norm")(y, new_mask, train)
        y = nn.relu(y) * new_mask[..., None]
        return y, new_mask


class _WeightHolder(nn.Module):
    """Bare [K^3, Cin, Cout] conv weight under this module's scope (so the
    dense path shares parameter paths with the gather path's _SubMConv)."""
    shape: Tuple[int, int, int]

    @nn.compact
    def __call__(self):
        return self.param("weight", _kaiming, self.shape)


class _StridedParams(nn.Module):
    """down-level params matching the gather path's _StridedBlock scope:
    <name>/weight + <name>/norm/bn/*; op-dispatched so the weight can be
    used inside the chunk loop and the norm applied after reassembly."""
    cin: int
    cout: int

    @nn.compact
    def __call__(self, op, x=None, mask=None, train=False):
        w = self.param("weight", _kaiming, (27, self.cin, self.cout))
        if op == "weight":
            return w
        return _DenseMaskedBN(name="norm")(x, mask, train)


def _dense_mask(sp: SparseTensor, grid):
    n_cells = grid[0] * grid[1] * grid[2]

    def one_mask(s):
        safe = jnp.where(s.mask, s.ids, n_cells)  # invalid -> dropped
        return jnp.zeros(n_cells, bool).at[safe].set(
            True, mode="drop").reshape(grid)

    return jax.vmap(one_mask)(sp)


class DenseLiDAREnc8x(nn.Module):
    """Dense twin of SparseLiDAREnc8x — same params, TPU-fast compute.

    Level 0 collapses analytically (the degenerate stem GroupNorm reduces
    down1 to a 27-tap mask matmul — see the inline comment); levels 1-3 run
    as masked dense conv3d on the MXU.

    Input: batched SparseTensor (from ops.voxelize). Output:
    [B, X/8, Y/8, Z/8, out_channel] dense features.
    """
    input_channel: int = 4
    base_channel: int = 16
    out_channel: int = 128
    sparse_shape_xyz: Tuple[int, int, int] = (800, 800, 64)
    capacity: int = 90000
    compute_dtype: Any = jnp.float32
    stop_after: Optional[str] = None  # profiling: stem|res1|res2|res3

    @nn.compact
    def __call__(self, sp, train: bool = False):
        b = self.base_channel
        g0 = self.sparse_shape_xyz
        g1 = tuple(s // 2 for s in g0)

        # NOTE: the voxel FEATURES are never read — the degenerate stem GN
        # (see below) erases them in the reference architecture too; only
        # the occupancy mask matters. Accepts either a SparseTensor or a
        # dense [B, X, Y, Z] bool occupancy (ops.voxelize.voxelize_mask's
        # sort-free output).
        if isinstance(sp, SparseTensor):
            mask0 = _dense_mask(sp, g0)
        else:
            mask0 = sp

        # --- level 0 collapses analytically. The stem is SubM conv ->
        # GroupNorm(16, base=16) -> ReLU; with one channel per group the GN
        # normalizes every value to zero, so the stem output is EXACTLY
        # relu(gn_bias) at active cells — in the reference's torch graph as
        # well (GroupNorm(16, 16) over [N_active, C] rows,
        # sparse_lidar_enc.py:139-142). The stem conv is annihilated (zero
        # gradient in both frameworks), and down1 over a channel-constant
        # masked field reduces to a 27-tap matmul of strided MASK planes
        # with w_eff[tap, co] = sum_ci W_down1[tap, ci, co] * relu(bias)_ci.
        assert b == 16, "level-0 collapse assumes GroupNorm(16, base=16)"
        w_stem = _WeightHolder((27, self.input_channel, b),
                               name="conv_input")()  # kept for ckpt parity
        del w_stem
        gn_mod = _PerCellGN(16, name="gn_input")
        stem_const = nn.relu(gn_mod(jnp.zeros((1, b), self.compute_dtype),
                                    jnp.ones((1,), bool))[0])  # = relu(bias)
        down1 = _StridedParams(b, b * 2, name="down1")
        wd = down1("weight")  # [27, b, 2b]
        w_eff = jnp.einsum("kio,i->ko", wd.astype(jnp.float32),
                           stem_const.astype(jnp.float32))  # [27, 2b]

        # strided mask planes: plane_k[o] = mask0[2*o + tap_k - 1]
        mpad = jnp.pad(mask0, ((0, 0), (1, 1), (1, 1), (1, 1)))
        g1_shape = g1
        planes = []
        for kx in range(3):
            for ky in range(3):
                for kz in range(3):
                    planes.append(jax.lax.slice(
                        mpad,
                        (0, kx, ky, kz),
                        (mpad.shape[0], kx + 2 * g1_shape[0] - 1,
                         ky + 2 * g1_shape[1] - 1, kz + 2 * g1_shape[2] - 1),
                        (1, 2, 2, 2)))
        planes = jnp.stack(planes, axis=-1).astype(self.compute_dtype)
        # [B, X/2, Y/2, Z/2, 27] @ [27, 2b]
        d = jnp.einsum("bxyzk,ko->bxyzo", planes,
                       w_eff.astype(self.compute_dtype),
                       preferred_element_type=jnp.float32)
        d = d.astype(self.compute_dtype)

        mask = _dilate_mask(mask0, (3, 3, 3), (2, 2, 2), (1, 1, 1))
        d = d * mask[..., None]
        d = down1("norm", d, mask, train)
        d = nn.relu(d) * mask[..., None]
        if self.stop_after == "stem":
            return d

        d = _DenseBasicBlock(b * 2, name="res1_0")(d, mask, train)
        d = _DenseBasicBlock(b * 2, name="res1_1")(d, mask, train)
        if self.stop_after == "res1":
            return d
        for lvl, ch in ((2, b * 4), (3, b * 8)):
            d, mask = _DenseStrided(ch, name=f"down{lvl}")(d, mask, train)
            d = _DenseBasicBlock(ch, name=f"res{lvl}_0")(d, mask, train)
            d = _DenseBasicBlock(ch, name=f"res{lvl}_1")(d, mask, train)
            if self.stop_after == f"res{lvl}":
                return d

        d = _DenseSubM(self.out_channel, name="conv_out")(d, mask)
        d = _PerCellGN(16, name="gn_out")(d, mask)
        d = nn.relu(d) * mask[..., None]
        return d.astype(jnp.float32)
