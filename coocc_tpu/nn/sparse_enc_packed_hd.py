"""Z-packed dense twin of SparseEncoderHD (the coocc_lidar TPU fast path).

SparseEncoderHD (nn/sparse_encoder_hd.py) runs the reference's
gather-GEMM formulation: per-layer rulebooks (binary-search neighbour
lookup over the 41M-cell grid) + row gathers + GEMM at capacity 90k.
Round-5 on-chip: the whole coocc_lidar eval forward lands at 0.466 fps
with the pts branch dominating — gathers and searchsorted chains, not
MXU work. This module computes the SAME math densely in the z-packed
conv2d layout of sparse_enc_packed.py (proven 86-136 TFLOP/s on v5e):
voxel features are scattered once into a dense packed grid and every
SubM / strided sparse conv becomes one well-tiled conv2d with
block-structured weights. Active-site semantics are preserved exactly:
inactive dense cells hold zeros (what a real SubM gather would read) and
every layer's output is masked to its active set.

Parameter/variable tree is IDENTICAL to SparseEncoderHD (same scope
names, same [27, Ci, Co] weights, same MaskedBatchNorm children), so the
torch converter and checkpoints are untouched and the twin can be
applied with variables initialized by the gather module
(tests/test_packed_hd.py pins equivalence).

Packing (sparse_shape z0 = 65, channels 16/32/64/128):
  p per level = p0 / 2^level with p0 = 8 (lanes = p*C = 128 at every
  level); pack count bz = ceil(z0 / p0) = 9 stays CONSTANT through the
  encoder because each stride-2-z step halves p in lockstep with z —
  output pack b reads only input pack b (+ one carry lane group), which
  is what lets the strided conv stay a single conv2d
  (_strided_packed_weight_z; generalizes sparse_enc_packed's builder to
  the z-padding-0 third stage, reference encoder_paddings
  sparse_encoder_hd.py config [(1,1,1),(1,1,1),(1,1,0)]).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sparse_conv import SparseTensor, conv_output_shape, delinearize
from .sparse_enc import _kaiming
from .sparse_enc_packed import (
    _conv2d_pb, _PackedBN, _PackedSubM, _shift_ext,
)


class _HDBasicBlock(nn.Module):
    """Scope twin of _SparseBasicBlock at HD's BN config (eps 1e-3,
    momentum 0.01 — sparse_enc_packed._PackedBasicBlock hardcodes the
    Enc8x defaults)."""
    features: int

    @nn.compact
    def __call__(self, x_pb, maskf_pc, train: bool):
        C = self.features
        identity = x_pb
        y = _PackedSubM(C, name="conv1")(x_pb, maskf_pc, C)
        y = _PackedBN(C, eps=1e-3, momentum=0.01, name="norm1")(
            y, maskf_pc, train)
        y = nn.relu(y)
        y = _PackedSubM(C, name="conv2")(y, maskf_pc, C)
        y = _PackedBN(C, eps=1e-3, momentum=0.01, name="norm2")(
            y, maskf_pc, train)
        # no tail mask multiply: _PackedBN already returns masked features
        # and identity is masked on entry, so relu(sum) is masked — one
        # fewer full-tensor HBM pass per block (1.3 GB at HD stage 0)
        return nn.relu(y + identity)


def _strided_packed_weight_z(w27: jnp.ndarray, p_in: int, p_out: int,
                             padz: int) -> jnp.ndarray:
    """[27, Ci, Co] -> [3, 3, (p_in+2)*Ci, p_out*Co] stride-2-z weight.

    Generalizes sparse_enc_packed._strided_packed_weight (the padz=1
    case) to padz=0 (SparseEncoderHD's third downsample): output slot so
    reads input slot u = 2*so + dz - padz; with p_in == 2*p_out, u stays
    in [-1, p_in], i.e. within the pack plus one carry lane group on
    either side (dn carry for padz=1, up carry for padz=0).
    """
    k3, Ci, Co = w27.shape
    assert k3 == 27 and p_in == 2 * p_out
    w3 = w27.reshape(3, 3, 3, Ci, Co)
    blocks = []
    for so in range(p_out):
        col = [jnp.zeros((3, 3, Ci, Co), w27.dtype) for _ in range(p_in + 2)]
        for dz in range(3):
            u = 2 * so + dz - padz
            if 0 <= u < p_in:
                col[u] = col[u] + w3[:, :, dz]
            elif u == -1:
                col[p_in + 1] = col[p_in + 1] + w3[:, :, dz]  # dn carry
            elif u == p_in:
                col[p_in] = col[p_in] + w3[:, :, dz]          # up carry
            else:  # impossible given p_in == 2*p_out
                raise AssertionError((so, dz, padz, p_in))
        blocks.append(jnp.concatenate(col, axis=2))
    return jnp.concatenate(blocks, axis=3)


def _dilate_packed_weight_z(p_in: int, p_out: int, padz: int,
                            dtype) -> jnp.ndarray:
    """0/1 [3, 3, p_in+2, p_out] mask-dilation twin of the above."""
    w = np.zeros((3, 3, p_in + 2, p_out), np.float32)
    for so in range(p_out):
        for dz in range(3):
            u = 2 * so + dz - padz
            if 0 <= u < p_in:
                w[:, :, u, so] = 1.0
            elif u == -1:
                w[:, :, p_in + 1, so] = 1.0
            elif u == p_in:
                w[:, :, p_in, so] = 1.0
    return jnp.asarray(w, dtype)


class _HDStridedTwin(nn.Module):
    """Scope twin of _GeneralStridedBlock: weight [27, Ci, Co] + norm/bn."""
    cin: int
    cout: int

    @nn.compact
    def __call__(self, x_pb, maskf, p_in, padz, z_out, train):
        w = self.param("weight", _kaiming, (27, self.cin, self.cout))
        p_out = p_in // 2
        cd = x_pb.dtype
        y = _conv2d_pb(_shift_ext(x_pb, self.cin),
                       _strided_packed_weight_z(w.astype(cd), p_in, p_out,
                                                padz), 2).astype(cd)
        cnt = _conv2d_pb(_shift_ext(maskf.astype(cd), 1),
                         _dilate_packed_weight_z(p_in, p_out, padz, cd), 2)
        new_maskf = (cnt > 0).astype(cd)
        # clip to the true output z extent: packed slots >= z_out have no
        # grid cell but their receptive field can overlap LIVE input z
        # (padz=0: slot z_out reads input z in [2*z_out, 2*z_out+2] and
        # 2*z_out == z_in-1 when z_in is odd) — left unclipped they go
        # active and contaminate the next stage's SubM neighbours (the
        # tiny-chain bisect caught exactly this at stage3, grid z 1)
        bz = x_pb.shape[1]
        slot_z = (np.arange(bz)[:, None] * p_out
                  + np.arange(p_out)[None, :])  # global z per (pack, slot)
        zvalid = jnp.asarray((slot_z < z_out).astype(np.float32), cd)
        new_maskf = new_maskf * zvalid[None, :, None, None, :]
        mask_pc = jnp.repeat(new_maskf, self.cout, axis=-1)
        # BN masks both its stats (x*maskf internally) and its output, so
        # no pre-mask needed; relu preserves the zeros
        y = _PackedBN(self.cout, eps=1e-3, momentum=0.01, name="norm")(
            y, mask_pc, train)
        y = nn.relu(y)
        return y, new_maskf


class PackedEncoderHD(nn.Module):
    """Apply-compatible z-packed twin of SparseEncoderHD."""
    in_channels: int = 4
    base_channels: int = 16
    output_channels: int = 128
    sparse_shape_xyz: Tuple[int, int, int] = (800, 800, 65)
    encoder_channels: Tuple[Tuple[int, ...], ...] = (
        (16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128))
    strided_paddings: Tuple[Tuple[int, int, int], ...] = (
        (1, 1, 1), (1, 1, 1), (1, 1, 0))
    encoder_strides: Tuple[int, ...] = (2, 2, 2, 1)
    capacity: int = 90000
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sp: SparseTensor, train: bool = False):
        cd = self.compute_dtype
        X0, Y0, Z0 = self.sparse_shape_xyz
        C0 = self.encoder_channels[0][0]
        # p0: power of two, >= 2^(num strided stages) so p halves cleanly,
        # lanes p0*C0 as close to 128 as the channel width allows
        n_strided = sum(1 for i in range(len(self.encoder_channels) - 1)
                        if self.encoder_strides[i] == 2)
        p0_chain = 2 ** n_strided
        while p0_chain * 2 * C0 <= 128:
            p0_chain *= 2
        # a p0=6 "exact-tile" variant (stage-0 SubM K = (6+2)*16 = exactly
        # 128 lanes, repacked to the halving chain after stage0_down) was
        # A/B'd on-chip round 5 and LOST: 378.95 ms vs 354.29 ms for this
        # p0=8 chain — XLA's K=160 handling beats the theory while the
        # 96-lane output underfills the MXU N dim. Knob deleted per the
        # one-wins-or-documented-loss rule (git history has the math).
        p0 = p0_chain
        bz = -(-Z0 // p0)

        # ---- scatter the sparse voxels into the dense packed grid ------
        B = sp.ids.shape[0]
        Cin = sp.features.shape[-1]

        def scatter_one(ids, feats, mask):
            coords = delinearize(ids, (X0, Y0, Z0))  # [A, 3] xyz
            x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
            lin = (x.astype(jnp.int32) * Y0 + y) * (bz * p0) + z
            lin = jnp.where(mask, lin, X0 * Y0 * bz * p0)  # drop invalid
            buf = jnp.zeros((X0 * Y0 * bz * p0, Cin), cd)
            buf = buf.at[lin].set(feats.astype(cd), mode="drop")
            mbuf = jnp.zeros((X0 * Y0 * bz * p0,), cd)
            mbuf = mbuf.at[lin].set(1.0, mode="drop")
            fx = buf.reshape(X0, Y0, bz, p0 * Cin)
            fm = mbuf.reshape(X0, Y0, bz, p0)
            return (jnp.transpose(fx, (2, 0, 1, 3)),
                    jnp.transpose(fm, (2, 0, 1, 3)))

        if B == 1:
            fx, fm = scatter_one(sp.ids[0], sp.features[0], sp.mask[0])
            x_pb, maskf = fx[None], fm[None]
        else:
            x_pb, maskf = jax.lax.map(
                lambda a: scatter_one(*a), (sp.ids, sp.features, sp.mask))

        # ---- conv_input: SubM + BN + ReLU ------------------------------
        mask_pc = jnp.repeat(maskf, self.base_channels, axis=-1)
        x_pb = _PackedSubM(self.base_channels, name="conv_input")(
            x_pb, mask_pc, Cin)
        x_pb = _PackedBN(self.base_channels, eps=1e-3, momentum=0.01,
                         name="norm_input")(x_pb, mask_pc, train)
        x_pb = nn.relu(x_pb)  # BN output is masked; relu keeps the zeros

        # ---- stages ----------------------------------------------------
        p = p0
        zcur = Z0
        for i, blocks in enumerate(self.encoder_channels):
            last_stage = i == len(self.encoder_channels) - 1
            for j, oc in enumerate(blocks):
                is_strided = (j == len(blocks) - 1) and not last_stage
                if is_strided:
                    padz = self.strided_paddings[i][2]
                    z_out = (zcur + 2 * padz - 3) // 2 + 1
                    cin = x_pb.shape[-1] // p
                    x_pb, maskf = _HDStridedTwin(
                        cin, oc, name=f"stage{i}_down")(
                        x_pb, maskf, p, padz, z_out, train)
                    p //= 2
                    zcur = z_out
                    mask_pc = jnp.repeat(maskf, oc, axis=-1)
                else:
                    x_pb = _HDBasicBlock(oc, name=f"stage{i}_block{j}")(
                        x_pb, mask_pc, train)

        # ---- conv_out: 1x1x1 + BN + ReLU -------------------------------
        Cl = x_pb.shape[-1] // p
        w = self.param("conv_out_weight", _kaiming,
                       (1, Cl, self.output_channels))
        # p == 1 at the tail for the shipped shapes, but stay general:
        # a 1x1x1 conv is per-slot C -> Co
        xs = x_pb.reshape(*x_pb.shape[:-1], p, Cl)
        y = jnp.einsum("...pc,co->...po", xs.astype(cd),
                       w[0].astype(cd)).reshape(
            *x_pb.shape[:-1], p * self.output_channels)
        mask_pc = jnp.repeat(maskf, self.output_channels, axis=-1)
        y = _PackedBN(self.output_channels, eps=1e-3, momentum=0.01,
                      name="norm_out")(y, mask_pc, train)
        y = nn.relu(y)

        # ---- unpack to dense [B, X, Y, Z, C] ---------------------------
        grid = (X0, Y0, Z0)
        for i in range(len(self.encoder_channels) - 1):
            if self.encoder_strides[i] == 2:
                grid = conv_output_shape(grid, (3, 3, 3), (2, 2, 2),
                                         self.strided_paddings[i])
        Xl, Yl, Zl = grid
        Bv, bzv, Xv, Yv, L = y.shape
        y = y.reshape(Bv, bzv, Xv, Yv, p, self.output_channels)
        y = jnp.transpose(y, (0, 2, 3, 1, 4, 5)).reshape(
            Bv, Xv, Yv, bzv * p, self.output_channels)
        return y[:, :, :, :Zl].astype(jnp.float32)
