"""Z-packed conv2d implementation of the sparse LiDAR encoder (TPU fastest
path).

Same math and the SAME parameter tree as nn/sparse_enc_dense.DenseLiDAREnc8x
(itself parity-tested against the gather-GEMM sparse path and spconv
semantics, reference sparse_lidar_enc.py:125-178), but computed so every
convolution runs as a 2D convolution with >=128-lane channel dimensions —
measured 86-136 TFLOP/s on v5e where XLA's conv3d at these shapes runs at
~7 TFLOP/s.

Layouts per level (grid X x Y x Z, C channels):
  * lane-major  [B, X, Y, Z*C]   — z-major lanes; used for strided convs
  * packed      [B, bz, X, Y, p*C] — z split into bz packs of p slots
    (p = 128 // C), pack index in batch; used for SubM convs and pointwise
    ops. Conversions between the two are single cheap transposes.

Key transforms:
  * STEM (level-0 collapse, see sparse_enc_dense.py): the degenerate
    GroupNorm(16,16) erases the voxel features, so level 0 reduces to a
    27-tap function of the occupancy mask. Here it is ONE stride-2 conv2d
    of the [B, X0, Y0, Z0] bf16 mask with a [3, 3, Z0, Z1*C1] weight built
    from down1's kernel — the z taps are unrolled into the weight.
  * SubM 3x3x3 conv in packed layout: ONE conv2d with an extended input
    [.., p*C + 2*C] (the two cross-pack carry lanes, built by pack-axis
    shifts) and a [3, 3, (p+2)*C, p*C] block-tridiagonal weight. FLOP
    redundancy vs the raw conv: 2x at C=32, 1.33x at C=64, 1.0x at C=128 —
    paid to keep the MXU full.
  * Strided 3x3x3 conv: ONE stride-2 conv2d in lane-major layout with a
    [3, 3, Zin*Cin, Zout*Cout] block-banded weight.
  * Mask dilation (strided-conv active-site rule): a stride-2 conv2d of the
    mask with a 0/1 [3, 3, Zin, Zout] weight; output active where count > 0.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sparse_conv import SparseTensor
from .layers import MaskedBatchNorm
from .sparse_enc import _kaiming
from .sparse_enc_dense import _PerCellGN, _WeightHolder, _dense_mask


# ---------------------------------------------------------------------------
# weight builders (all operate on [27, Cin, Cout] kx-major tap weights)
# ---------------------------------------------------------------------------

def _subm_ext_weight(w27: jnp.ndarray, p: int) -> jnp.ndarray:
    """[27, C, Co] -> [3, 3, (p+2)*C, p*Co] block-tridiagonal + carries."""
    k3, C, Co = w27.shape
    w3 = w27.reshape(3, 3, 3, C, Co)
    blocks = []
    for zo in range(p):
        col = [jnp.zeros((3, 3, C, Co), w27.dtype) for _ in range(p + 2)]
        for dz in range(3):
            zi = zo + dz - 1
            if 0 <= zi < p:
                col[zi] = col[zi] + w3[:, :, dz]
        if zo == p - 1:
            col[p] = w3[:, :, 2]      # carry from next pack's first slot
        if zo == 0:
            col[p + 1] = w3[:, :, 0]  # carry from prev pack's last slot
        blocks.append(jnp.concatenate(col, axis=2))  # [3,3,(p+2)C,Co]
    return jnp.concatenate(blocks, axis=3)  # [3,3,(p+2)C,pCo]


def _strided_weight(w27: jnp.ndarray, z_in: int) -> jnp.ndarray:
    """[27, Ci, Co] -> [3, 3, z_in*Ci, (z_in//2)*Co] for stride-2 z."""
    k3, Ci, Co = w27.shape
    w3 = w27.reshape(3, 3, 3, Ci, Co)
    z_out = z_in // 2
    out = jnp.zeros((3, 3, z_in, Ci, z_out, Co), w27.dtype)
    for dz in range(3):
        zo = np.arange(z_out)
        zi = 2 * zo + dz - 1
        ok = (zi >= 0) & (zi < z_in)
        upd = jnp.broadcast_to(w3[:, :, dz, None, :, :],
                               (3, 3, int(ok.sum()), Ci, Co))
        # advanced-index axes (zi, zo) land in front of the slice axes
        out = out.at[:, :, zi[ok], :, zo[ok], :].add(
            jnp.transpose(upd, (2, 0, 1, 3, 4)))
    return out.reshape(3, 3, z_in * Ci, z_out * Co)


def _strided_packed_weight(w27: jnp.ndarray, p_in: int,
                           p_out: int) -> jnp.ndarray:
    """[27, Ci, Co] -> [3, 3, (p_in+2)*Ci, p_out*Co] for a stride-2-z conv
    computed IN PACKED LAYOUT (z packs stay in the batch dim).

    With p_in == 2*p_out the pack row is preserved: output slot so reads
    input slots u = 2*so + dz - 1 in [-1, p_in-1], i.e. only the dn
    (prev-pack-last) carry lane group of _shift_ext is ever used. FLOPs
    are 9*(p_in+2)*Ci*p_out*Co per site vs the lane-major _strided_weight
    form's 9*(Z*Ci)*(Z/2*Co) — ~5.5x fewer at the r50 res1->res2 shapes
    (the lane-major weight is >80% structural zeros).
    """
    k3, Ci, Co = w27.shape
    assert k3 == 27
    w3 = w27.reshape(3, 3, 3, Ci, Co)
    blocks = []
    for so in range(p_out):
        col = [jnp.zeros((3, 3, Ci, Co), w27.dtype) for _ in range(p_in + 2)]
        for dz in range(3):
            u = 2 * so + dz - 1
            if 0 <= u < p_in:
                col[u] = col[u] + w3[:, :, dz]
            elif u == -1:
                col[p_in + 1] = col[p_in + 1] + w3[:, :, dz]  # dn carry
            elif u == p_in:
                col[p_in] = col[p_in] + w3[:, :, dz]          # up carry
        blocks.append(jnp.concatenate(col, axis=2))
    return jnp.concatenate(blocks, axis=3)


def _dilate_packed_weight(p_in: int, p_out: int, dtype) -> jnp.ndarray:
    """0/1 [3, 3, p_in+2, p_out] mask-dilation weight in packed layout."""
    w = np.zeros((3, 3, p_in + 2, p_out), np.float32)
    for so in range(p_out):
        for dz in range(3):
            u = 2 * so + dz - 1
            if 0 <= u < p_in:
                w[:, :, u, so] = 1.0
            elif u == -1:
                w[:, :, p_in + 1, so] = 1.0
            elif u == p_in:
                w[:, :, p_in, so] = 1.0
    return jnp.asarray(w, dtype)


def _dilate_weight(z_in: int, dtype) -> jnp.ndarray:
    """0/1 [3, 3, z_in, z_in//2] mask-dilation weight (k3 s2 p1)."""
    z_out = z_in // 2
    w = np.zeros((3, 3, z_in, z_out), np.float32)
    for dz in (-1, 0, 1):
        zo = np.arange(z_out)
        zi = 2 * zo + dz
        ok = (zi >= 0) & (zi < z_in)
        w[:, :, zi[ok], zo[ok]] = 1.0
    return jnp.asarray(w, dtype)


def _conv2d(x, w, stride=1):
    from ..ops.conv_acc import conv2d_f32acc
    return conv2d_f32acc(x, w.astype(x.dtype), (stride, stride),
                         ((1, 1), (1, 1)))


def _s2d_nhwc(x):
    """[B, H, W, C] -> [B, H/2, W/2, 4*C], channel order (r, s, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        B, H // 2, W // 2, 4 * C)


def _s2d_strided_conv(x, w):
    """3x3 stride-2 pad-1 conv computed on the factor-2 space-to-depth of x.

    The stride-2 form runs at ~20 TFLOP/s on v5e at the encoder-stem shapes
    (XLA's strided-conv lowering); the equivalent stride-1 2x2 conv over s2d
    cells runs the MXU dense. out(i) reads rows {2i-1, 2i, 2i+1} = s2d cells
    {i-1 (phase 1), i (phase 0), i (phase 1)}, so tap u maps to (cell a,
    phase r) = (0,1), (1,0), (1,1) for u = 0, 1, 2 — phase (a=0, r=0) stays
    zero. Exact (same tap weights, reassociated).

    x: [B, H, W, C] (H, W even); w: [3, 3, C, Co]. Returns [B,H/2,W/2,Co].
    """
    from ..ops.conv_acc import conv2d_f32acc
    C, Co = w.shape[2], w.shape[3]
    ar = ((0, 1), (1, 0), (1, 1))  # tap u -> (cell a, phase r)
    w2 = jnp.zeros((2, 2, 4 * C, Co), w.dtype)
    for u in range(3):
        a, r = ar[u]
        for v in range(3):
            b, s = ar[v]
            c0 = (r * 2 + s) * C
            w2 = w2.at[a, b, c0:c0 + C].add(w[u, v])
    xs = _s2d_nhwc(x)
    return conv2d_f32acc(xs, w2.astype(x.dtype), (1, 1), ((1, 0), (1, 0)))


# ---------------------------------------------------------------------------
# layout helpers
# ---------------------------------------------------------------------------

def _pick_pack(C: int, Z: int) -> int:
    """Largest divisor of Z with p*C <= 128 (pack p z-slots into lanes)."""
    p = max(1, min(128 // C, Z))
    while Z % p:
        p -= 1
    return p


def _lm_to_pb(x_lm, Z, C, p):
    """[B, X, Y, Z*C] -> [B, bz, X, Y, p*C]."""
    B, X, Y, _ = x_lm.shape
    bz = Z // p
    return jnp.transpose(x_lm.reshape(B, X, Y, bz, p * C), (0, 3, 1, 2, 4))


def _pb_to_lm(x_pb, C):
    """[B, bz, X, Y, p*C] -> [B, X, Y, Z*C]."""
    B, bz, X, Y, pc = x_pb.shape
    return jnp.transpose(x_pb, (0, 2, 3, 1, 4)).reshape(B, X, Y, bz * pc)


def _mask_pb(mask_lm, p):
    """[B, X, Y, Z] bool -> [B, bz, X, Y, p] bool."""
    B, X, Y, Z = mask_lm.shape
    return jnp.transpose(mask_lm.reshape(B, X, Y, Z // p, p), (0, 3, 1, 2, 4))


def _shift_ext(x_pb, C):
    """Append the two cross-pack carry lane groups: [..., p*C + 2*C]."""
    up = jnp.concatenate(
        [x_pb[:, 1:, ..., :C], jnp.zeros_like(x_pb[:, :1, ..., :C])], axis=1)
    dn = jnp.concatenate(
        [jnp.zeros_like(x_pb[:, :1, ..., -C:]), x_pb[:, :-1, ..., -C:]],
        axis=1)
    return jnp.concatenate([x_pb, up, dn], axis=-1)


def _conv2d_pb(x_pb, w, stride=1):
    """conv2d over the (X, Y) dims of a packed [B, bz, X, Y, L] tensor."""
    B, bz, X, Y, L = x_pb.shape
    out = _conv2d(x_pb.reshape(B * bz, X, Y, L), w, stride)
    return out.reshape(B, bz, X // stride, Y // stride, -1)


# ---------------------------------------------------------------------------
# packed masked BatchNorm (same param/variable tree as _DenseMaskedBN)
# ---------------------------------------------------------------------------

class _PackedBNCore(nn.Module):
    """MaskedBatchNorm twin operating on packed [B,bz,X,Y,p*C] tensors."""
    C: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x_pb, maskf_pc, train: bool):
        C = self.C
        p = x_pb.shape[-1] // C
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))

        if not train:
            mean, var = ra_mean.value, ra_var.value
        else:
            xm = (x_pb * maskf_pc).astype(jnp.float32)
            s1 = xm.sum(axis=(0, 1, 2, 3)).reshape(p, C).sum(0)
            s2 = (xm * x_pb).sum(axis=(0, 1, 2, 3)).reshape(p, C).sum(0)
            n = jnp.maximum(
                maskf_pc.astype(jnp.float32).sum() / C, 1.0)
            mean = s1 / n
            var = jnp.maximum(s2 / n - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value \
                    + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value \
                    + self.momentum * var * n / jnp.maximum(n - 1, 1.0)

        mean_t = jnp.tile(mean, p).astype(x_pb.dtype)
        inv_t = jnp.tile(
            (1.0 / jnp.sqrt(var + self.eps)) * scale, p).astype(x_pb.dtype)
        bias_t = jnp.tile(bias, p).astype(x_pb.dtype)
        return ((x_pb - mean_t) * inv_t + bias_t) * maskf_pc


class _PackedBN(nn.Module):
    """Scope twin of _DenseMaskedBN: <name>/bn/{scale,bias,mean,var}."""
    C: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x_pb, maskf_pc, train: bool):
        return _PackedBNCore(self.C, self.eps, self.momentum, name="bn")(
            x_pb, maskf_pc, train)


def _ztap_weight(w27: jnp.ndarray) -> jnp.ndarray:
    """[27, C, Co] -> [3, 3, C, 3*Co]: the three z taps stacked into the
    OUTPUT channels of one (x, y) conv2d (z lives in the batch dim)."""
    k3, C, Co = w27.shape
    w3 = w27.reshape(3, 3, 3, C, Co)  # (kx, ky, kz, C, Co)
    return jnp.concatenate([w3[:, :, dz] for dz in range(3)], axis=-1)


def _pb_to_zb(x_pb, C):
    """packed [B, bz, X, Y, p*C] -> z-batch [B, Z, X, Y, C] (z = bz*p+slot)."""
    B, bz, X, Y, pc = x_pb.shape
    p = pc // C
    x = x_pb.reshape(B, bz, X, Y, p, C)
    return jnp.transpose(x, (0, 1, 4, 2, 3, 5)).reshape(B, bz * p, X, Y, C)


def _zb_to_pb(x_zb, p):
    """z-batch [B, Z, X, Y, C] -> packed [B, bz, X, Y, p*C]."""
    B, Z, X, Y, C = x_zb.shape
    x = x_zb.reshape(B, Z // p, p, X, Y, C)
    return jnp.transpose(x, (0, 1, 3, 4, 2, 5)).reshape(
        B, Z // p, X, Y, p * C)


class _ZTapSubM(nn.Module):
    """Scope twin of _PackedSubM computing in z-batch layout.

    One conv2d with 3*Co output channels (one group per z tap) + two
    batch-axis shift-adds: FLOPs equal the RAW SubM conv3d (no
    block-tridiagonal redundancy) at the cost of a 96-lane output at C=32
    (vs the ext conv's full 128 lanes but 2x the FLOPs).
    """
    features: int

    @nn.compact
    def __call__(self, x_zb, maskf_zb_out, C_in):
        w = self.param("weight", _kaiming, (27, C_in, self.features))
        wz = _ztap_weight(w)
        B, Z, X, Y, C = x_zb.shape
        Co = self.features
        y = _conv2d(x_zb.reshape(B * Z, X, Y, C), wz).astype(x_zb.dtype)
        y = y.reshape(B, Z, X, Y, 3, Co)
        # out[z] = y[z-1, tap0] + y[z, tap1] + y[z+1, tap2]
        out = y[:, :, :, :, 1]
        out = out.at[:, 1:].add(y[:, :-1, :, :, 0])
        out = out.at[:, :-1].add(y[:, 1:, :, :, 2])
        return out * maskf_zb_out


class _ZbBNCore(nn.Module):
    """MaskedBatchNorm twin for z-batch [B, Z, X, Y, C] tensors."""
    C: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x_zb, maskf_zb, train: bool):
        C = self.C
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))

        if not train:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = maskf_zb[..., None]
            xm = (x_zb * m).astype(jnp.float32)
            s1 = xm.sum(axis=(0, 1, 2, 3))
            s2 = (xm * x_zb).sum(axis=(0, 1, 2, 3))
            n = jnp.maximum(maskf_zb.astype(jnp.float32).sum(), 1.0)
            mean = s1 / n
            var = jnp.maximum(s2 / n - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value \
                    + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value \
                    + self.momentum * var * n / jnp.maximum(n - 1, 1.0)

        inv = ((1.0 / jnp.sqrt(var + self.eps)) * scale).astype(x_zb.dtype)
        out = (x_zb - mean.astype(x_zb.dtype)) * inv + bias.astype(x_zb.dtype)
        return out * maskf_zb[..., None]


class _ZbBN(nn.Module):
    """Scope twin of _PackedBN for z-batch layout."""
    C: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x_zb, maskf_zb, train: bool):
        return _ZbBNCore(self.C, self.eps, self.momentum, name="bn")(
            x_zb, maskf_zb, train)


class _ZTapBasicBlock(nn.Module):
    """Scope twin of _PackedBasicBlock computing in z-batch layout."""
    features: int

    @nn.compact
    def __call__(self, x_zb, maskf_zb, train: bool):
        C = self.features
        identity = x_zb
        y = _ZTapSubM(C, name="conv1")(x_zb, maskf_zb[..., None], C)
        y = _ZbBN(C, name="norm1")(y, maskf_zb, train)
        y = nn.relu(y)
        y = _ZTapSubM(C, name="conv2")(y, maskf_zb[..., None], C)
        y = _ZbBN(C, name="norm2")(y, maskf_zb, train)
        return nn.relu(y + identity) * maskf_zb[..., None]


class _PackedSubM(nn.Module):
    """Scope twin of _DenseSubM (param 'weight' [27, Cin, Cout])."""
    features: int

    @nn.compact
    def __call__(self, x_pb, maskf_pc_out, C_in):
        import os
        w = self.param("weight", _kaiming, (27, C_in, self.features))
        p = x_pb.shape[-1] // C_in
        mode = os.environ.get("COOCC_PALLAS_SUBM", "")
        if (mode and (mode == "interpret" or jax.default_backend() == "tpu")
                and x_pb.shape[-1] % 128 == 0):  # kernel's lane-align req
            # fused Pallas kernel: the 192-lane ext concat never hits HBM
            # (numerics identical: bf16 operands, fp32 accum)
            from ..ops.pallas.subm_conv import subm_ext_conv
            wext = _subm_ext_weight(w, p)
            y = subm_ext_conv(x_pb, wext, bz=x_pb.shape[1], C=C_in,
                              interpret=(mode == "interpret"))
            return y * maskf_pc_out
        # A split form (exactly-tiled in-pack conv + two carry convs on the
        # cross-pack shift lanes, ~25% fewer gross MACs at p=4) was built
        # and A/B'd on-chip round 5: it LOST 260.45 ms vs 46.14 ms for this
        # ext conv (tools/ab_subm_split.py, docs/relay_session_r5a.log) —
        # the three smaller convs serialize and re-read x_pb where the ext
        # conv is one well-tiled MXU pass. Knob deleted per the
        # one-wins-or-documented-loss rule; the math lives in git history
        # (commit 2b2bc60).
        wext = _subm_ext_weight(w, p)
        y = _conv2d_pb(_shift_ext(x_pb, C_in), wext).astype(x_pb.dtype)
        return y * maskf_pc_out


class _PackedBasicBlock(nn.Module):
    """Scope twin of _DenseBasicBlock (conv1/norm1/conv2/norm2)."""
    features: int

    @nn.compact
    def __call__(self, x_pb, maskf_pc, train: bool):
        C = self.features
        identity = x_pb
        y = _PackedSubM(C, name="conv1")(x_pb, maskf_pc, C)
        y = _PackedBN(C, name="norm1")(y, maskf_pc, train)
        y = nn.relu(y)
        y = _PackedSubM(C, name="conv2")(y, maskf_pc, C)
        y = _PackedBN(C, name="norm2")(y, maskf_pc, train)
        return nn.relu(y + identity) * maskf_pc


class _StridedParamsTwin(nn.Module):
    """Scope twin of _StridedParams / _DenseStrided: weight + norm/bn."""
    cin: int
    cout: int

    @nn.compact
    def __call__(self, op, x_pb=None, maskf_pc=None, train=False):
        w = self.param("weight", _kaiming, (27, self.cin, self.cout))
        if op == "weight":
            return w
        if op == "norm_zb":
            # x_pb is a z-batch [B, Z, X, Y, C] tensor, maskf_pc a [B, Z,
            # X, Y] float mask; identical math/params to the packed norm.
            return _ZbBN(self.cout, name="norm")(x_pb, maskf_pc, train)
        return _PackedBN(self.cout, name="norm")(x_pb, maskf_pc, train)


def _ztap_strided_weight(w27: jnp.ndarray) -> jnp.ndarray:
    """[27, Ci, Co] -> [3, 3, 3*Ci, Co] for the z-batch strided conv.

    The z-batch strided conv gathers the three z input taps (zi = 2*zo +
    dz - 1) into the CHANNEL dim, so the weight is the three kz slices
    stacked tap-major along the input channels. FLOPs equal the RAW conv3d
    — the lane-major `_strided_weight` form multiplies (z_in - 3) zero
    blocks per output z instead.
    """
    k3, Ci, Co = w27.shape
    w3 = w27.reshape(3, 3, 3, Ci, Co)
    return jnp.concatenate([w3[:, :, dz] for dz in range(3)], axis=2)


def _zb_strided_taps(x_zb: jnp.ndarray) -> jnp.ndarray:
    """z-batch [B, Z, X, Y, C] -> [B, Z//2, X, Y, 3*C] stride-2 z taps.

    out[:, zo, ..., t*C:(t+1)*C] = x[:, 2*zo + t - 1] (zero-padded in z).
    """
    B, Z, X, Y, C = x_zb.shape
    Zo = Z // 2
    xp = jnp.pad(x_zb, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    taps = [xp[:, t:t + 2 * (Zo - 1) + 1:2] for t in range(3)]
    return jnp.concatenate(taps, axis=-1)


class PackedLiDAREnc8x(nn.Module):
    """Z-packed twin of DenseLiDAREnc8x — same params, ~4x faster on TPU.

    Input: a dense [B, X, Y, Z] bool occupancy grid (ops.voxelize.
    voxelize_mask) or a batched SparseTensor. Output: [B, X/8, Y/8, Z/8,
    out_channel] float32 dense features.
    """
    input_channel: int = 4
    base_channel: int = 16
    out_channel: int = 128
    sparse_shape_xyz: Tuple[int, int, int] = (800, 800, 64)
    capacity: int = 90000
    compute_dtype: Any = jnp.float32
    stop_after: Optional[str] = None  # profiling: stem|res1|res2|res3
    # res levels to run in z-batch tap-fused form instead of the packed
    # block-tridiagonal ext conv (same params; see _ZTapBasicBlock)
    ztap_levels: Tuple[int, ...] = ()
    # z-batch stem + strided downsamples (raw-conv3d FLOPs; the lane-major
    # strided weights are ~90% structural zeros). MEASURED SLOWER on v5e
    # (stem 9.3 vs 9.0 ms, full encoder 84 vs 46 ms): the fat lane-major
    # convs run near MXU peak and the tap-gather transposes dominate the
    # saved MACs. Kept as an equivalence-tested reference point.
    zb_down: bool = False

    @nn.compact
    def __call__(self, sp, train: bool = False):
        if self.zb_down:
            return self._forward_zb(sp, train)
        return self._forward_packed(sp, train)

    def _forward_zb(self, sp, train: bool):
        """Hybrid layout: z-batch stem + strided downsamples, packed res.

        Same parameter/variable tree as _forward_packed (scope twins all
        the way down); differs only in compute layout. The stem consumes
        3 z-taps of the occupancy mask per output slice instead of the
        [3, 3, Z0, Z1*C1] block-banded lane-major weight (Z0/3 ~= 21x
        fewer MACs), and each strided downsample consumes [.., 3*Cin]
        tap channels instead of [.., Zin*Cin] lanes (Zin/3 fewer MACs).
        Res blocks stay in the packed block-tridiagonal form: its 2x MAC
        redundancy measures FASTER than the z-batch tap form, whose
        batch-axis shift-adds cannot fuse into the conv (measured 49 ms
        packed vs 105 ms z-batch for the full encoder on v5e).
        """
        b = self.base_channel
        cd = self.compute_dtype
        X0, Y0, Z0 = self.sparse_shape_xyz
        assert b == 16, "level-0 collapse assumes GroupNorm(16, base=16)"

        if isinstance(sp, SparseTensor):
            mask0 = _dense_mask(sp, (X0, Y0, Z0))
        else:
            mask0 = sp
        mask0f = mask0.astype(cd)  # [B, X0, Y0, Z0]
        B = mask0f.shape[0]

        # --- level-0 collapse, z-batch stem (see _forward_packed)
        w_stem = _WeightHolder((27, self.input_channel, b),
                               name="conv_input")()  # ckpt parity
        del w_stem
        gn_mod = _PerCellGN(16, name="gn_input")
        stem_const = nn.relu(gn_mod(jnp.zeros((1, b), jnp.float32),
                                    jnp.ones((1,), bool))[0])
        down1 = _StridedParamsTwin(b, b * 2, name="down1")
        wd = down1("weight")  # [27, b, 2b]
        w_eff = jnp.einsum("kio,i->ko", wd.astype(jnp.float32),
                           stem_const)  # [27, 2b]

        C, Z = b * 2, Z0 // 2
        X, Y = X0 // 2, Y0 // 2
        wz = w_eff.reshape(3, 3, 3, C)  # (kx, ky, kz==tap, Co)
        mp = jnp.pad(mask0f, ((0, 0), (0, 0), (0, 0), (1, 1)))
        x3 = jnp.stack(
            [mp[..., t:t + 2 * (Z - 1) + 1:2] for t in range(3)], axis=-1)
        x3 = jnp.transpose(x3, (0, 3, 1, 2, 4)).reshape(B * Z, X0, Y0, 3)
        d = _conv2d(x3, wz, 2).reshape(B, Z, X, Y, C).astype(cd)

        cnt = _conv2d(mask0f, _dilate_weight(Z0, cd), 2)
        mask_lm = cnt > 0.5  # [B, X, Y, Z]

        # -> packed layout for norm + res blocks
        p = _pick_pack(C, Z)
        dp = _zb_to_pb(d, p)
        mf = jnp.repeat(_mask_pb(mask_lm, p), C, axis=-1).astype(cd)
        dp = down1("norm", dp * mf, mf, train)
        dp = nn.relu(dp)
        if self.stop_after == "stem":
            return dp

        dp = _PackedBasicBlock(C, name="res1_0")(dp, mf, train)
        dp = _PackedBasicBlock(C, name="res1_1")(dp, mf, train)
        if self.stop_after == "res1":
            return dp

        for lvl in (2, 3):
            C_out = C * 2
            down = _StridedParamsTwin(C, C_out, name=f"down{lvl}")
            wdn = _ztap_strided_weight(down("weight"))  # [3,3,3C,Co]
            x3 = _zb_strided_taps(_pb_to_zb(dp, C))  # [B, Z//2, X, Y, 3C]
            Zo = Z // 2
            d = _conv2d(x3.reshape(B * Zo, X, Y, 3 * C), wdn, 2)
            X, Y, Z, C = X // 2, Y // 2, Zo, C_out
            d = d.reshape(B, Z, X, Y, C).astype(cd)
            cnt = _conv2d(mask_lm.astype(cd),
                          _dilate_weight(mask_lm.shape[-1], cd), 2)
            mask_lm = cnt > 0.5
            p = _pick_pack(C, Z)
            dp = _zb_to_pb(d, p)
            mf = jnp.repeat(_mask_pb(mask_lm, p), C, axis=-1).astype(cd)
            dp = down("norm", dp * mf, mf, train)
            dp = nn.relu(dp)
            dp = _PackedBasicBlock(C, name=f"res{lvl}_0")(dp, mf, train)
            dp = _PackedBasicBlock(C, name=f"res{lvl}_1")(dp, mf, train)
            if self.stop_after == f"res{lvl}":
                return dp

        Co = self.out_channel
        mcell = _mask_pb(mask_lm, p)  # [B, bz, X, Y, p]
        mof = jnp.repeat(mcell, Co, axis=-1).astype(cd)
        dp = _PackedSubM(Co, name="conv_out")(dp, mof, C)
        d5 = dp.reshape(dp.shape[:-1] + (p, Co))
        g = _PerCellGN(16, name="gn_out")(d5.astype(jnp.float32), mcell)
        g = nn.relu(g)
        B_, bz, Xs, Ys, _, _ = g.shape
        out = jnp.transpose(g, (0, 2, 3, 1, 4, 5)).reshape(
            B_, Xs, Ys, bz * p, Co)
        return out.astype(jnp.float32)

    def _forward_packed(self, sp, train: bool = False):
        import os

        b = self.base_channel
        cd = self.compute_dtype
        X0, Y0, Z0 = self.sparse_shape_xyz
        assert b == 16, "level-0 collapse assumes GroupNorm(16, base=16)"

        if isinstance(sp, SparseTensor):
            mask0 = _dense_mask(sp, (X0, Y0, Z0))
        else:
            mask0 = sp
        mask0f = mask0.astype(cd)  # [B, X0, Y0, Z0]

        # --- level-0 collapse (see sparse_enc_dense.py): stem == relu(gn
        # bias) at active cells; down1 reduces to mask-plane taps. Here the
        # z taps are unrolled into ONE stride-2 conv2d weight.
        w_stem = _WeightHolder((27, self.input_channel, b),
                               name="conv_input")()  # ckpt parity
        del w_stem
        gn_mod = _PerCellGN(16, name="gn_input")
        stem_const = nn.relu(gn_mod(jnp.zeros((1, b), jnp.float32),
                                    jnp.ones((1,), bool))[0])
        down1 = _StridedParamsTwin(b, b * 2, name="down1")
        wd = down1("weight")  # [27, b, 2b]
        w_eff = jnp.einsum("kio,i->ko", wd.astype(jnp.float32),
                           stem_const)[:, None, :]  # [27, 1, 2b]

        C1, Z1 = b * 2, Z0 // 2
        p1 = _pick_pack(C1, Z1)
        bz1 = Z1 // p1
        p_in = Z0 // bz1
        # On-chip A/B (perf session 13): the lane-major unrolled stride-2
        # STEM beats the packed form despite ~6x more raw MACs — the
        # structural zeros cost nothing once the MXU tiles the wide lane
        # dim, while the packed form's narrow lanes underfill it
        # (stem 8.2 vs 22.3 ms on v5e). The down2/down3 strided convs are
        # the opposite (round-3 A/B): their packed weights keep full
        # 128-lane outputs at 4-5x fewer MACs (down2 lane-major
        # [3,3,1024,1024] = 755 GMAC vs packed [3,3,192,128] = 142 GMAC),
        # so the default is HYBRID: lane-major stem, packed downsamples.
        # COOCC_STRIDED_MODE=lm|packed|hybrid overrides (lm matches the
        # round-2 default; packed is fastest off-TPU where FLOPs win).
        mode = os.environ.get("COOCC_STRIDED_MODE", "hybrid")
        if os.environ.get("COOCC_PACKED_STRIDED"):  # legacy knob
            mode = "packed"
        lane_major = mode != "packed" or p_in != 2 * p1
        down_lane_major = mode == "lm"
        if lane_major:
            # ONE stride-2-equivalent conv2d with the z taps unrolled into
            # [3, 3, Z0, Z1*C1] lanes (>90% structural zeros). Computed via
            # space-to-depth by default: the strided lowering measured
            # ~20 TFLOP/s on v5e, the s2d stride-1 form keeps the MXU dense
            # (COOCC_S2D_STEM3D=0 reverts to the plain strided conv).
            w_lm = _strided_weight(w_eff, Z0)
            if os.environ.get("COOCC_S2D_STEM3D", "1") not in ("0", "off"):
                d_lm = _s2d_strided_conv(mask0f, w_lm).astype(cd)
                cnt = _s2d_strided_conv(mask0f, _dilate_weight(Z0, cd))
            else:
                d_lm = _conv2d(mask0f, w_lm, 2).astype(cd)
                cnt = _conv2d(mask0f, _dilate_weight(Z0, cd), 2)
            mask1_lm = cnt > 0.5  # [B, X1, Y1, Z1]
            d = _lm_to_pb(d_lm, Z1, C1, p1)
            m1 = _mask_pb(mask1_lm, p1)
        else:
            # packed stride-2-z stem: z packs in the batch dim, raw-conv
            # FLOPs (~6x fewer), output directly in packed layout
            B = mask0f.shape[0]
            m_pb = jnp.transpose(
                mask0f.reshape(B, X0, Y0, bz1, p_in), (0, 3, 1, 2, 4))
            ext = _shift_ext(m_pb, 1)
            d = _conv2d_pb(
                ext, _strided_packed_weight(w_eff, p_in, p1), 2).astype(cd)
            cnt = _conv2d_pb(ext, _dilate_packed_weight(p_in, p1, cd), 2)
            m1 = cnt > 0.5  # [B, bz1, X1, Y1, p1]
            mask1_lm = jnp.transpose(m1, (0, 2, 3, 1, 4)).reshape(
                B, X0 // 2, Y0 // 2, Z1)
        m1f = jnp.repeat(m1, C1, axis=-1).astype(cd)
        d = down1("norm", d * m1f, m1f, train)
        d = nn.relu(d)
        if self.stop_after == "stem":
            return d

        if 1 in self.ztap_levels:
            d_zb = _pb_to_zb(d, C1)
            mzb = jnp.transpose(mask1_lm, (0, 3, 1, 2)).astype(cd)
            d_zb = _ZTapBasicBlock(C1, name="res1_0")(d_zb, mzb, train)
            d_zb = _ZTapBasicBlock(C1, name="res1_1")(d_zb, mzb, train)
            d = _zb_to_pb(d_zb, p1)
        else:
            d = _PackedBasicBlock(C1, name="res1_0")(d, m1f, train)
            d = _PackedBasicBlock(C1, name="res1_1")(d, m1f, train)
        if self.stop_after == "res1":
            return d

        mask_lm, Z, C, p = mask1_lm, Z1, C1, p1
        for lvl in (2, 3):
            C_out = C * 2
            down = _StridedParamsTwin(C, C_out, name=f"down{lvl}")
            wdn = down("weight")
            p_out = _pick_pack(C_out, Z // 2)
            if down_lane_major or p != 2 * p_out:
                d_lm = _pb_to_lm(d, C)
                d_lm = _conv2d(d_lm, _strided_weight(wdn, Z), 2).astype(cd)
                cnt = _conv2d(mask_lm.astype(cd), _dilate_weight(Z, cd), 2)
                mask_lm = cnt > 0.5
                Z, C = Z // 2, C_out
                p = _pick_pack(C, Z)
                d = _lm_to_pb(d_lm, Z, C, p)
                mcell = _mask_pb(mask_lm, p)
            else:
                # packed stride-2-z downsample: pack rows preserved, only
                # the dn carry participates (see _strided_packed_weight)
                d = _conv2d_pb(
                    _shift_ext(d, C),
                    _strided_packed_weight(wdn, p, p_out), 2).astype(cd)
                mpf = _mask_pb(mask_lm, p).astype(cd)
                cnt = _conv2d_pb(_shift_ext(mpf, 1),
                                 _dilate_packed_weight(p, p_out, cd), 2)
                mcell = cnt > 0.5  # [B, bz, X/2, Y/2, p_out]
                B = d.shape[0]
                Z, C, p = Z // 2, C_out, p_out
                mask_lm = jnp.transpose(mcell, (0, 2, 3, 1, 4)).reshape(
                    B, d.shape[2], d.shape[3], Z)
            mf = jnp.repeat(mcell, C, axis=-1).astype(cd)
            d = down("norm", d * mf, mf, train)
            d = nn.relu(d)
            if lvl in self.ztap_levels:
                d_zb = _pb_to_zb(d, C)
                mzb = jnp.transpose(mask_lm, (0, 3, 1, 2)).astype(cd)
                d_zb = _ZTapBasicBlock(C, name=f"res{lvl}_0")(d_zb, mzb,
                                                             train)
                d_zb = _ZTapBasicBlock(C, name=f"res{lvl}_1")(d_zb, mzb,
                                                              train)
                d = _zb_to_pb(d_zb, p)
            else:
                d = _PackedBasicBlock(C, name=f"res{lvl}_0")(d, mf, train)
                d = _PackedBasicBlock(C, name=f"res{lvl}_1")(d, mf, train)
            if self.stop_after == f"res{lvl}":
                return d

        Co = self.out_channel
        mcell = _mask_pb(mask_lm, p)  # [B, bz, X, Y, p]
        mof = jnp.repeat(mcell, Co, axis=-1).astype(cd)
        d = _PackedSubM(Co, name="conv_out")(d, mof, C)
        d5 = d.reshape(d.shape[:-1] + (p, Co))
        g = _PerCellGN(16, name="gn_out")(d5.astype(jnp.float32), mcell)
        g = nn.relu(g)
        # packed [B, bz, X, Y, p, Co] -> dense [B, X, Y, Z, Co]
        B, bz, Xs, Ys, _, _ = g.shape
        out = jnp.transpose(g, (0, 2, 3, 1, 4, 5)).reshape(
            B, Xs, Ys, bz * p, Co)
        return out.astype(jnp.float32)
