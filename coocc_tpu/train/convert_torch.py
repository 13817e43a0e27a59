"""Torch .pth -> flax params converter for released Co-Occ checkpoints.

The reference ships torch checkpoints (README.md model zoo); loading them
with bit-matched behavior requires exact weight-layout transposition:

  Conv2d   [O, I, kh, kw]        -> [kh, kw, I, O]        (flax HWIO)
  Conv3d   [O, I, k0, k1, k2]    -> [k0, k1, k2, I, O]    (torch spatial
           order matches our (X, Y, Z) axis order because both sides apply
           kernel dims to spatial dims in call order)
  Deconv   [I, O, kh, kw]        -> [kh, kw, I, O] with transpose_kernel=True
  Linear   [O, I]                -> [I, O]
  BN/GN    weight/bias/running_* -> scale/bias/mean/var (names only)
  spconv   SubM/SparseConv3d: [k0, k1, k2, I, O] (spconv1, zyx kernel dims)
           or [O, k0, k1, k2, I] (spconv2) -> our [K3, I, O] with the tap
           enumeration transposed from zyx to our xyz-major rulebook order.

The mapping tables below translate reference module paths to our flax scopes.
Without the released .pth files in this environment the converter is
validated by layer-type round-trip tests (tests/test_convert.py) that build
torch layers, convert, and compare activations.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def conv2d_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def conv3d_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))


def deconv2d_w(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose2d weight [I, O, kh, kw]; flax with
    # transpose_kernel=True expects [kh, kw, O, I]... (it flips spatially and
    # swaps in/out internally); validated in tests/test_convert.py
    return np.transpose(w, (2, 3, 1, 0))


def deconv3d_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))


def linear_w(w: np.ndarray) -> np.ndarray:
    # 1x1 Conv2d used as a linear layer (e.g. SELayer conv_reduce/expand,
    # ViewTransformerLSSBEVDepth.py:480-493) arrives as [O, I, 1, 1]
    if w.ndim == 4:
        assert w.shape[2] == w.shape[3] == 1, f"not a 1x1 conv: {w.shape}"
        w = w[:, :, 0, 0]
    return np.transpose(w, (1, 0))


def spconv_w(w: np.ndarray) -> np.ndarray:
    """spconv kernel -> [K3, I, O] in our xyz-major tap order.

    spconv enumerates kernel dims over (z, y, x) (its coordinate order);
    our rulebook taps are x-major over (kx, ky, kz).
    """
    if w.ndim != 5:
        raise ValueError(f"unexpected spconv weight shape {w.shape}")
    k = max(w.shape)
    if w.shape[0] == w.shape[1] == w.shape[2]:        # [kz, ky, kx, I, O]
        kz, ky, kx, I, O = w.shape
        v = w
    elif w.shape[1] == w.shape[2] == w.shape[3]:      # [O, kz, ky, kx, I]
        O, kz, ky, kx, I = w.shape
        v = np.transpose(w, (1, 2, 3, 4, 0))
    else:
        raise ValueError(f"unrecognized spconv layout {w.shape}")
    # (kz, ky, kx, I, O) -> (kx, ky, kz, I, O) -> [K3, I, O]
    v = np.transpose(v, (2, 1, 0, 3, 4))
    return v.reshape(kx * ky * kz, I, O)


def bn_params(sd: Dict[str, np.ndarray], prefix: str):
    """-> (params {scale, bias}, stats {mean, var})."""
    return (
        {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
        {"mean": sd[f"{prefix}.running_mean"],
         "var": sd[f"{prefix}.running_var"]},
    )


def gn_params(sd: Dict[str, np.ndarray], prefix: str):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


class ParamTreeBuilder:
    """Accumulates flax param/batch_stats entries by '/'-joined path."""

    def __init__(self):
        self.params: Dict = {}
        self.batch_stats: Dict = {}

    def _set(self, tree, path, value):
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(value)

    def conv2d(self, sd, tpath, fpath, bias=None):
        self._set(self.params, f"{fpath}/conv/kernel",
                  conv2d_w(sd[f"{tpath}.weight"]))
        if bias or (bias is None and f"{tpath}.bias" in sd):
            self._set(self.params, f"{fpath}/conv/bias", sd[f"{tpath}.bias"])

    def conv3d(self, sd, tpath, fpath):
        self._set(self.params, f"{fpath}/conv/kernel",
                  conv3d_w(sd[f"{tpath}.weight"]))
        if f"{tpath}.bias" in sd:
            self._set(self.params, f"{fpath}/conv/bias", sd[f"{tpath}.bias"])

    def deconv(self, sd, tpath, fpath, three_d=False):
        w = sd[f"{tpath}.weight"]
        w = deconv3d_w(w) if three_d else deconv2d_w(w)
        self._set(self.params, f"{fpath}/kernel", w)
        if f"{tpath}.bias" in sd:
            self._set(self.params, f"{fpath}/bias", sd[f"{tpath}.bias"])

    def linear(self, sd, tpath, fpath):
        self._set(self.params, f"{fpath}/linear/kernel",
                  linear_w(sd[f"{tpath}.weight"]))
        if f"{tpath}.bias" in sd:
            self._set(self.params, f"{fpath}/linear/bias",
                      sd[f"{tpath}.bias"])

    def dense(self, sd, tpath, fpath):
        """flax nn.Dense directly at fpath (no 'linear' wrapper)."""
        self._set(self.params, f"{fpath}/kernel", linear_w(sd[f"{tpath}.weight"]))
        if f"{tpath}.bias" in sd:
            self._set(self.params, f"{fpath}/bias", sd[f"{tpath}.bias"])

    def bn(self, sd, tpath, fpath):
        p, s = bn_params(sd, tpath)
        self._set(self.params, f"{fpath}/bn/scale", p["scale"])
        self._set(self.params, f"{fpath}/bn/bias", p["bias"])
        self._set(self.batch_stats, f"{fpath}/bn/mean", s["mean"])
        self._set(self.batch_stats, f"{fpath}/bn/var", s["var"])

    def masked_bn(self, sd, tpath, fpath):
        p, s = bn_params(sd, tpath)
        self._set(self.params, f"{fpath}/scale", p["scale"])
        self._set(self.params, f"{fpath}/bias", p["bias"])
        self._set(self.batch_stats, f"{fpath}/mean", s["mean"])
        self._set(self.batch_stats, f"{fpath}/var", s["var"])

    def gn(self, sd, tpath, fpath):
        p = gn_params(sd, tpath)
        self._set(self.params, f"{fpath}/gn/scale", p["scale"])
        self._set(self.params, f"{fpath}/gn/bias", p["bias"])

    def spconv(self, sd, tpath, fpath):
        self._set(self.params, f"{fpath}/weight",
                  spconv_w(sd[f"{tpath}.weight"]))

    def ln(self, sd, tpath, fpath):
        """torch nn.LayerNorm -> flax nn.LayerNorm at fpath."""
        self._set(self.params, f"{fpath}/scale", sd[f"{tpath}.weight"])
        self._set(self.params, f"{fpath}/bias", sd[f"{tpath}.bias"])


def convert_resnet(b: ParamTreeBuilder, sd, tprefix: str, fprefix: str,
                   depth: int):
    from ..nn.resnet2d import RESNET_LAYERS
    b.conv2d(sd, f"{tprefix}.conv1", f"{fprefix}/conv1")
    b.bn(sd, f"{tprefix}.bn1", f"{fprefix}/bn1")
    layers = RESNET_LAYERS[depth]
    for i, n in enumerate(layers):
        for j in range(n):
            t = f"{tprefix}.layer{i + 1}.{j}"
            f = f"{fprefix}/layer{i + 1}_{j}"
            for c in ("conv1", "conv2", "conv3"):
                if f"{t}.{c}.weight" in sd:
                    b.conv2d(sd, f"{t}.{c}", f"{f}/{c}")
            for bnorm in ("bn1", "bn2", "bn3"):
                if f"{t}.{bnorm}.weight" in sd:
                    b.bn(sd, f"{t}.{bnorm}", f"{f}/{bnorm}")
            if f"{t}.downsample.0.weight" in sd:
                b.conv2d(sd, f"{t}.downsample.0", f"{f}/downsample_conv")
                b.bn(sd, f"{t}.downsample.1", f"{f}/downsample_bn")


def convert_second_fpn(b, sd, tprefix, fprefix, upsample_strides):
    for i, s in enumerate(upsample_strides):
        t = f"{tprefix}.deblocks.{i}"
        if s > 1 or s == 1:
            b.deconv(sd, f"{t}.0", f"{fprefix}/deblock{i}_deconv")
        else:
            b.conv2d(sd, f"{t}.0", f"{fprefix}/deblock{i}_conv")
        b.bn(sd, f"{t}.1", f"{fprefix}/deblock{i}_bn")


def convert_depthnet(b, sd, tprefix, fprefix):
    b.conv2d(sd, f"{tprefix}.reduce_conv.0", f"{fprefix}/reduce_conv")
    b.bn(sd, f"{tprefix}.reduce_conv.1", f"{fprefix}/reduce_bn")
    b.conv2d(sd, f"{tprefix}.context_conv", f"{fprefix}/context_conv")
    # BatchNorm1d on the 27-d cam vector
    b.bn(sd, f"{tprefix}.bn", f"{fprefix}/bn")
    for mlp in ("depth_mlp", "context_mlp"):
        b.linear(sd, f"{tprefix}.{mlp}.fc1", f"{fprefix}/{mlp}/fc1")
        b.linear(sd, f"{tprefix}.{mlp}.fc2", f"{fprefix}/{mlp}/fc2")
    for se in ("depth_se", "context_se"):
        b.linear(sd, f"{tprefix}.{se}.conv_reduce", f"{fprefix}/{se}/conv_reduce")
        b.linear(sd, f"{tprefix}.{se}.conv_expand", f"{fprefix}/{se}/conv_expand")
    # depth_conv: 0..2 BasicBlock, 3 ASPP, 4 DCN, 5 final 1x1
    for i in range(3):
        t = f"{tprefix}.depth_conv.{i}"
        f = f"{fprefix}/depth_block{i}"
        b.conv2d(sd, f"{t}.conv1", f"{f}/conv1")
        b.bn(sd, f"{t}.bn1", f"{f}/bn1")
        b.conv2d(sd, f"{t}.conv2", f"{f}/conv2")
        b.bn(sd, f"{t}.bn2", f"{f}/bn2")
    ta = f"{tprefix}.depth_conv.3"
    fa = f"{fprefix}/aspp"
    for i in range(1, 5):
        b.conv2d(sd, f"{ta}.aspp{i}.atrous_conv", f"{fa}/aspp{i}/atrous_conv")
        b.bn(sd, f"{ta}.aspp{i}.bn", f"{fa}/aspp{i}/bn")
    b.conv2d(sd, f"{ta}.global_avg_pool.1", f"{fa}/gap_conv")
    b.bn(sd, f"{ta}.global_avg_pool.2", f"{fa}/gap_bn")
    b.conv2d(sd, f"{ta}.conv1", f"{fa}/conv1")
    b.bn(sd, f"{ta}.bn1", f"{fa}/bn1")
    # DCN: conv_offset + deformable weight [O, I/g, 3, 3]
    td = f"{tprefix}.depth_conv.4"
    b.conv2d(sd, f"{td}.conv_offset", f"{fprefix}/dcn/conv_offset")
    w = sd[f"{td}.weight"]  # [O, I/g, kh, kw]
    b._set(b.params, f"{fprefix}/dcn/weight", np.transpose(w, (2, 3, 1, 0)))
    b.conv2d(sd, f"{tprefix}.depth_conv.5", f"{fprefix}/depth_pred")


def convert_sparse_enc8x(b, sd, tprefix, fprefix):
    b.spconv(sd, f"{tprefix}.conv_input.0", f"{fprefix}/conv_input")
    b.gn(sd, f"{tprefix}.conv_input.1", f"{fprefix}/gn_input")
    for lvl in (1, 2, 3):
        t = f"{tprefix}.conv{lvl}"
        b.spconv(sd, f"{t}.0.0", f"{fprefix}/down{lvl}")
        b.masked_bn(sd, f"{t}.0.1", f"{fprefix}/down{lvl}/norm/bn")
        for blk in (1, 2):
            tb = f"{t}.{blk}.net"
            fb = f"{fprefix}/res{lvl}_{blk - 1}"
            b.spconv(sd, f"{tb}.0", f"{fb}/conv1")
            b.masked_bn(sd, f"{tb}.1", f"{fb}/norm1/bn")
            b.spconv(sd, f"{tb}.3", f"{fb}/conv2")
            b.masked_bn(sd, f"{tb}.4", f"{fb}/norm2/bn")
    b.spconv(sd, f"{tprefix}.conv_out.0", f"{fprefix}/conv_out")
    b.gn(sd, f"{tprefix}.conv_out.1", f"{fprefix}/gn_out")


def convert_sparse_encoder_hd(
        b, sd, tprefix, fprefix,
        encoder_channels=((16, 16, 32), (32, 32, 64), (64, 64, 128),
                          (128, 128))):
    """SparseEncoderHD (reference coocc/voxel_encoder/sparse_encoder_hd.py
    :11-209, block_type='basicblock'): conv_input Sequential(SubM, BN1d),
    encoder_layers.encoder_layer{i+1}.{j} = SparseBasicBlock
    (conv1/norm1/conv2/norm2) or, for the last block of a non-final stage,
    Sequential(SparseConv3d, BN1d); conv_out Sequential(SparseConv3d, BN1d).
    """
    b.spconv(sd, f"{tprefix}.conv_input.0", f"{fprefix}/conv_input")
    b.masked_bn(sd, f"{tprefix}.conv_input.1", f"{fprefix}/norm_input/bn")
    n_stages = len(encoder_channels)
    for i, blocks in enumerate(encoder_channels):
        t_stage = f"{tprefix}.encoder_layers.encoder_layer{i + 1}"
        for j in range(len(blocks)):
            strided = (j == len(blocks) - 1) and (i != n_stages - 1)
            if strided:
                b.spconv(sd, f"{t_stage}.{j}.0",
                         f"{fprefix}/stage{i}_down")
                b.masked_bn(sd, f"{t_stage}.{j}.1",
                            f"{fprefix}/stage{i}_down/norm/bn")
            else:
                fb = f"{fprefix}/stage{i}_block{j}"
                b.spconv(sd, f"{t_stage}.{j}.conv1", f"{fb}/conv1")
                b.masked_bn(sd, f"{t_stage}.{j}.norm1", f"{fb}/norm1/bn")
                b.spconv(sd, f"{t_stage}.{j}.conv2", f"{fb}/conv2")
                b.masked_bn(sd, f"{t_stage}.{j}.norm2", f"{fb}/norm2/bn")
    b._set(b.params, f"{fprefix}/conv_out_weight",
           spconv_w(sd[f"{tprefix}.conv_out.0.weight"]))
    b.masked_bn(sd, f"{tprefix}.conv_out.1", f"{fprefix}/norm_out/bn")


def convert_swin(b, sd, tprefix, fprefix, depths=(2, 2, 6, 2),
                 out_indices=(0, 1, 2, 3)):
    """Swin backbone (reference swintransformer.py:465-770, mmdet naming).

    Handles the two layout deltas: torch Linear transposes, and the mmcv
    PatchMerging Unfold channel order (CHANNEL-major c*4+pos) vs our
    position-major 2x2 concat (pos*C+c) — the reduction weight's input dim
    and the pre-reduction LayerNorm are permuted accordingly.
    """
    b._set(b.params, f"{fprefix}/patch_embed/kernel",
           conv2d_w(sd[f"{tprefix}.patch_embed.projection.weight"]))
    b._set(b.params, f"{fprefix}/patch_embed/bias",
           sd[f"{tprefix}.patch_embed.projection.bias"])
    b.ln(sd, f"{tprefix}.patch_embed.norm", f"{fprefix}/patch_norm")
    for i, d in enumerate(depths):
        for blk in range(d):
            t = f"{tprefix}.stages.{i}.blocks.{blk}"
            f = f"{fprefix}/stage{i}_block{blk}"
            b.ln(sd, f"{t}.norm1", f"{f}/norm1")
            b._set(b.params, f"{f}/attn/relative_position_bias_table",
                   sd[f"{t}.attn.w_msa.relative_position_bias_table"])
            b.dense(sd, f"{t}.attn.w_msa.qkv", f"{f}/attn/qkv")
            b.dense(sd, f"{t}.attn.w_msa.proj", f"{f}/attn/proj")
            b.ln(sd, f"{t}.norm2", f"{f}/norm2")
            b.dense(sd, f"{t}.ffn.layers.0.0", f"{f}/ffn_fc1")
            b.dense(sd, f"{t}.ffn.layers.1", f"{f}/ffn_fc2")
        if i < len(depths) - 1:
            t = f"{tprefix}.stages.{i}.downsample"
            f = f"{fprefix}/downsample{i}"
            w = np.asarray(sd[f"{t}.reduction.weight"])   # [out, 4C] c-major
            C = w.shape[1] // 4
            q = np.arange(w.shape[1])
            r = (q % C) * 4 + q // C                      # flax pos-major -> ref
            b._set(b.params, f"{f}/reduction/kernel", w[:, r].T)
            b._set(b.params, f"{f}/norm/scale",
                   np.asarray(sd[f"{t}.norm.weight"])[r])
            b._set(b.params, f"{f}/norm/bias",
                   np.asarray(sd[f"{t}.norm.bias"])[r])
    for i in out_indices:
        b.ln(sd, f"{tprefix}.norm{i}", f"{fprefix}/out_norm{i}")


def convert_efficientnet(b, sd, tprefix, fprefix, arch="b0",
                         out_indices=(2, 3, 4, 5)):
    """EfficientNet backbone (reference efficientnet.py:275-520, mmdet
    naming: layers.0 stem ConvModule, layers.{i}.{j} blocks with
    expand_conv/depthwise_conv/se.conv1/se.conv2/linear_conv (MBConv) or
    conv1/conv2 (fused-MBConv), trailing ConvModule when reached)."""
    from ..nn.efficientnet import scaled_layers

    for si, stage in enumerate(scaled_layers(arch)):
        if si > max(out_indices):
            break
        for bi, (k, oc, se, s, e, bt) in enumerate(stage):
            f = f"{fprefix}/stage{si}_block{bi}"
            if bt == -1:                       # plain ConvModule layer
                t = f"{tprefix}.layers.{si}"
                b.conv2d(sd, f"{t}.conv", f)
                b.bn(sd, f"{t}.bn", f"{f}/bn")
                continue
            t = f"{tprefix}.layers.{si}.{bi}"
            if bt == 1:                        # EdgeResidual (fused-MBConv)
                b.conv2d(sd, f"{t}.conv1.conv", f"{f}/expand")
                b.bn(sd, f"{t}.conv1.bn", f"{f}/expand/bn")
                if se > 0:
                    b.conv2d(sd, f"{t}.se.conv1.conv", f"{f}/se/fc1")
                    b.conv2d(sd, f"{t}.se.conv2.conv", f"{f}/se/fc2")
                b.conv2d(sd, f"{t}.conv2.conv", f"{f}/project")
                b.bn(sd, f"{t}.conv2.bn", f"{f}/project/bn")
            else:                              # InvertedResidual (MBConv)
                if e != 1:
                    b.conv2d(sd, f"{t}.expand_conv.conv", f"{f}/expand")
                    b.bn(sd, f"{t}.expand_conv.bn", f"{f}/expand/bn")
                b.conv2d(sd, f"{t}.depthwise_conv.conv", f"{f}/dw")
                b.bn(sd, f"{t}.depthwise_conv.bn", f"{f}/dw/bn")
                if se > 0:
                    b.conv2d(sd, f"{t}.se.conv1.conv", f"{f}/se/fc1")
                    b.conv2d(sd, f"{t}.se.conv2.conv", f"{f}/se/fc2")
                b.conv2d(sd, f"{t}.linear_conv.conv", f"{f}/project")
                b.bn(sd, f"{t}.linear_conv.bn", f"{f}/project/bn")


def convert_second3d(b, sd, tprefix, fprefix, layer_nums):
    """SECOND3D blocks (reference coocc/backbones/second3d.py:53-77):
    blocks.{i} = Sequential(conv, bn, relu, [conv, bn, relu] * layer_num)."""
    for i, n in enumerate(layer_nums):
        for j in range(n + 1):
            b.conv3d(sd, f"{tprefix}.blocks.{i}.{3 * j}",
                     f"{fprefix}/block{i}_conv{j}")
            b.bn(sd, f"{tprefix}.blocks.{i}.{3 * j + 1}",
                 f"{fprefix}/block{i}_bn{j}")


def convert_second3d_fpn(b, sd, tprefix, fprefix, upsample_strides,
                         use_conv_for_no_stride=True, extra_num_conv=3):
    """SECOND3DFPN deblocks + extra_blocks (second3d_fpn.py:48-107)."""
    for i, s in enumerate(upsample_strides):
        t = f"{tprefix}.deblocks.{i}"
        if s > 1 or (s == 1 and not use_conv_for_no_stride):
            b.deconv(sd, f"{t}.0", f"{fprefix}/deblock{i}_deconv",
                     three_d=True)
        else:
            b.conv3d(sd, f"{t}.0", f"{fprefix}/deblock{i}_conv")
        b.bn(sd, f"{t}.1", f"{fprefix}/deblock{i}_bn")
    for j in range(extra_num_conv):
        b.conv3d(sd, f"{tprefix}.extra_blocks.{3 * j}",
                 f"{fprefix}/extra{j}_conv")
        b.bn(sd, f"{tprefix}.extra_blocks.{3 * j + 1}",
             f"{fprefix}/extra{j}_bn")


def convert_bifuser(b, sd, tprefix, fprefix):
    b.dense(sd, f"{tprefix}.knn_enc.0", f"{fprefix}/knn_enc/linear")
    b.conv3d(sd, f"{tprefix}.con_enc.0", f"{fprefix}/con_enc0")
    b.bn(sd, f"{tprefix}.con_enc.1", f"{fprefix}/con_bn0")
    b.conv3d(sd, f"{tprefix}.con_enc.3", f"{fprefix}/con_enc1")
    b.bn(sd, f"{tprefix}.con_enc.4", f"{fprefix}/con_bn1")


def convert_resnet3d(b, sd, tprefix, fprefix, layers=(2, 2, 2, 2)):
    b.conv3d(sd, f"{tprefix}.input_proj.0", f"{fprefix}/input_proj_conv")
    b.bn(sd, f"{tprefix}.input_proj.1", f"{fprefix}/input_proj_bn")
    for i, n in enumerate(layers):
        for j in range(n):
            t = f"{tprefix}.layers.{i}.{j}"
            f = f"{fprefix}/layer{i}_{j}"
            b.conv3d(sd, f"{t}.conv1", f"{f}/conv1")
            b.bn(sd, f"{t}.bn1", f"{f}/bn1")
            b.conv3d(sd, f"{t}.conv2", f"{f}/conv2")
            b.bn(sd, f"{t}.bn2", f"{f}/bn2")
            if f"{t}.downsample.0.weight" in sd:
                b.conv3d(sd, f"{t}.downsample.0", f"{f}/downsample_conv")
                b.bn(sd, f"{t}.downsample.1", f"{f}/downsample_bn")


def convert_fpn3d(b, sd, tprefix, fprefix, n_levels=4):
    # our _ConvNormReLU3D nests Conv3d under "conv" and BatchNorm under "bn"
    # (each wrapper adds its own inner scope), hence the doubled path parts
    for i in range(n_levels):
        b.conv3d(sd, f"{tprefix}.lateral_convs.{i}.0.conv",
                 f"{fprefix}/lateral{i}/conv")
        b.bn(sd, f"{tprefix}.lateral_convs.{i}.0.bn",
             f"{fprefix}/lateral{i}/bn")
        b.conv3d(sd, f"{tprefix}.fpn_convs.{i}.0.conv",
                 f"{fprefix}/fpn{i}/conv")
        b.bn(sd, f"{tprefix}.fpn_convs.{i}.0.bn", f"{fprefix}/fpn{i}/bn")


def convert_occ_head(b, sd, tprefix, fprefix, num_level=4):
    # _OccConv nests Conv3d under "conv" and BatchNorm under "bn"
    for i in range(num_level):
        b.conv3d(sd, f"{tprefix}.occ_convs.{i}.0",
                 f"{fprefix}/occ_conv{i}/conv")
        b.bn(sd, f"{tprefix}.occ_convs.{i}.1", f"{fprefix}/occ_conv{i}/bn")
    b.conv3d(sd, f"{tprefix}.occ_pred_conv.0", f"{fprefix}/pred_conv0")
    b.bn(sd, f"{tprefix}.occ_pred_conv.1", f"{fprefix}/pred_bn")
    b.conv3d(sd, f"{tprefix}.occ_pred_conv.3", f"{fprefix}/pred_conv1")
    if f"{tprefix}.voxel_soft_weights.0.weight" in sd:
        b.conv3d(sd, f"{tprefix}.voxel_soft_weights.0",
                 f"{fprefix}/soft_w_conv0")
        b.bn(sd, f"{tprefix}.voxel_soft_weights.1", f"{fprefix}/soft_w_bn")
        b.conv3d(sd, f"{tprefix}.voxel_soft_weights.3",
                 f"{fprefix}/soft_w_conv1")
    if f"{tprefix}.fine_mlp.0.weight" in sd:
        b.dense(sd, f"{tprefix}.fine_mlp.0", f"{fprefix}/fine_mlp_fc1/linear")
        b._set(b.params, f"{fprefix}/fine_mlp_gn/gn/scale",
               sd[f"{tprefix}.fine_mlp.1.weight"])
        b._set(b.params, f"{fprefix}/fine_mlp_gn/gn/bias",
               sd[f"{tprefix}.fine_mlp.1.bias"])
        b.dense(sd, f"{tprefix}.fine_mlp.3", f"{fprefix}/fine_mlp_fc2/linear")
    if f"{tprefix}.img_mlp_0.0.weight" in sd:
        # img_mlp_0 conv is a bare nn.Conv (kernel directly under the scope)
        b._set(b.params, f"{fprefix}/img_mlp_0_conv/kernel",
               conv2d_w(sd[f"{tprefix}.img_mlp_0.0.weight"]))
        b._set(b.params, f"{fprefix}/img_mlp_0_conv/bias",
               sd[f"{tprefix}.img_mlp_0.0.bias"])
        b._set(b.params, f"{fprefix}/img_mlp_0_gn/gn/scale",
               sd[f"{tprefix}.img_mlp_0.1.weight"])
        b._set(b.params, f"{fprefix}/img_mlp_0_gn/gn/bias",
               sd[f"{tprefix}.img_mlp_0.1.bias"])
        b.dense(sd, f"{tprefix}.img_mlp.0", f"{fprefix}/img_mlp_fc/linear")
        b._set(b.params, f"{fprefix}/img_mlp_gn/gn/scale",
               sd[f"{tprefix}.img_mlp.1.weight"])
        b._set(b.params, f"{fprefix}/img_mlp_gn/gn/bias",
               sd[f"{tprefix}.img_mlp.1.bias"])


def convert_nerf_mlp(b, sd, tprefix, fprefix, depth):
    for i in range(depth):
        b.dense(sd, f"{tprefix}.hidden_layers.{i}", f"{fprefix}/hidden{i}")
    b.dense(sd, f"{tprefix}.output_layer", f"{fprefix}/output")


def convert_coocc_ray(state_dict: Dict[str, Any], cfg) -> Dict:
    """Full COOCC_Ray torch state_dict -> flax variables dict."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    b = ParamTreeBuilder()
    if cfg.use_camera:
        if cfg.img_backbone.type == "SwinTransformer":
            convert_swin(b, sd, "img_backbone", "img_backbone",
                         cfg.img_backbone.swin_depths,
                         cfg.img_backbone.out_indices)
        else:
            convert_resnet(b, sd, "img_backbone", "img_backbone",
                           cfg.img_backbone.depth)
        convert_second_fpn(b, sd, "img_neck", "img_neck",
                           cfg.img_neck.upsample_strides)
        convert_depthnet(b, sd, "img_view_transformer.depth_net",
                         "img_view_transformer/depth_net")
    if cfg.use_lidar and cfg.pts is not None:
        if cfg.pts.encoder in ("SparseLiDAREnc8x", "SparseLiDAREnc4x"):
            convert_sparse_enc8x(b, sd, "pts_middle_encoder",
                                 "pts_middle_encoder")
        elif cfg.pts.encoder == "SparseEncoderHD" \
                and "pts_middle_encoder.conv_input.0.weight" in sd:
            convert_sparse_encoder_hd(b, sd, "pts_middle_encoder",
                                      "pts_middle_encoder")
        if cfg.second3d is not None \
                and "pts_backbone.blocks.0.0.weight" in sd:
            convert_second3d(b, sd, "pts_backbone", "pts_backbone",
                             cfg.second3d.layer_nums)
            convert_second3d_fpn(
                b, sd, "pts_neck", "pts_neck",
                cfg.second3d.fpn_upsample_strides,
                extra_num_conv=cfg.second3d.fpn_extra_num_conv)
    if cfg.fuser is not None:
        convert_bifuser(b, sd, "occ_fuser", "occ_fuser")
    convert_resnet3d(b, sd, "semantic_encoder", "semantic_encoder")
    convert_fpn3d(b, sd, "semantic_neck", "semantic_neck")
    convert_occ_head(b, sd, "pts_bbox_head", "pts_bbox_head",
                     cfg.occ_head.num_level)
    if f"sigma_head.hidden_layers.0.weight" in sd:
        convert_nerf_mlp(b, sd, "sigma_head", "renderer/sigma_head", 1)
    if f"rgb_head.hidden_layers.0.weight" in sd:
        convert_nerf_mlp(b, sd, "rgb_head", "renderer/rgb_head", 3)
    return {"params": b.params, "batch_stats": b.batch_stats}


def load_torch_checkpoint(path: str, model, sample_batch):
    """Load a reference .pth and return flax variables for `model`."""
    import torch
    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items()}
    variables = convert_coocc_ray(sd, model.cfg)
    # structural check against a fresh init
    import jax
    ref = model.init({"params": jax.random.PRNGKey(0)}, sample_batch,
                     train=False)
    missing = _tree_diff(ref["params"], variables["params"])
    if missing:
        import logging
        logging.getLogger("coocc_tpu").warning(
            "checkpoint conversion missing %d param leaves, e.g. %s",
            len(missing), missing[:5])
        variables = _fill_missing(ref, variables)
    return variables


def _tree_diff(ref, got, prefix=""):
    missing = []
    for k, v in ref.items():
        p = f"{prefix}/{k}"
        if k not in got:
            missing.extend(_leaves(v, p))
        elif isinstance(v, dict):
            missing.extend(_tree_diff(v, got[k], p))
    return missing


def _leaves(tree, prefix):
    if not isinstance(tree, dict):
        return [prefix]
    out = []
    for k, v in tree.items():
        out.extend(_leaves(v, f"{prefix}/{k}"))
    return out


def _fill_missing(ref, got):
    """Overlay converted leaves onto a fresh init (keeps missing at init)."""
    def merge(r, g):
        if not isinstance(r, dict):
            return g if g is not None else r
        out = {}
        for k, v in r.items():
            out[k] = merge(v, g.get(k) if isinstance(g, dict) else None)
        return out

    return {
        "params": merge(ref["params"], got.get("params", {})),
        "batch_stats": merge(ref.get("batch_stats", {}),
                             got.get("batch_stats", {})),
    }
