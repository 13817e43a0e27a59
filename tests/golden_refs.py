"""Torch replica modules with the reference's exact state_dict key names.

The reference plugin can't be imported here (mmcv/mmdet3d aren't installed),
so each replica re-creates the reference module in plain torch, matching

  * the parameter/buffer KEY NAMES of the real checkpoints (so the converter
    name-map is exercised end to end), and
  * the forward semantics (so activations can be compared numerically).

Source structures (reference file:line):
  CustomResNet3D   coocc/backbones/resnet3d.py:106-205 (+BasicBlock :1-60)
  FPN3D            coocc/necks/fpn3d.py:14-108
  OccHead (coarse) coocc/dense_heads/occ_head.py:101-171
  DepthNet         image2bev/ViewTransformerLSSBEVDepth.py:382-549
  SECONDFPN        mmdetection3d/mmdet3d/models/necks/second_fpn.py:12-94
  ResNet           mmdet ResNet ('pytorch' style) as configured at
                   coocc_multi_r50_256x704.py:97-106
  SECOND3D(FPN)    coocc/backbones/second3d.py:12-114,
                   coocc/necks/second3d_fpn.py:12-143 (coocc_lidar.py:113-130)
  MLP (NeRF heads) utils/nerf_mlp.py:14-105

All norms are BatchNorm (the shipped configs override every GN default with
SyncBN, coocc_multi_r50_256x704.py:132-158) except the cascade's GroupNorms.
"""
from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


def randomize_bn_stats(module, rng):
    """Give every BN non-trivial running stats/affine so conversion of the
    batch_stats collection is actually exercised."""
    for m in module.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d, nn.BatchNorm3d)):
            C = m.running_mean.shape[0]
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(C).astype("float32") * 0.3))
            m.running_var.copy_(torch.from_numpy(
                (rng.rand(C).astype("float32") * 1.5 + 0.2)))
            m.weight.data.copy_(torch.from_numpy(
                rng.rand(C).astype("float32") + 0.5))
            m.bias.data.copy_(torch.from_numpy(
                rng.randn(C).astype("float32") * 0.1))


class ConvModule3d(nn.Module):
    """mmcv ConvModule(conv, norm, act) with its child names (conv, bn)."""

    def __init__(self, cin, cout, k, s=1, p=0):
        super().__init__()
        self.conv = nn.Conv3d(cin, cout, k, s, p, bias=False)
        self.bn = nn.BatchNorm3d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class BasicBlock3d(nn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv3d(cin, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm3d(planes)
        self.conv2 = nn.Conv3d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm3d(planes)
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = nn.Sequential(
                nn.Conv3d(cin, planes, 1, stride, bias=False),
                nn.BatchNorm3d(planes))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        identity = self.downsample(x) if self.downsample is not None else x
        return F.relu(out + identity)


class TorchCustomResNet3D(nn.Module):
    def __init__(self, cin, block_inplanes=(8, 16, 32, 64),
                 block_strides=(1, 2, 2, 2), layers=(2, 2, 2, 2)):
        super().__init__()
        self.input_proj = nn.Sequential(
            nn.Conv3d(cin, block_inplanes[0], 1, 1, bias=False),
            nn.BatchNorm3d(block_inplanes[0]),
            nn.ReLU(inplace=True))
        self.layers = nn.ModuleList()
        in_planes = block_inplanes[0]
        for i, planes in enumerate(block_inplanes):
            blocks = [BasicBlock3d(in_planes, planes, block_strides[i])]
            in_planes = planes
            for _ in range(1, layers[i]):
                blocks.append(BasicBlock3d(in_planes, planes))
            self.layers.append(nn.Sequential(*blocks))

    def forward(self, x):
        x = self.input_proj(x)
        outs = []
        for layer in self.layers:
            x = layer(x)
            outs.append(x)
        return outs


class TorchFPN3D(nn.Module):
    def __init__(self, in_channels, out_channels):
        super().__init__()
        self.lateral_convs = nn.ModuleList(
            nn.Sequential(ConvModule3d(c, out_channels, 1, 1, 0))
            for c in in_channels)
        self.fpn_convs = nn.ModuleList(
            nn.Sequential(ConvModule3d(out_channels, out_channels, 3, 1, 1))
            for _ in in_channels)

    def forward(self, inputs):
        laterals = [l(x) for l, x in zip(self.lateral_convs, inputs)]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + F.interpolate(
                laterals[i], size=laterals[i - 1].shape[2:],
                mode="trilinear", align_corners=False)
        return [f(l) for f, l in zip(self.fpn_convs, laterals)]


class TorchOccHeadCoarse(nn.Module):
    """Coarse path of OccHead (occ_convs + soft weights + pred conv)."""

    def __init__(self, in_channels, out_channel, soft_weights=True):
        super().__init__()
        self.num_level = len(in_channels)
        self.soft_weights = soft_weights
        self.occ_convs = nn.ModuleList()
        for c in in_channels:
            mid = c // 2
            self.occ_convs.append(nn.Sequential(
                nn.Conv3d(c, mid, 3, 1, 1, bias=False),
                nn.BatchNorm3d(mid), nn.ReLU(inplace=True)))
        mid = in_channels[-1] // 2
        self.occ_pred_conv = nn.Sequential(
            nn.Conv3d(mid, mid // 2, 1, bias=False),
            nn.BatchNorm3d(mid // 2), nn.ReLU(inplace=True),
            nn.Conv3d(mid // 2, out_channel, 1, bias=False))
        if soft_weights:
            self.voxel_soft_weights = nn.Sequential(
                nn.Conv3d(mid, mid // 2, 1, bias=False),
                nn.BatchNorm3d(mid // 2), nn.ReLU(inplace=True),
                nn.Conv3d(mid // 2, self.num_level, 1, bias=False))

    def forward(self, voxel_feats):
        outs = [conv(f) for conv, f in zip(self.occ_convs, voxel_feats)]
        if self.soft_weights:
            w = torch.softmax(self.voxel_soft_weights(outs[0]), dim=1)
        else:
            w = torch.ones(outs[0].shape[0], self.num_level, 1, 1, 1) \
                / self.num_level
        H, W, D = outs[0].shape[2:]
        blended = 0
        for f, wi in zip(outs, torch.unbind(w, dim=1)):
            f = F.interpolate(f, size=[H, W, D], mode="trilinear",
                              align_corners=False)
            blended = blended + f * wi.unsqueeze(1)
        return self.occ_pred_conv(blended)


class Mlp(nn.Module):
    def __init__(self, cin, hidden, cout):
        super().__init__()
        self.fc1 = nn.Linear(cin, hidden)
        self.fc2 = nn.Linear(hidden, cout)

    def forward(self, x):
        return self.fc2(F.relu(self.fc1(x)))


class SELayer(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.conv_reduce = nn.Conv2d(channels, channels, 1, bias=True)
        self.conv_expand = nn.Conv2d(channels, channels, 1, bias=True)

    def forward(self, x, x_se):
        x_se = self.conv_reduce(x_se)
        x_se = F.relu(x_se)
        x_se = self.conv_expand(x_se)
        return x * torch.sigmoid(x_se)


class _ASPPModule(nn.Module):
    def __init__(self, cin, planes, k, padding, dilation):
        super().__init__()
        self.atrous_conv = nn.Conv2d(cin, planes, k, 1, padding,
                                     dilation, bias=False)
        self.bn = nn.BatchNorm2d(planes)

    def forward(self, x):
        return F.relu(self.bn(self.atrous_conv(x)))


class ASPP(nn.Module):
    def __init__(self, inplanes, mid_channels):
        super().__init__()
        self.aspp1 = _ASPPModule(inplanes, mid_channels, 1, 0, 1)
        self.aspp2 = _ASPPModule(inplanes, mid_channels, 3, 6, 6)
        self.aspp3 = _ASPPModule(inplanes, mid_channels, 3, 12, 12)
        self.aspp4 = _ASPPModule(inplanes, mid_channels, 3, 18, 18)
        self.global_avg_pool = nn.Sequential(
            nn.AdaptiveAvgPool2d((1, 1)),
            nn.Conv2d(inplanes, mid_channels, 1, bias=False),
            nn.BatchNorm2d(mid_channels), nn.ReLU())
        self.conv1 = nn.Conv2d(mid_channels * 5, mid_channels, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid_channels)

    def forward(self, x):
        x1, x2 = self.aspp1(x), self.aspp2(x)
        x3, x4 = self.aspp3(x), self.aspp4(x)
        x5 = self.global_avg_pool(x)
        x5 = F.interpolate(x5, size=x4.shape[2:], mode="bilinear",
                           align_corners=True)
        y = torch.cat((x1, x2, x3, x4, x5), dim=1)
        return F.relu(self.bn1(self.conv1(y)))  # Dropout(0.5) is eval-off


class BasicBlock2d(nn.Module):
    """mmdet BasicBlock (stride 1) as used in depth_conv."""

    def __init__(self, planes):
        super().__init__()
        self.conv1 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + x)


class DCNZeroOffset(nn.Module):
    """mmcv DeformConv2dPack key layout (weight + conv_offset.*).

    conv_offset is zero-initialized here (the mmcv layer zero-inits it too);
    with zero offsets a deformable conv IS a regular grouped conv, so the
    forward uses F.conv2d — our jax op is separately oracle-verified for
    nonzero offsets (tests/test_dcn.py).
    """

    def __init__(self, channels, groups=4):
        super().__init__()
        self.groups = groups
        self.weight = nn.Parameter(
            torch.randn(channels, channels // groups, 3, 3) * 0.1)
        self.conv_offset = nn.Conv2d(channels, 18, 3, 1, 1, bias=True)
        nn.init.zeros_(self.conv_offset.weight)
        nn.init.zeros_(self.conv_offset.bias)

    def forward(self, x):
        return F.conv2d(x, self.weight, None, 1, 1, 1, self.groups)


class TorchDepthNet(nn.Module):
    def __init__(self, in_channels, mid_channels, context_channels,
                 depth_channels, cam_channels=27):
        super().__init__()
        self.reduce_conv = nn.Sequential(
            nn.Conv2d(in_channels, mid_channels, 3, 1, 1),
            nn.BatchNorm2d(mid_channels), nn.ReLU(inplace=True))
        self.context_conv = nn.Conv2d(mid_channels, context_channels, 1)
        self.bn = nn.BatchNorm1d(cam_channels)
        self.depth_mlp = Mlp(cam_channels, mid_channels, mid_channels)
        self.depth_se = SELayer(mid_channels)
        self.context_mlp = Mlp(cam_channels, mid_channels, mid_channels)
        self.context_se = SELayer(mid_channels)
        self.depth_conv = nn.Sequential(
            BasicBlock2d(mid_channels), BasicBlock2d(mid_channels),
            BasicBlock2d(mid_channels),
            ASPP(mid_channels, mid_channels),
            DCNZeroOffset(mid_channels, groups=4),
            nn.Conv2d(mid_channels, depth_channels, 1))

    def forward(self, x, mlp_input):
        mlp_input = self.bn(mlp_input.reshape(-1, mlp_input.shape[-1]))
        x = self.reduce_conv(x)
        context_se = self.context_mlp(mlp_input)[..., None, None]
        context = self.context_se(x, context_se)
        context = self.context_conv(context)
        depth_se = self.depth_mlp(mlp_input)[..., None, None]
        depth = self.depth_se(x, depth_se)
        depth = self.depth_conv(depth)
        return torch.cat([depth, context], dim=1)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride != 1 or cin != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        identity = self.downsample(x) if self.downsample is not None else x
        return F.relu(out + identity)


class TorchResNet50(nn.Module):
    def __init__(self, layers=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for i, n in enumerate(layers):
            planes = 64 * 2 ** i
            stride = 1 if i == 0 else 2
            blocks = [Bottleneck(cin, planes, stride)]
            cin = planes * 4
            blocks += [Bottleneck(cin, planes) for _ in range(1, n)]
            setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        outs = []
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
            outs.append(x)
        return outs


class TorchSECONDFPN(nn.Module):
    """mmdet3d SECONDFPN (deblocks: deconv/conv + BN(1e-3, 0.01) + ReLU)."""

    def __init__(self, in_channels, out_channels, upsample_strides):
        super().__init__()
        deblocks = []
        for cin, cout, s in zip(in_channels, out_channels, upsample_strides):
            if s > 1 or s == 1:
                up = nn.ConvTranspose2d(cin, cout, int(s), int(s), bias=False)
            else:
                k = int(round(1 / s))
                up = nn.Conv2d(cin, cout, k, k, bias=False)
            deblocks.append(nn.Sequential(
                up, nn.BatchNorm2d(cout, eps=1e-3, momentum=0.01),
                nn.ReLU(inplace=True)))
        self.deblocks = nn.ModuleList(deblocks)

    def forward(self, feats):
        ups = [d(f) for d, f in zip(self.deblocks, feats)]
        return torch.cat(ups, dim=1) if len(ups) > 1 else ups[0]


class TorchSECOND3D(nn.Module):
    def __init__(self, in_channels, out_channels, layer_nums, layer_strides,
                 is_cascade=False):
        super().__init__()
        self.is_cascade = is_cascade
        ins = list(in_channels) if isinstance(in_channels, (list, tuple)) \
            else [in_channels]
        if is_cascade:
            # cascade chains block outputs (second3d.py:41)
            in_filters = [ins[0], *out_channels[:-1]]
        else:
            # non-cascade feeds every block the original input
            # (second3d.py:39,104-109); broadcast a 1-tuple for tests
            in_filters = ins if len(ins) == len(out_channels) \
                else [ins[0]] * len(out_channels)
        blocks = []
        for i, n in enumerate(layer_nums):
            s = layer_strides[i]
            block = [nn.Conv3d(in_filters[i], out_channels[i], (1, 3, 3),
                               (1, s, s), (0, 1, 1), bias=False),
                     nn.BatchNorm3d(out_channels[i], eps=1e-3, momentum=0.01),
                     nn.ReLU(inplace=True)]
            for _ in range(n):
                block += [nn.Conv3d(out_channels[i], out_channels[i],
                                    (1, 3, 3), 1, (0, 1, 1), bias=False),
                          nn.BatchNorm3d(out_channels[i], eps=1e-3,
                                         momentum=0.01),
                          nn.ReLU(inplace=True)]
            blocks.append(nn.Sequential(*block))
        self.blocks = nn.ModuleList(blocks)

    def forward(self, x):
        outs = []
        for block in self.blocks:
            if self.is_cascade:
                x = block(x)
                outs.append(x)
            else:
                outs.append(block(x))
        return outs


class TorchSECOND3DFPN(nn.Module):
    def __init__(self, in_channels, out_channels, upsample_strides,
                 extra_num_conv=3, use_conv_for_no_stride=True):
        super().__init__()
        deblocks = []
        for cin, cout, s in zip(in_channels, out_channels, upsample_strides):
            if s > 1 or (s == 1 and not use_conv_for_no_stride):
                up = nn.ConvTranspose3d(cin, cout, (1, s, s), (1, s, s),
                                        bias=False)
            else:
                up = nn.Conv3d(cin, cout, (1, 1, 1), (1, 1, 1), bias=False)
            deblocks.append(nn.Sequential(
                up, nn.BatchNorm3d(cout, eps=1e-3, momentum=0.01),
                nn.ReLU(inplace=True)))
        self.deblocks = nn.ModuleList(deblocks)
        extra = []
        for _ in range(extra_num_conv):
            extra += [nn.Conv3d(out_channels[-1], out_channels[-1], 3, 1, 1,
                                bias=False),
                      nn.BatchNorm3d(out_channels[-1], eps=1e-3,
                                     momentum=0.01),
                      nn.ReLU(inplace=True)]
        self.extra_blocks = nn.Sequential(*extra)

    def forward(self, feats):
        ups = [d(f) for d, f in zip(self.deblocks, feats)]
        out = sum(ups) if len(ups) > 1 else ups[0]
        return self.extra_blocks(out)


class TorchNeRFMLP(nn.Module):
    """utils/nerf_mlp.py MLP with skip_layer=None, output enabled."""

    def __init__(self, input_dim, output_dim, net_depth, net_width=256):
        super().__init__()
        self.hidden_layers = nn.ModuleList()
        cin = input_dim
        for _ in range(net_depth):
            self.hidden_layers.append(nn.Linear(cin, net_width))
            cin = net_width
        self.output_layer = nn.Linear(cin, output_dim)

    def forward(self, x):
        for layer in self.hidden_layers:
            x = F.relu(layer(x))
        return self.output_layer(x)


# --- round-3 additions: splat / voxelize / sparse-enc / renderer oracles ----


def quickcumsum_splat(volume, geom, dx, bx, nx):
    """Reference pure-torch LSS splat (cumsum trick), Z KEPT.

    Transcribes ViewTransformerLSSBEVDepth.voxel_pooling:197-240 (rank sort +
    QuickCumsum boundary-diff) with the voxel-keeping scatter of the
    LSSVoxel variant (ViewTransformerLSSVoxel.py:100-123): sums the lifted
    [B, N, D, fH, fW, C] volume into a dense [B, X, Y, Z, C] grid.

    volume: [B, N, D, fH, fW, C]; geom: [B, N, D, fH, fW, 3] ego points.
    dx/bx/nx: torch tensors, grid spec (nx int64 [3]).
    """
    B, N, D, H, W, C = volume.shape
    Nprime = B * N * D * H * W
    x = volume.reshape(Nprime, C)
    gf = ((geom - (bx - dx / 2.0)) / dx).long().view(Nprime, 3)
    batch_ix = torch.cat([
        torch.full((Nprime // B, 1), ix, dtype=torch.long)
        for ix in range(B)])
    gf = torch.cat((gf, batch_ix), 1)
    kept = ((gf[:, 0] >= 0) & (gf[:, 0] < nx[0])
            & (gf[:, 1] >= 0) & (gf[:, 1] < nx[1])
            & (gf[:, 2] >= 0) & (gf[:, 2] < nx[2]))
    x, gf = x[kept], gf[kept]
    ranks = (gf[:, 0] * (nx[1] * nx[2] * B)
             + gf[:, 1] * (nx[2] * B) + gf[:, 2] * B + gf[:, 3])
    sorts = ranks.argsort()
    x, gf, ranks = x[sorts], gf[sorts], ranks[sorts]
    # cumsum trick (QuickCumsum.forward, ViewTransformerLSSBEVDepth.py:36-52)
    x = x.cumsum(0)
    keep = torch.ones(x.shape[0], dtype=torch.bool)
    keep[:-1] = ranks[1:] != ranks[:-1]
    x, gf = x[keep], gf[keep]
    x = torch.cat((x[:1], x[1:] - x[:-1]))
    final = torch.zeros((B, int(nx[0]), int(nx[1]), int(nx[2]), C))
    final[gf[:, 3], gf[:, 0], gf[:, 1], gf[:, 2]] = x
    return final


def hard_voxelize_vfe(points, pcr, voxel_size, grid, max_points, max_voxels,
                      num_features=None):
    """Point-order hard voxelization + HardSimpleVFE mean (numpy oracle).

    Replicates the CUDA kernel semantics (mmdetection3d/mmdet3d/ops/voxel/
    src/voxelization_cuda.cu via voxelize.py:10-148): voxels are created in
    first-point-arrival order, capped at max_voxels; each voxel keeps its
    first max_points points; HardSimpleVFE (voxel_encoder.py:13-45) means
    the kept points. Returns (coords [V,3] xyz int, feats [V,F]).
    """
    import numpy as np
    F_dim = points.shape[1] if num_features is None else num_features
    nx, ny, nz = grid
    voxels = {}
    order = []
    for p in points:
        c = np.floor((p[:3] - np.asarray(pcr[:3])) / np.asarray(voxel_size))
        c = c.astype(np.int64)
        if not ((0 <= c[0] < nx) and (0 <= c[1] < ny) and (0 <= c[2] < nz)):
            continue
        key = (int(c[0]), int(c[1]), int(c[2]))
        if key not in voxels:
            if len(voxels) >= max_voxels:
                continue
            voxels[key] = []
            order.append(key)
        if len(voxels[key]) < max_points:
            voxels[key].append(p[:F_dim])
    coords = np.array(order, np.int64).reshape(-1, 3)
    feats = np.stack([np.mean(np.stack(voxels[k]), 0) for k in order]) \
        if order else np.zeros((0, F_dim), np.float32)
    return coords, feats.astype(np.float32)


class SpConvDense(nn.Module):
    """Dense-grid emulation of spconv SubMConv3d / SparseConv3d.

    Weight registered in the spconv2 checkpoint layout [O, kz, ky, kx, I]
    (sparse_lidar_enc.py uses `import spconv.pytorch`); forward runs a dense
    F.conv3d over [B, C, X, Y, Z] with the active-site mask semantics:
      SubM (stride 1):  output active sites == input active sites
      spconv (stride 2): output site active iff any active input in its
                         receptive field (maxpooled mask)
    Exact because inactive dense cells hold zeros — the gather a real SubM
    performs sees the same neighbour values.
    """

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.stride = stride
        self.weight = nn.Parameter(torch.randn(cout, 3, 3, 3, cin) * 0.05)

    def forward(self, x, mask):
        w = self.weight.permute(0, 4, 3, 2, 1)  # -> [O, I, kx, ky, kz]
        # torch CPU conv3d materializes a vol2col buffer of
        # I*27 x out-spatial floats; at real sparse_shape (800x800x64) that
        # is ~70 GB. Route big grids through the shift-add form (27 shifted
        # 1x1 matmuls) — the same convolution, summed per-tap.
        numel_col = x.shape[1] * 27 * (x[0, 0].numel() // self.stride ** 3)
        conv = (_conv3d_shiftadd if numel_col > 2 ** 28
                else lambda a, ww, stride: F.conv3d(a, ww, stride=stride,
                                                    padding=1))
        if self.stride == 1:
            return conv(x, w, stride=1) * mask, mask
        y = conv(x, w, stride=2)
        newmask = (F.max_pool3d(mask, 3, 2, 1) > 0).float()
        return y * newmask, newmask


def _conv3d_shiftadd(x, w, stride=1):
    """3x3x3 conv3d (padding 1) as 27 shifted channel-matmuls.

    Numerically the same convolution as F.conv3d (per-tap fp32 sum order
    differs within tolerance); O(B*I*spatial) transient memory instead of
    the vol2col I*27*spatial buffer.
    """
    B, I = x.shape[:2]
    X, Y, Z = x.shape[2:]
    O = w.shape[0]
    Xo = (X + 2 - 3) // stride + 1
    Yo = (Y + 2 - 3) // stride + 1
    Zo = (Z + 2 - 3) // stride + 1
    xp = F.pad(x, (1, 1, 1, 1, 1, 1))
    y = x.new_zeros(B, O, Xo, Yo, Zo)
    for kx in range(3):
        for ky in range(3):
            for kz in range(3):
                sl = xp[:, :,
                        kx:kx + stride * (Xo - 1) + 1:stride,
                        ky:ky + stride * (Yo - 1) + 1:stride,
                        kz:kz + stride * (Zo - 1) + 1:stride]
                wk = w[:, :, kx, ky, kz]  # [O, I]
                y += torch.einsum("oi,bixyz->boxyz", wk, sl.contiguous())
    return y


def _bn_masked(bn, x, mask):
    """Eval-mode BatchNorm1d over active rows, applied densely + masked."""
    y = F.batch_norm(x, bn.running_mean, bn.running_var, bn.weight, bn.bias,
                     False, 0.0, bn.eps)
    return y * mask


def _gn_per_voxel(gn, x, mask):
    """torch GroupNorm over the [N_active, C] feature rows == per-voxel GN."""
    B, C = x.shape[:2]
    rows = x.permute(0, 2, 3, 4, 1).reshape(-1, C)
    rows = F.group_norm(rows, gn.num_groups, gn.weight, gn.bias, gn.eps)
    y = rows.reshape(B, *x.shape[2:], C).permute(0, 4, 1, 2, 3)
    return y * mask


class SparseBasicBlockDense(nn.Module):
    """SparseBasicBlock (sparse_lidar_enc.py:41-63) on the dense emulation.

    net = (SubM, BN1d, ReLU, SubM, BN1d); residual add; ReLU.
    """

    def __init__(self, c):
        super().__init__()
        self.net = nn.ModuleList([
            SpConvDense(c, c), nn.BatchNorm1d(c), nn.ReLU(True),
            SpConvDense(c, c), nn.BatchNorm1d(c)])

    def forward(self, x, mask):
        idn = x
        y, _ = self.net[0](x, mask)
        y = F.relu(_bn_masked(self.net[1], y, mask))
        y, _ = self.net[3](y, mask)
        y = _bn_masked(self.net[4], y, mask)
        return F.relu(y + idn) * mask, mask


class PostActBlockDense(nn.Module):
    """post_act_block conv_type='spconv' (stride-2 + BN1d + ReLU)."""

    def __init__(self, cin, cout):
        super().__init__()
        # ModuleList indices 0/1 match SparseSequential(conv, norm, relu)
        self.body = nn.ModuleList([SpConvDense(cin, cout, stride=2),
                                   nn.BatchNorm1d(cout), nn.ReLU(True)])

    def forward(self, x, mask):
        y, m = self.body[0](x, mask)
        return F.relu(_bn_masked(self.body[1], y, m)) * m, m


class TorchSparseLiDAREnc8x(nn.Module):
    """Dense-emulated SparseLiDAREnc8x with the reference state_dict names
    (sparse_lidar_enc.py:125-178): conv_input (SubM+GN16), conv1..3
    (stride-2 block + 2 SparseBasicBlocks), conv_out (SubM+GN16).
    Output: dense [B, C, X/8, Y/8, Z/8] (after the reference's
    .dense().permute(0,1,4,3,2) — xyz order).
    """

    def __init__(self, cin=4, base=16, cout=128):
        super().__init__()
        self.conv_input = nn.ModuleList([
            SpConvDense(cin, base), nn.GroupNorm(16, base), nn.ReLU(True)])
        for lvl, (ci, co) in enumerate(
                [(base, base * 2), (base * 2, base * 4), (base * 4, base * 8)],
                start=1):
            blocks = nn.ModuleList([
                PostActBlockDense(ci, co),
                SparseBasicBlockDense(co), SparseBasicBlockDense(co)])
            setattr(self, f"conv{lvl}", blocks)
        self.conv_out = nn.ModuleList([
            SpConvDense(base * 8, cout), nn.GroupNorm(16, cout),
            nn.ReLU(True)])

    def state_dict(self, *a, **kw):
        # remap ModuleList child "body" of PostActBlockDense to the
        # reference's SparseSequential flat index (convN.0.0 / convN.0.1)
        sd = super().state_dict(*a, **kw)
        return {k.replace(".body.", "."): v for k, v in sd.items()}

    def forward(self, x, mask):
        y, m = self.conv_input[0](x, mask)
        y = F.relu(_gn_per_voxel(self.conv_input[1], y, m)) * m
        for lvl in (1, 2, 3):
            blocks = getattr(self, f"conv{lvl}")
            y, m = blocks[0](y, m)
            y, m = blocks[1](y, m)
            y, m = blocks[2](y, m)
        y, m = self.conv_out[0](y, m)
        y = F.relu(_gn_per_voxel(self.conv_out[1], y, m)) * m
        return y, m


def torch_frustum_render(voxel_feats, geom, rgb_head, sigma_head,
                         bounds, scale=16):
    """Transcription of the reference inline renderer (coocc_ray.py:358-433).

    voxel_feats: [C, X, Y, Z]; geom: [N, D, H, W, 3] ego points.
    bounds: (xbound, ybound, zbound) three (lo, hi, step).
    Returns (rgbs [N, H*scale, W*scale, 3], depths [N, H*scale, W*scale]).
    """
    N = geom.shape[0]
    dx = torch.tensor([row[2] for row in bounds])
    bx = torch.tensor([row[0] + row[2] / 2.0 for row in bounds])
    nx = torch.tensor([(row[1] - row[0]) / row[2] for row in bounds])
    rgbs, depths = [], []
    for i in range(N):
        g = ((geom[i] - (bx - dx / 2.0)) / dx)
        inside = ((g[..., 0] >= 0) & (g[..., 0] < nx[0])
                  & (g[..., 1] >= 0) & (g[..., 1] < nx[1])
                  & (g[..., 2] >= 0) & (g[..., 2] < nx[2]))
        g = g.clone()
        g[~inside] *= 0
        D, H, W, _ = g.shape
        pts = g.long().permute(1, 2, 0, 3)  # [H, W, D, 3]
        feat = voxel_feats[:, pts[..., 0], pts[..., 1], pts[..., 2]]
        feat = feat.permute(1, 2, 3, 0)  # [H, W, D, C]
        mask = inside.permute(1, 2, 0)
        rgb = rgb_head(feat)
        rgb[~mask] = 0  # reference quirk: zeroed BEFORE sigmoid
        rgb = torch.sigmoid(rgb)
        sigma = F.relu(sigma_head(feat).squeeze(-1))
        ptsf = pts.float()
        dists = torch.norm(ptsf[:, :, 1:, :] - ptsf[:, :, :-1, :], dim=-1)
        dists = torch.cat(
            [dists, torch.tensor([1e10]).expand(dists[..., :1].shape)], -1)
        alpha = 1.0 - torch.exp(-F.relu(sigma * dists))
        weights = alpha * torch.cumprod(
            torch.cat([torch.ones(H, W, 1), 1.0 - alpha + 1e-10], -1),
            dim=-1)[:, :, :-1]
        rgb_map = torch.sum(weights.unsqueeze(-1) * rgb, dim=-2)
        z_vals = torch.linspace(0, D, D).reshape(1, 1, D)
        depth_map = torch.sum(weights * z_vals, dim=-1)
        depth_map = F.interpolate(depth_map[None, None], scale_factor=scale,
                                  mode="bilinear")[0, 0]
        rgb_map = F.interpolate(rgb_map.permute(2, 0, 1)[None],
                                scale_factor=scale,
                                mode="bilinear")[0].permute(1, 2, 0)
        rgbs.append(rgb_map)
        depths.append(depth_map)
    return torch.stack(rgbs), torch.stack(depths)


# --- full-model forward golden twins (round 3) ------------------------------


def torch_create_frustum(input_size, downsample, dbound):
    """Reference create_frustum (ViewTransformerLSSBEVDepth.py:104-115)."""
    ogfH, ogfW = input_size
    fH, fW = ogfH // downsample, ogfW // downsample
    ds = torch.arange(*dbound, dtype=torch.float).view(-1, 1, 1).expand(
        -1, fH, fW)
    D = ds.shape[0]
    xs = torch.linspace(0, ogfW - 1, fW, dtype=torch.float).view(
        1, 1, fW).expand(D, fH, fW)
    ys = torch.linspace(0, ogfH - 1, fH, dtype=torch.float).view(
        1, fH, 1).expand(D, fH, fW)
    return torch.stack((xs, ys, ds), -1)  # [D, fH, fW, 3]


def torch_get_geometry(frustum, rots, trans, intrins, post_rots, post_trans,
                       bda):
    """Reference get_geometry (ViewTransformerLSSBEVDepth.py:117-150),
    3x3-intrinsics branch."""
    B, N, _ = trans.shape
    points = frustum - post_trans.view(B, N, 1, 1, 1, 3)
    points = torch.inverse(post_rots).view(B, N, 1, 1, 1, 3, 3).matmul(
        points.unsqueeze(-1))
    points = torch.cat(
        (points[:, :, :, :, :, :2] * points[:, :, :, :, :, 2:3],
         points[:, :, :, :, :, 2:3]), 5)
    combine = rots.matmul(torch.inverse(intrins))
    points = combine.view(B, N, 1, 1, 1, 3, 3).matmul(points).squeeze(-1)
    points = points + trans.view(B, N, 1, 1, 1, 3)
    points = bda.view(B, 1, 1, 1, 1, 3, 3).matmul(
        points.unsqueeze(-1)).squeeze(-1)
    return points


def torch_get_mlp_input(rot, tran, intrin, post_rot, post_tran, bda):
    """Reference get_mlp_input (ViewTransformerLSSBEVDepth.py:636-691),
    3x3-intrinsics branch: 15 scalars + flattened 3x4 sensor2ego = 27."""
    B, N = rot.shape[:2]
    bda = bda.view(B, 1, 3, 3).repeat(1, N, 1, 1)
    mlp_input = torch.stack([
        intrin[:, :, 0, 0], intrin[:, :, 1, 1],
        intrin[:, :, 0, 2], intrin[:, :, 1, 2],
        post_rot[:, :, 0, 0], post_rot[:, :, 0, 1], post_tran[:, :, 0],
        post_rot[:, :, 1, 0], post_rot[:, :, 1, 1], post_tran[:, :, 1],
        bda[:, :, 0, 0], bda[:, :, 0, 1], bda[:, :, 1, 0],
        bda[:, :, 1, 1], bda[:, :, 2, 2]], dim=-1)
    sensor2ego = torch.cat([rot, tran.reshape(B, N, 3, 1)],
                           dim=-1).reshape(B, N, -1)
    return torch.cat([mlp_input, sensor2ego], dim=-1)


def window_knn_oracle(key_mask, offsets, k=2):
    """Numpy oracle of coocc_tpu.ops.window_knn semantics: for each cell the
    linear ids of the first k ACTIVE cells in distance-sorted offset order
    (the exact k nearest within the window; ties broken by offset raster
    order as in make_offsets). -1 where fewer than k."""
    import numpy as np
    X, Y, Z = key_mask.shape
    out = np.full((X, Y, Z, k), -1, np.int64)
    km = np.asarray(key_mask)
    for x in range(X):
        for y in range(Y):
            for z in range(Z):
                found = 0
                for (dx, dy, dz) in offsets:
                    nx_, ny_, nz_ = x + dx, y + dy, z + dz
                    if not (0 <= nx_ < X and 0 <= ny_ < Y and 0 <= nz_ < Z):
                        continue
                    if km[nx_, ny_, nz_]:
                        out[x, y, z, found] = (nx_ * Y + ny_) * Z + nz_
                        found += 1
                        if found == k:
                            break
    return out


def window_knn_oracle_vec(key_mask, offsets, k=2):
    """Vectorized window_knn_oracle (same semantics, real-shape speed).

    Scans offsets in the given (distance-sorted) order; per offset a single
    shifted-mask update fills the next free slot for every still-unfilled
    cell. Equivalent to the per-cell loop because the fill order per cell
    is exactly the offset order (pinned vs the scalar oracle in
    test_golden_real_shapes.py at tiny shapes).
    """
    import numpy as np
    X, Y, Z = key_mask.shape
    km = np.asarray(key_mask).astype(bool)
    ids = ((np.arange(X)[:, None, None] * Y
            + np.arange(Y)[None, :, None]) * Z
           + np.arange(Z)[None, None, :]).astype(np.int64)
    out = np.full((X, Y, Z, k), -1, np.int64)
    found = np.zeros((X, Y, Z), np.int64)
    for (dx, dy, dz) in offsets:
        # neighbour (x+dx, y+dy, z+dz) of each cell, validity via slicing
        qs_x = slice(max(0, -dx), X - max(0, dx))
        ks_x = slice(max(0, dx), X + min(0, dx))
        qs_y = slice(max(0, -dy), Y - max(0, dy))
        ks_y = slice(max(0, dy), Y + min(0, dy))
        qs_z = slice(max(0, -dz), Z - max(0, dz))
        ks_z = slice(max(0, dz), Z + min(0, dz))
        if (qs_x.stop <= qs_x.start or qs_y.stop <= qs_y.start
                or qs_z.stop <= qs_z.start):
            continue
        nb_active = km[ks_x, ks_y, ks_z]
        nb_ids = ids[ks_x, ks_y, ks_z]
        f = found[qs_x, qs_y, qs_z]
        for slot in range(k):
            hit = nb_active & (f == slot)
            sub = out[qs_x, qs_y, qs_z, slot]
            sub[hit] = nb_ids[hit]
            out[qs_x, qs_y, qs_z, slot] = sub
        found[qs_x, qs_y, qs_z] = f + nb_active.astype(np.int64)
        if (found >= k).all():
            break
    return out


class TorchBiFuserN(nn.Module):
    """BiFuser_N twin (reference state_dict names, bifuser_n.py:14-174).

    Takes precomputed window-KNN neighbour ids (the index-selection
    semantics are pinned separately by tests/test_window_knn.py against
    window_knn_oracle); replays the numeric path: gather -> knn_enc
    (Linear+ReLU) -> multiply local modality -> concat 4 groups ->
    con_enc (Conv3d+BN3d+ReLU x2). Invalid neighbours contribute zeros
    (our documented deviation from the reference's wrap-to-last quirk)."""

    def __init__(self, c=128, knum=2):
        super().__init__()
        self.knum = knum
        self.con_enc = nn.Sequential(
            nn.Conv3d(c * 4, c * 2, 3, padding=1, bias=False),
            nn.BatchNorm3d(c * 2), nn.ReLU(True),
            nn.Conv3d(c * 2, c, 3, padding=1, bias=False),
            nn.BatchNorm3d(c), nn.ReLU(True))
        self.knn_enc = nn.Sequential(nn.Linear(c * knum, c), nn.ReLU())

    def forward(self, img, pts, nn_img, nn_pts):
        # img/pts: [1, C, X, Y, Z]; nn_*: [X, Y, Z, k] linear raster ids
        iv = img.permute(0, 2, 3, 4, 1)[0]
        pv = pts.permute(0, 2, 3, 4, 1)[0]
        X, Y, Z, C = iv.shape
        k = self.knum

        def gather(f, idx):
            flat = f.reshape(-1, C)
            safe = idx.clamp(min=0)
            g = flat[safe.reshape(-1)].reshape(X, Y, Z, k, C)
            g = g * (idx >= 0)[..., None]
            return g.reshape(X, Y, Z, k * C)

        img_active = (iv.abs().sum(-1) != 0).float()[..., None]
        pts_active = (pv.abs().sum(-1) != 0).float()[..., None]
        fused_img = self.knn_enc(gather(iv, nn_img)) * pv * pts_active
        fused_pts = self.knn_enc(gather(pv, nn_pts)) * iv * img_active
        allf = torch.cat([iv, pv, fused_img, fused_pts], dim=-1)[None]
        return self.con_enc(allf.permute(0, 4, 1, 2, 3))


# ---------------------------------------------------------------------------
# Swin Transformer twin (reference swintransformer.py:20-770, mmdet naming:
# patch_embed.projection/norm, stages.{i}.blocks.{b}.{norm1,attn.w_msa.*,
# norm2,ffn.layers.*}, stages.{i}.downsample.{norm,reduction}, norm{i})
# ---------------------------------------------------------------------------

class _TorchWindowMSA(nn.Module):
    """WindowMSA twin (swintransformer.py:20-124, double_step_seq index)."""

    def __init__(self, dims, heads, ws):
        super().__init__()
        self.num_heads = heads
        self.ws = ws
        self.scale = (dims // heads) ** -0.5
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * ws - 1) ** 2, heads))
        s1 = torch.arange(0, (2 * ws - 1) * ws, 2 * ws - 1)
        s2 = torch.arange(0, ws)
        rel = (s1[:, None] + s2[None, :]).reshape(1, -1)
        self.register_buffer("relative_position_index",
                             (rel + rel.T).flip(1).contiguous())
        self.qkv = nn.Linear(dims, dims * 3)
        self.proj = nn.Linear(dims, dims)

    def forward(self, x, mask=None):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads,
                                  C // self.num_heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(N, N, -1)
        attn = attn + bias.permute(2, 0, 1)[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B // nW, nW, self.num_heads, N, N) \
                + mask[None, :, None]
            attn = attn.view(-1, self.num_heads, N, N)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class _TorchShiftWindowAttn(nn.Module):
    """ShiftWindowMSA twin (swintransformer.py:126-280): pad-to-window,
    cyclic roll, seam mask, partition/reverse."""

    def __init__(self, dims, heads, ws, shift):
        super().__init__()
        self.ws, self.shift = ws, shift
        self.w_msa = _TorchWindowMSA(dims, heads, ws)

    def forward(self, x):  # [B, H, W, C]
        B, H, W, C = x.shape
        ws = self.ws
        pad_r = (ws - W % ws) % ws
        pad_b = (ws - H % ws) % ws
        x = torch.nn.functional.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        Hp, Wp = x.shape[1], x.shape[2]
        if self.shift:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
            img = torch.zeros((1, Hp, Wp, 1))
            cnt = 0
            sl = (slice(0, -ws), slice(-ws, -self.shift),
                  slice(-self.shift, None))
            for h in sl:
                for w in sl:
                    img[:, h, w, :] = cnt
                    cnt += 1
            mw = self._part(img).view(-1, ws * ws)
            mask = mw[:, None] - mw[:, :, None]
            mask = mask.masked_fill(mask != 0, -100.0)
        else:
            mask = None
        wins = self._part(x).view(-1, ws * ws, C)
        wins = self.w_msa(wins, mask)
        x = self._rev(wins.view(-1, ws, ws, C), Hp, Wp)
        if self.shift:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        return x[:, :H, :W]

    def _part(self, x):
        B, H, W, C = x.shape
        ws = self.ws
        x = x.view(B, H // ws, ws, W // ws, ws, C)
        return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)

    def _rev(self, wins, H, W):
        ws = self.ws
        B = wins.shape[0] * ws * ws // (H * W)
        x = wins.view(B, H // ws, W // ws, ws, ws, -1)
        return x.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


class _TorchSwinBlock(nn.Module):
    """SwinBlock twin (swintransformer.py:286-377, mmcv FFN layer names)."""

    def __init__(self, dims, heads, ws, shift, mlp_ratio=4):
        super().__init__()
        self.norm1 = nn.LayerNorm(dims)
        # self.attn IS the ShiftWindowMSA in the reference (:339), so the
        # parameter path attn.w_msa.* matches without aliasing
        self.attn = _TorchShiftWindowAttn(dims, heads, ws, shift)
        self.norm2 = nn.LayerNorm(dims)
        self.ffn = nn.Module()
        self.ffn.layers = nn.Sequential(
            nn.Sequential(nn.Linear(dims, dims * mlp_ratio), nn.GELU(),
                          nn.Dropout(0.0)),
            nn.Linear(dims * mlp_ratio, dims), nn.Dropout(0.0))

    def forward(self, x):  # [B, H, W, C]
        y = self.attn(self.norm1(x))
        x = x + y
        y = self.ffn.layers(self.norm2(x))
        return x + y


class _TorchPatchMerging(nn.Module):
    """PatchMerging twin (utils/transformer.py:300-430): Unfold(2,2) ->
    LN(4C) -> Linear(4C, out, bias=False). Unfold channel order is
    CHANNEL-major (c*4 + pos, pos = h*2+w) — unlike original Swin."""

    def __init__(self, c, out):
        super().__init__()
        self.sampler = nn.Unfold(kernel_size=2, stride=2)
        self.norm = nn.LayerNorm(4 * c)
        self.reduction = nn.Linear(4 * c, out, bias=False)

    def forward(self, x):  # [B, H, W, C] (even H, W assumed; ref pads)
        B, H, W, C = x.shape
        u = self.sampler(x.permute(0, 3, 1, 2))  # [B, 4C, L]
        u = u.transpose(1, 2)                    # [B, L, 4C] c-major
        u = self.reduction(self.norm(u))
        return u.view(B, H // 2, W // 2, -1)


class TorchSwinT(nn.Module):
    """SwinTransformer twin (swintransformer.py:465-770). NCHW in,
    tuple of NCHW outs (the flax side is NHWC; tests transpose)."""

    def __init__(self, in_ch=3, embed=96, patch=4, ws=7,
                 depths=(2, 2, 6, 2), heads=(3, 6, 12, 24),
                 out_indices=(0, 1, 2, 3)):
        super().__init__()
        self.patch, self.out_indices = patch, out_indices
        self.patch_embed = nn.Module()
        self.patch_embed.projection = nn.Conv2d(in_ch, embed, patch,
                                                stride=patch)
        self.patch_embed.norm = nn.LayerNorm(embed)
        self.stages = nn.ModuleList()
        dims = embed
        for i, d in enumerate(depths):
            stage = nn.Module()
            stage.blocks = nn.ModuleList([
                _TorchSwinBlock(dims, heads[i], ws,
                                0 if b % 2 == 0 else ws // 2)
                for b in range(d)])
            if i < len(depths) - 1:
                stage.downsample = _TorchPatchMerging(dims, dims * 2)
                dims *= 2
            self.stages.append(stage)
        dims = embed
        for i in range(len(depths)):
            self.add_module(f"norm{i}", nn.LayerNorm(dims))
            dims *= 2

    def forward(self, x):  # [B, 3, H, W]
        x = self.patch_embed.projection(x).permute(0, 2, 3, 1)
        x = self.patch_embed.norm(x)
        outs = []
        for i, stage in enumerate(self.stages):
            for blk in stage.blocks:
                x = blk(x)
            if i in self.out_indices:
                o = getattr(self, f"norm{i}")(x)
                outs.append(o.permute(0, 3, 1, 2))
            if hasattr(stage, "downsample"):
                x = stage.downsample(x)
        return tuple(outs)


# ---------------------------------------------------------------------------
# EfficientNet twin (reference efficientnet.py:15-520, mmdet naming:
# layers.0 stem ConvModule; layers.{i}.{j} InvertedResidual
# {expand_conv,depthwise_conv,se.conv1,se.conv2,linear_conv} / EdgeResidual
# {conv1,se,conv2}; trailing ConvModule layer)
# ---------------------------------------------------------------------------

def _t_swish(x):
    return x * torch.sigmoid(x)


class _TConvModule(nn.Module):
    """ConvModule(conv,bn,swish) twin (mmcv naming .conv/.bn)."""

    def __init__(self, cin, cout, k, s, groups=1, act=True):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, s, k // 2, groups=groups,
                              bias=False)
        self.bn = nn.BatchNorm2d(cout)
        self._act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return _t_swish(x) if self._act else x


class _TSELayer(nn.Module):
    """mmdet SELayer twin: conv1/conv2 are biased 1x1 ConvModules."""

    def __init__(self, channels, ratio):
        super().__init__()
        hidden = max(1, int(channels / ratio))
        self.conv1 = nn.Module()
        self.conv1.conv = nn.Conv2d(channels, hidden, 1)
        self.conv2 = nn.Module()
        self.conv2.conv = nn.Conv2d(hidden, channels, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = _t_swish(self.conv1.conv(s))
        return x * torch.sigmoid(self.conv2.conv(s))


class _TInvertedResidual(nn.Module):
    def __init__(self, cin, cout, k, s, e, se_ratio):
        super().__init__()
        mid = int(cin * e)
        self._res = (s == 1 and cin == cout)
        if e != 1:
            self.expand_conv = _TConvModule(cin, mid, 1, 1)
        self.depthwise_conv = _TConvModule(mid, mid, k, s, groups=mid)
        if se_ratio > 0:
            self.se = _TSELayer(mid, e * se_ratio)
        self.linear_conv = _TConvModule(mid, cout, 1, 1, act=False)

    def forward(self, x):
        y = x
        if hasattr(self, "expand_conv"):
            y = self.expand_conv(y)
        y = self.depthwise_conv(y)
        if hasattr(self, "se"):
            y = self.se(y)
        y = self.linear_conv(y)
        return x + y if self._res else y


class _TEdgeResidual(nn.Module):
    def __init__(self, cin, cout, k, s, e, se_ratio):
        super().__init__()
        mid = int(cin * e)
        self._res = (s == 1 and cin == cout)
        self.conv1 = _TConvModule(cin, mid, k, s)
        if se_ratio > 0:
            self.se = _TSELayer(mid, e * se_ratio)
        self.conv2 = _TConvModule(mid, cout, 1, 1, act=False)

    def forward(self, x):
        y = self.conv1(x)
        if hasattr(self, "se"):
            y = self.se(y)
        y = self.conv2(y)
        return x + y if self._res else y


class TorchEfficientNet(nn.Module):
    """CustomEfficientNet twin driven by the same scaled layer table as
    the flax side (coocc_tpu.nn.efficientnet.scaled_layers mirrors the
    reference's post-model_scaling grouping, efficientnet.py:231-271)."""

    def __init__(self, arch="b0", out_indices=(2, 3, 4, 5)):
        super().__init__()
        from coocc_tpu.nn.efficientnet import scaled_layers
        self.out_indices = out_indices
        self.layers = nn.ModuleList()
        cin = 3
        for si, stage in enumerate(scaled_layers(arch)):
            if si > max(out_indices):
                break
            blocks = []
            for (k, oc, se, s, e, bt) in stage:
                if bt == -1:
                    self.layers.append(_TConvModule(cin, oc, k, s))
                    cin = oc
                    blocks = None
                    break
                cls = _TEdgeResidual if bt == 1 else _TInvertedResidual
                blocks.append(cls(cin, oc, k, s, e, se))
                cin = oc
            if blocks is not None:
                self.layers.append(nn.Sequential(*blocks))

    def forward(self, x):
        outs = []
        for i, layer in enumerate(self.layers):
            x = layer(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
