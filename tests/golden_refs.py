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
        in_filters = [in_channels[0], *out_channels[:-1]] \
            if isinstance(in_channels, (list, tuple)) else \
            [in_channels, *out_channels[:-1]]
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
