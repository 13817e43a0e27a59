"""Composition golden tests: torch module CHAINS vs the converted flax chain.

test_golden_parity.py pins each module in isolation; these pin the
boundaries — every intermediate stays in the JAX-native NHWC/NXYZC layout
with a single transpose at the chain's input and output, certifying that
module output layouts feed the next converted module exactly as the
reference's NCHW chain does (the place silent transposition bugs live).

Reference wiring: img_backbone -> img_neck -> DepthNet
(projects/mmdet3d_plugin/coocc/detectors/coocc_ray.py:96-143 +
image2bev/ViewTransformerLSSBEVDepth.py:495-549) and occ_encoder ->
FPN3D -> OccHead (coocc_ray.py:246-309, dense_heads/occ_head.py:149-237).
"""
import numpy as np
import torch

import jax.numpy as jnp

from coocc_tpu.train import convert_torch as C

from golden_refs import (TorchCustomResNet3D, TorchDepthNet, TorchFPN3D,
                         TorchOccHeadCoarse, TorchResNet50, TorchSECONDFPN,
                         randomize_bn_stats)
from test_golden_parity import _cmp, _convert


def test_image_chain_golden(rng):
    from coocc_tpu.nn.depthnet import DepthNet
    from coocc_tpu.nn.resnet2d import ResNet
    from coocc_tpu.nn.second_fpn import SECONDFPN

    cin = (256, 512, 1024, 2048)
    cout = (4, 4, 4, 4)
    strides = (0.25, 0.5, 1.0, 2.0)
    t_rn = TorchResNet50().eval()
    t_fpn = TorchSECONDFPN(cin, cout, strides).eval()
    t_dn = TorchDepthNet(16, 8, 6, 5).eval()
    for m in (t_rn, t_fpn, t_dn):
        randomize_bn_stats(m, rng)

    x = rng.randn(1, 3, 64, 96).astype(np.float32)
    mlp_in = rng.randn(1, 27).astype(np.float32)
    with torch.no_grad():
        feats = t_rn(torch.from_numpy(x))
        neck = t_fpn(list(feats))
        ref = t_dn(neck, torch.from_numpy(mlp_in))

    j_rn = ResNet(depth=50)
    j_fpn = SECONDFPN(in_channels=cin, out_channels=cout,
                      upsample_strides=strides)
    j_dn = DepthNet(mid_channels=8, context_channels=6, depth_channels=5)

    # one transpose in, one out; every boundary stays NHWC
    h = j_rn.apply(_convert(t_rn, C.convert_resnet, 50),
                   jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    h = j_fpn.apply(_convert(t_fpn, C.convert_second_fpn, strides),
                    list(h), train=False)
    out = j_dn.apply(_convert(t_dn, C.convert_depthnet),
                     h, jnp.asarray(mlp_in), train=False)
    _cmp(out, ref.numpy().transpose(0, 2, 3, 1), atol=2e-3, rtol=2e-3)


def test_semantic_chain_golden(rng):
    from coocc_tpu.config.base import OccHeadConfig
    from coocc_tpu.nn.fpn3d import FPN3D
    from coocc_tpu.nn.occ_head import OccHead
    from coocc_tpu.nn.resnet3d import CustomResNet3D

    planes = (8, 16, 32, 64)
    t_enc = TorchCustomResNet3D(6, planes).eval()
    t_fpn = TorchFPN3D(planes, 16).eval()
    t_occ = TorchOccHeadCoarse((16,) * 4, out_channel=17,
                               soft_weights=True).eval()
    for m in (t_enc, t_fpn, t_occ):
        randomize_bn_stats(m, rng)

    x = rng.randn(1, 6, 8, 8, 4).astype(np.float32)
    with torch.no_grad():
        feats = t_enc(torch.from_numpy(x))
        neck = t_fpn(list(feats))
        ref = t_occ(neck)

    j_enc = CustomResNet3D(depth=18, block_inplanes=planes)
    j_fpn = FPN3D(in_channels=planes, out_channels=16)
    cfg = OccHeadConfig(in_channels=(16,) * 4, out_channel=17, num_level=4,
                        soft_weights=True, cascade_ratio=1,
                        sample_from_voxel=False, sample_from_img=False,
                        final_occ_size=(16, 16, 8),
                        point_cloud_range=(-1, -1, -1, 1, 1, 1),
                        input_size=(8, 8))
    j_occ = OccHead(cfg=cfg)

    h = j_enc.apply(_convert(t_enc, C.convert_resnet3d),
                    jnp.asarray(x.transpose(0, 2, 3, 4, 1)), train=False)
    h = j_fpn.apply(_convert(t_fpn, C.convert_fpn3d), list(h), train=False)
    outs = j_occ.apply(_convert(t_occ, C.convert_occ_head, 4),
                       list(h), train=False)
    _cmp(outs["occ"], ref.numpy().transpose(0, 2, 3, 4, 1),
         atol=5e-4, rtol=5e-4)
