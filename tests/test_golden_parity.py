"""Golden-activation parity: torch reference replicas -> converter -> flax.

For each major module the torch replica (tests/golden_refs.py, exact
reference state_dict names) is randomly initialized, its state_dict is run
through coocc_tpu.train.convert_torch, and both sides are evaluated on the
same input. This certifies the converter name-map AND the numeric semantics
(conv padding, BN eps, interpolation align_corners, ...) end to end — the
prerequisite for the BASELINE bit-match target the day a real .pth is
available.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from coocc_tpu.train import convert_torch as C

from golden_refs import (ASPP, TorchCustomResNet3D, TorchDepthNet, TorchFPN3D,
                         TorchNeRFMLP, TorchOccHeadCoarse, TorchResNet50,
                         TorchSECOND3D, TorchSECOND3DFPN, TorchSECONDFPN,
                         randomize_bn_stats)

ATOL = 2e-4
RTOL = 2e-4


def _convert(mod, fn, *args, **kw):
    sd = {f"m.{k}": v.detach().numpy() for k, v in mod.state_dict().items()}
    b = C.ParamTreeBuilder()
    fn(b, sd, "m", "m", *args, **kw)
    variables = {"params": b.params.get("m", {})}
    if b.batch_stats.get("m"):
        variables["batch_stats"] = b.batch_stats["m"]
    return variables


def _cmp(got, ref, atol=ATOL, rtol=RTOL):
    np.testing.assert_allclose(np.asarray(got), ref, atol=atol, rtol=rtol)


def test_resnet3d_golden(rng):
    from coocc_tpu.nn.resnet3d import CustomResNet3D
    tm = TorchCustomResNet3D(6, (8, 16, 32, 64)).eval()
    randomize_bn_stats(tm, rng)
    x = rng.randn(1, 6, 8, 8, 4).astype(np.float32)
    with torch.no_grad():
        refs = tm(torch.from_numpy(x))

    jm = CustomResNet3D(depth=18, block_inplanes=(8, 16, 32, 64))
    variables = _convert(tm, C.convert_resnet3d)
    outs = jm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                    train=False)
    assert len(outs) == len(refs)
    for got, ref in zip(outs, refs):
        _cmp(got, ref.numpy().transpose(0, 2, 3, 4, 1))


def test_fpn3d_golden(rng):
    from coocc_tpu.nn.fpn3d import FPN3D
    chans = (8, 16, 32, 64)
    tm = TorchFPN3D(chans, 16).eval()
    randomize_bn_stats(tm, rng)
    xs = [rng.randn(1, c, 8 // 2 ** i, 8 // 2 ** i, max(4 // 2 ** i, 1))
          .astype(np.float32) for i, c in enumerate(chans)]
    with torch.no_grad():
        refs = tm([torch.from_numpy(x) for x in xs])

    jm = FPN3D(in_channels=chans, out_channels=16)
    variables = _convert(tm, C.convert_fpn3d)
    outs = jm.apply(variables,
                    [jnp.asarray(x.transpose(0, 2, 3, 4, 1)) for x in xs],
                    train=False)
    for got, ref in zip(outs, refs):
        _cmp(got, ref.numpy().transpose(0, 2, 3, 4, 1))


def test_occ_head_coarse_golden(rng):
    from coocc_tpu.config.base import OccHeadConfig
    from coocc_tpu.nn.occ_head import OccHead
    chans = (16, 16, 16, 16)
    tm = TorchOccHeadCoarse(chans, out_channel=17, soft_weights=True).eval()
    randomize_bn_stats(tm, rng)
    xs = [rng.randn(1, 16, 8 // 2 ** i, 8 // 2 ** i, max(4 // 2 ** i, 1))
          .astype(np.float32) for i in range(4)]
    with torch.no_grad():
        ref = tm([torch.from_numpy(x) for x in xs])

    cfg = OccHeadConfig(in_channels=chans, out_channel=17, num_level=4,
                        soft_weights=True, cascade_ratio=1,
                        sample_from_voxel=False, sample_from_img=False,
                        final_occ_size=(16, 16, 8),
                        point_cloud_range=(-1, -1, -1, 1, 1, 1),
                        input_size=(8, 8))
    jm = OccHead(cfg=cfg)
    variables = _convert(tm, C.convert_occ_head, 4)
    outs = jm.apply(variables,
                    [jnp.asarray(x.transpose(0, 2, 3, 4, 1)) for x in xs],
                    train=False)
    _cmp(outs["occ"], ref.numpy().transpose(0, 2, 3, 4, 1))


def test_depthnet_golden(rng):
    from coocc_tpu.nn.depthnet import DepthNet
    tm = TorchDepthNet(24, 16, 8, 12).eval()
    randomize_bn_stats(tm, rng)
    x = rng.randn(2, 24, 8, 12).astype(np.float32)
    mlp_in = rng.randn(2, 27).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(mlp_in))

    jm = DepthNet(mid_channels=16, context_channels=8, depth_channels=12)
    variables = _convert(tm, C.convert_depthnet)
    out = jm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                   jnp.asarray(mlp_in), train=False)
    _cmp(out, ref.numpy().transpose(0, 2, 3, 1), atol=5e-4, rtol=5e-4)


def test_resnet50_golden(rng):
    from coocc_tpu.nn.resnet2d import ResNet
    tm = TorchResNet50().eval()
    randomize_bn_stats(tm, rng)
    x = rng.randn(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        refs = tm(torch.from_numpy(x))

    jm = ResNet(depth=50)
    variables = _convert(tm, C.convert_resnet, 50)
    outs = jm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                    train=False)
    for got, ref in zip(outs, refs):
        _cmp(got, ref.numpy().transpose(0, 2, 3, 1), atol=1e-3, rtol=1e-3)


def test_second_fpn_golden(rng):
    from coocc_tpu.nn.second_fpn import SECONDFPN
    cin = (8, 16, 32, 64)
    cout = (4, 4, 4, 4)
    strides = (0.25, 0.5, 1.0, 2.0)
    tm = TorchSECONDFPN(cin, cout, strides).eval()
    randomize_bn_stats(tm, rng)
    xs = [rng.randn(1, c, 32 // 2 ** i, 48 // 2 ** i).astype(np.float32)
          for i, c in enumerate(cin)]
    with torch.no_grad():
        ref = tm([torch.from_numpy(x) for x in xs])

    jm = SECONDFPN(in_channels=cin, out_channels=cout,
                   upsample_strides=strides)
    variables = _convert(tm, C.convert_second_fpn, strides)
    out = jm.apply(variables,
                   [jnp.asarray(x.transpose(0, 2, 3, 1)) for x in xs],
                   train=False)
    _cmp(out, ref.numpy().transpose(0, 2, 3, 1))


def test_second3d_fpn_golden(rng):
    from coocc_tpu.nn.second3d import SECOND3D, SECOND3DFPN
    tm = TorchSECOND3D((8,), (8, 16), (2, 2), (1, 2)).eval()
    tf = TorchSECOND3DFPN((8, 16), (8, 8), (1, 2), extra_num_conv=2).eval()
    randomize_bn_stats(tm, rng)
    randomize_bn_stats(tf, rng)
    x = rng.randn(1, 8, 4, 8, 8).astype(np.float32)  # [B, C, D, H, W]
    with torch.no_grad():
        mids = tm(torch.from_numpy(x))
        ref = tf(mids)

    jm = SECOND3D(in_channels=(8,), out_channels=(8, 16), layer_nums=(2, 2),
                  layer_strides=(1, 2), is_cascade=False)
    jf = SECOND3DFPN(in_channels=(8, 16), out_channels=(8, 8),
                     upsample_strides=(1, 2), extra_num_conv=2)
    vm = _convert(tm, C.convert_second3d, (2, 2))
    vf = _convert(tf, C.convert_second3d_fpn, (1, 2), True, 2)
    # ours: [B, Z, Y, X, C] == torch [B, C, D, H, W] transposed
    mids_j = jm.apply(vm, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                      train=False)
    for got, refm in zip(mids_j, mids):
        _cmp(got, refm.numpy().transpose(0, 2, 3, 4, 1))
    out = jf.apply(vf, mids_j, train=False)
    _cmp(out, ref.numpy().transpose(0, 2, 3, 4, 1))


def test_nerf_mlp_golden(rng):
    from coocc_tpu.nn.nerf_mlp import NeRFMLP
    for depth, out_dim in ((1, 1), (3, 3)):
        tm = TorchNeRFMLP(24, out_dim, depth, net_width=16).eval()
        x = rng.randn(5, 24).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x))
        jm = NeRFMLP(out_dim, net_depth=depth, net_width=16)
        variables = _convert(tm, C.convert_nerf_mlp, depth)
        out = jm.apply(variables, jnp.asarray(x))
        _cmp(out, ref.numpy())


def test_aspp_align_corners(rng):
    """The ASPP pooled-branch upsample uses align_corners=True — isolate it
    since the DepthNet golden also passes when fH==fW==1 broadcast hides it."""
    from coocc_tpu.nn.depthnet import ASPP as JASPP
    tm = ASPP(8, 8).eval()
    randomize_bn_stats(tm, rng)
    x = rng.randn(1, 8, 6, 9).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))
    b = C.ParamTreeBuilder()
    sd = {f"m.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
    for i in range(1, 5):
        b.conv2d(sd, f"m.aspp{i}.atrous_conv", f"m/aspp{i}/atrous_conv")
        b.bn(sd, f"m.aspp{i}.bn", f"m/aspp{i}/bn")
    b.conv2d(sd, "m.global_avg_pool.1", "m/gap_conv")
    b.bn(sd, "m.global_avg_pool.2", "m/gap_bn")
    b.conv2d(sd, "m.conv1", "m/conv1")
    b.bn(sd, "m.bn1", "m/bn1")
    variables = {"params": b.params["m"], "batch_stats": b.batch_stats["m"]}
    jm = JASPP(mid_channels=8)
    out = jm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                   train=False)
    _cmp(out, ref.numpy().transpose(0, 2, 3, 1))
