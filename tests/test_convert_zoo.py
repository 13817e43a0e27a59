"""Model-zoo converter certification: all five released checkpoints.

For each reference model-zoo config (reference README.md:30-39 — multimodal
R50, multimodal R101, OpenOccupancy R101, camera-only R101, lidar-only),
synthesize a torch state_dict with that checkpoint's EXACT key inventory
(torch replicas from golden_refs + hand-built spconv trees), run
convert_coocc_ray, and assert the converted tree covers a fresh flax init
leaf-for-leaf. Geometry is shrunk for CPU tracing speed; every STRUCTURAL
axis that shapes the key inventory is kept from the zoo config: backbone
depth (50 vs 101), lidar encoder family (SparseLiDAREnc8x vs
SparseEncoderHD+SECOND3D), fuser presence, cascade sampling flags, render
heads, class count. This is the turnkey-day-one guarantee behind
tools/convert_ckpt.py.
"""
import dataclasses

import numpy as np
import pytest
import torch

import jax

from coocc_tpu.config import get_config
from coocc_tpu.data.synthetic import synthetic_batch, tiny_config
from coocc_tpu.models.coocc_ray import CoOccRay
from coocc_tpu.train.convert_torch import convert_coocc_ray

from golden_refs import (TorchCustomResNet3D, TorchDepthNet, TorchFPN3D,
                         TorchNeRFMLP, TorchOccHeadCoarse, TorchResNet50,
                         TorchSECOND3D, TorchSECOND3DFPN, TorchSECONDFPN)
from test_convert_full import (TorchBiFuser, TorchFineCascade, _leaf_shapes,
                               _spconv_sd)

ZOO = [
    "coocc_multi_r50_256x704",
    "coocc_multi_r101_896x1600",
    "coocc_multi_r101_openoccupancy",
    "coocc_cam_r101_896x1600",
    "coocc_lidar",
]

RESNET_LAYERS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def shrunk_zoo_config(name):
    """tiny geometry + the zoo config's structural identity."""
    zoo = get_config(name)
    t = tiny_config(use_camera=zoo.use_camera, use_lidar=zoo.use_lidar,
                    num_classes=zoo.num_classes,
                    cascade=zoo.occ_head.cascade_ratio > 1)
    kw = dict(name=f"shrunk_{name}", model_type=zoo.model_type)
    if zoo.img_backbone is not None:
        kw["img_backbone"] = dataclasses.replace(
            t.img_backbone, depth=zoo.img_backbone.depth)
    if zoo.pts is not None:
        pts_kw = dict(encoder=zoo.pts.encoder)
        if zoo.pts.encoder == "SparseEncoderHD":
            # HD's strided z-padding schedule expects an odd z extent
            # (reference sparse_shape z=65); keep it, shrink xy
            pts_kw.update(sparse_shape_xyz=(64, 64, 65), impl="gather")
        kw["pts"] = dataclasses.replace(t.pts, **pts_kw)
    if zoo.second3d is not None:
        kw["second3d"] = zoo.second3d
    kw["occ_head"] = dataclasses.replace(
        t.occ_head,
        out_channel=zoo.occ_head.out_channel,
        sample_from_voxel=zoo.occ_head.sample_from_voxel,
        sample_from_img=zoo.occ_head.sample_from_img,
    )
    return t.replace(**kw)


def zoo_state_dict(cfg, want_params, rng):
    """Assemble the torch-side state_dict for one zoo checkpoint."""
    mods = {}
    sd = {}
    if cfg.use_camera:
        mods["img_backbone"] = TorchResNet50(
            RESNET_LAYERS[cfg.img_backbone.depth])
        mods["img_neck"] = TorchSECONDFPN(
            cfg.img_neck.in_channels, cfg.img_neck.out_channels,
            cfg.img_neck.upsample_strides)
        D = cfg.grid.num_depth_bins
        mods["img_view_transformer.depth_net"] = TorchDepthNet(
            512, cfg.lss.numC_input, cfg.lss.numC_Trans, D)
    if cfg.use_lidar and cfg.pts is not None:
        if cfg.pts.encoder == "SparseLiDAREnc8x":
            _spconv_sd(sd, "pts_middle_encoder", rng)
        else:
            _hd_sd(sd, "pts_middle_encoder", rng,
                   in_c=cfg.pts.input_channel)
        if cfg.second3d is not None:
            mods["pts_backbone"] = TorchSECOND3D(
                cfg.second3d.in_channels, cfg.second3d.out_channels,
                cfg.second3d.layer_nums, cfg.second3d.layer_strides,
                cfg.second3d.is_cascade)
            mods["pts_neck"] = TorchSECOND3DFPN(
                cfg.second3d.out_channels, cfg.second3d.fpn_out_channels,
                cfg.second3d.fpn_upsample_strides,
                cfg.second3d.fpn_extra_num_conv)
    if cfg.fuser is not None:
        mods["occ_fuser"] = TorchBiFuser(cfg.fuser.in_channels)

    sem_in = _semantic_in_channels(cfg)
    mods["semantic_encoder"] = TorchCustomResNet3D(
        sem_in, cfg.semantic.block_inplanes)
    mods["semantic_neck"] = TorchFPN3D(cfg.semantic.block_inplanes,
                                       cfg.semantic.neck_out_channels)
    mods["pts_bbox_head"] = TorchOccHeadCoarse(
        cfg.occ_head.in_channels, cfg.occ_head.out_channel)
    if cfg.occ_head.cascade_ratio > 1 and (
            cfg.occ_head.sample_from_voxel or cfg.occ_head.sample_from_img):
        fine = TorchFineCascade(cfg.occ_head.in_channels[-1] // 2,
                                cfg.occ_head.out_channel)
        if not cfg.occ_head.sample_from_img:
            del fine.img_mlp_0, fine.img_mlp
        mods["pts_bbox_head_fine"] = fine
    # render heads exist iff the init created them (renderer needs geometry)
    if "renderer" in want_params:
        mods["sigma_head"] = TorchNeRFMLP(cfg.fuser.out_channels
                                          if cfg.fuser else sem_in, 1, 1)
        if "rgb_head" in want_params.get("renderer", {}):
            mods["rgb_head"] = TorchNeRFMLP(cfg.fuser.out_channels
                                            if cfg.fuser else sem_in, 3, 3)
    for name, m in mods.items():
        pre = "pts_bbox_head" if name == "pts_bbox_head_fine" else name
        for k, v in m.state_dict().items():
            sd[f"{pre}.{k}"] = v.detach().numpy()
    return sd


def _semantic_in_channels(cfg):
    if cfg.fuser is not None:
        return cfg.fuser.out_channels
    if cfg.second3d is not None:
        # SECOND3DFPN SUMS its upsampled levels (nn/second3d.py:88)
        return cfg.second3d.fpn_out_channels[-1]
    if cfg.use_lidar and cfg.pts is not None:
        return cfg.pts.out_channel
    return cfg.lss.numC_Trans


def _hd_sd(sd, prefix, rng, in_c=4,
           channels=((16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128)),
           out_c=128):
    """SparseEncoderHD spconv1-layout state_dict
    (reference voxel_encoder/sparse_encoder_hd.py:11-209)."""
    def spw(k, cin, cout, kk=3):
        sd[f"{prefix}.{k}.weight"] = rng.randn(
            kk, kk, kk, cin, cout).astype("f4")

    def bn(k, c):
        sd[f"{prefix}.{k}.weight"] = (rng.rand(c) + 0.5).astype("f4")
        sd[f"{prefix}.{k}.bias"] = rng.randn(c).astype("f4") * 0.1
        sd[f"{prefix}.{k}.running_mean"] = rng.randn(c).astype("f4") * 0.1
        sd[f"{prefix}.{k}.running_var"] = (rng.rand(c) + 0.5).astype("f4")

    spw("conv_input.0", in_c, channels[0][0])
    bn("conv_input.1", channels[0][0])
    cin = channels[0][0]
    for i, blocks in enumerate(channels):
        stage = f"encoder_layers.encoder_layer{i + 1}"
        for j, oc in enumerate(blocks):
            strided = (j == len(blocks) - 1) and (i != len(channels) - 1)
            if strided:
                spw(f"{stage}.{j}.0", cin, oc)
                bn(f"{stage}.{j}.1", oc)
            else:
                spw(f"{stage}.{j}.conv1", cin, oc)
                bn(f"{stage}.{j}.norm1", oc)
                spw(f"{stage}.{j}.conv2", oc, oc)
                bn(f"{stage}.{j}.norm2", oc)
            cin = oc
    spw("conv_out.0", cin, out_c, kk=1)
    bn("conv_out.1", out_c)


@pytest.mark.parametrize("name", ZOO)
def test_zoo_checkpoint_inventory(name):
    cfg = shrunk_zoo_config(name)
    model = CoOccRay(cfg=cfg)
    batch = jax.tree.map(np.asarray, synthetic_batch(cfg, 1),
                         is_leaf=lambda x: x is None)
    ref = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            batch, train=True, fine_rng=jax.random.PRNGKey(2)))
    want_p = _leaf_shapes(ref["params"])
    want_s = _leaf_shapes(ref.get("batch_stats", {}))

    rng = np.random.RandomState(0)
    sd = zoo_state_dict(cfg, ref["params"], rng)
    converted = convert_coocc_ray(sd, cfg)
    got_p = _leaf_shapes(converted["params"])
    got_s = _leaf_shapes(converted["batch_stats"])

    missing = sorted(set(want_p) - set(got_p))
    extra = sorted(set(got_p) - set(want_p))
    assert not missing, f"{name}: missing params {missing[:15]}"
    assert not extra, f"{name}: extra params {extra[:15]}"
    bad = [(k, got_p[k], want_p[k]) for k in want_p if got_p[k] != want_p[k]]
    assert not bad, f"{name}: shape mismatches {bad[:8]}"
    missing_s = sorted(set(want_s) - set(got_s))
    assert not missing_s, f"{name}: missing batch_stats {missing_s[:15]}"
    bad_s = [(k, got_s[k], want_s[k]) for k in want_s
             if k in got_s and got_s[k] != want_s[k]]
    assert not bad_s, f"{name}: batch_stats mismatches {bad_s[:8]}"
