"""Whole-model checkpoint-converter certification.

Assembles a COOCC_Ray torch state_dict covering EVERY module the flagship
config family instantiates (image backbone/neck/DepthNet, spconv encoder,
GSFusion fuser, semantic encoder/neck, OccHead incl. the cascade MLPs,
NeRF render heads), runs convert_coocc_ray, and asserts the converted tree
covers a fresh flax init leaf-for-leaf (no missing, no extra, right
shapes). This certifies the full name-map — the precondition for loading
the released .pth checkpoints bit-matched (BASELINE.md)."""
import numpy as np
import torch
import torch.nn as nn

import jax

from coocc_tpu.data.synthetic import synthetic_batch, tiny_config
from coocc_tpu.models.coocc_ray import CoOccRay
from coocc_tpu.train.convert_torch import convert_coocc_ray

from golden_refs import (TorchCustomResNet3D, TorchDepthNet, TorchFPN3D,
                         TorchNeRFMLP, TorchOccHeadCoarse, TorchResNet50,
                         TorchSECONDFPN)


def _leaf_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_leaf_shapes(v, p))
        else:
            out[p] = tuple(np.shape(v))
    return out


def _spconv_sd(sd, prefix, rng):
    """SparseLiDAREnc8x spconv2-layout tensors (sparse_lidar_enc.py:125-178):
    conv_input SubM(4->16)+GN, three down stages (SparseConv s2 + BN1d +
    2 SparseBasicBlocks), conv_out SubM(128->128)+GN."""
    def w(k, cin, cout, kk=3):
        # spconv2 layout [O, kz, ky, kx, I]
        sd[f"{k}.weight"] = rng.randn(cout, kk, kk, kk, cin).astype("f4")

    def bn(k, c):
        sd[f"{k}.weight"] = (rng.rand(c) + 0.5).astype("f4")
        sd[f"{k}.bias"] = rng.randn(c).astype("f4") * 0.1
        sd[f"{k}.running_mean"] = rng.randn(c).astype("f4") * 0.1
        sd[f"{k}.running_var"] = (rng.rand(c) + 0.5).astype("f4")

    def gn(k, c):
        sd[f"{k}.weight"] = (rng.rand(c) + 0.5).astype("f4")
        sd[f"{k}.bias"] = rng.randn(c).astype("f4") * 0.1

    w(f"{prefix}.conv_input.0", 4, 16)
    gn(f"{prefix}.conv_input.1", 16)
    chans = [(16, 32), (32, 64), (64, 128)]
    for lvl, (ci, co) in enumerate(chans, start=1):
        w(f"{prefix}.conv{lvl}.0.0", ci, co)
        bn(f"{prefix}.conv{lvl}.0.1", co)
        for blk in (1, 2):
            w(f"{prefix}.conv{lvl}.{blk}.net.0", co, co)
            bn(f"{prefix}.conv{lvl}.{blk}.net.1", co)
            w(f"{prefix}.conv{lvl}.{blk}.net.3", co, co)
            bn(f"{prefix}.conv{lvl}.{blk}.net.4", co)
    w(f"{prefix}.conv_out.0", 128, 128)
    gn(f"{prefix}.conv_out.1", 128)


class TorchBiFuser(nn.Module):
    def __init__(self, c=128):
        super().__init__()
        self.con_enc = nn.Sequential(
            nn.Conv3d(c * 4, c * 2, 3, padding=1, bias=False),
            nn.BatchNorm3d(c * 2), nn.ReLU(True),
            nn.Conv3d(c * 2, c, 3, padding=1, bias=False),
            nn.BatchNorm3d(c), nn.ReLU(True))
        self.knn_enc = nn.Sequential(nn.Linear(c * 2, c), nn.ReLU())


class TorchFineCascade(nn.Module):
    """OccHead cascade extras: fine_mlp + img_mlp_0 + img_mlp."""

    def __init__(self, vox_dim, out_channel):
        super().__init__()
        self.img_mlp_0 = nn.Sequential(
            nn.Conv2d(512, 128, 1), nn.GroupNorm(16, 128), nn.ReLU(True))
        self.img_mlp = nn.Sequential(
            nn.Linear(128, 64), nn.GroupNorm(16, 64), nn.ReLU(True))
        self.fine_mlp = nn.Sequential(
            nn.Linear(vox_dim + 64, 64), nn.GroupNorm(16, 64),
            nn.ReLU(True), nn.Linear(64, out_channel))


def test_full_model_name_map(rng):
    import dataclasses
    cfg = tiny_config(use_camera=True, use_lidar=True)
    # the torch replica side is a real ResNet-50; tiny_config defaults to
    # the compile-cheap depth-10 variant, so pin 50 here
    cfg = dataclasses.replace(
        cfg, img_backbone=dataclasses.replace(cfg.img_backbone, depth=50))
    model = CoOccRay(cfg=cfg)
    batch = jax.tree.map(np.asarray, synthetic_batch(cfg, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True, fine_rng=jax.random.PRNGKey(2))
    want_p = _leaf_shapes(variables["params"])
    want_s = _leaf_shapes(variables["batch_stats"])

    D = cfg.grid.num_depth_bins
    mods = {
        "img_backbone": TorchResNet50(),
        "img_neck": TorchSECONDFPN((256, 512, 1024, 2048), (128,) * 4,
                                   (0.25, 0.5, 1.0, 2.0)),
        "img_view_transformer.depth_net": TorchDepthNet(
            512, cfg.lss.numC_input, cfg.lss.numC_Trans, D),
        "occ_fuser": TorchBiFuser(cfg.fuser.in_channels),
        "semantic_encoder": TorchCustomResNet3D(
            cfg.fuser.out_channels, cfg.semantic.block_inplanes),
        "semantic_neck": TorchFPN3D(cfg.semantic.block_inplanes,
                                    cfg.semantic.neck_out_channels),
        "pts_bbox_head": TorchOccHeadCoarse(
            cfg.occ_head.in_channels, cfg.occ_head.out_channel),
        "pts_bbox_head_fine": TorchFineCascade(
            cfg.occ_head.in_channels[-1] // 2, cfg.occ_head.out_channel),
        "sigma_head": TorchNeRFMLP(cfg.fuser.out_channels, 1, 1),
        "rgb_head": TorchNeRFMLP(cfg.fuser.out_channels, 3, 3),
    }
    sd = {}
    for name, m in mods.items():
        pre = "pts_bbox_head" if name == "pts_bbox_head_fine" else name
        for k, v in m.state_dict().items():
            sd[f"{pre}.{k}"] = v.detach().numpy()
    _spconv_sd(sd, "pts_middle_encoder", rng)

    converted = convert_coocc_ray(sd, cfg)
    got_p = _leaf_shapes(converted["params"])
    got_s = _leaf_shapes(converted["batch_stats"])

    missing = sorted(set(want_p) - set(got_p))
    extra = sorted(set(got_p) - set(want_p))
    assert not missing, f"missing params: {missing[:20]}"
    assert not extra, f"extra params: {extra[:20]}"
    bad = [(k, got_p[k], want_p[k]) for k in want_p if got_p[k] != want_p[k]]
    assert not bad, f"shape mismatches: {bad[:10]}"

    missing_s = sorted(set(want_s) - set(got_s))
    assert not missing_s, f"missing batch_stats: {missing_s[:20]}"
    bad_s = [(k, got_s[k], want_s[k]) for k in want_s
             if k in got_s and got_s[k] != want_s[k]]
    assert not bad_s, f"batch_stats shape mismatches: {bad_s[:10]}"
