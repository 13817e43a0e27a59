"""Full-model parity golden at REAL flagship shapes (gated, cached).

VERDICT round-4 missing #3: every golden ran at tiny shapes, which hide
resolution-dependent parity bugs (interpolate/grid_sample corner
conventions at even vs odd sizes, reference occ_head.py:219,232 and
coocc_ray.py:659-666; padding at real stride boundaries). This runs the
SAME composite as test_golden_full_model but at coocc_multi_r50_256x704's
true shapes — 6x256x704 images, 800x800x64 sparse grid, 200x200x16 occ,
100x100x8 coarse — torch CPU vs the converted JAX forward.

Cost control:
  * gated behind COOCC_REAL_GOLDEN=1 (the torch side takes minutes on
    this 1-core host; the ungated tests below pin the two real-shape
    oracle accelerations against their slow twins at tiny shapes),
  * the torch reference activations are cached in tests/_cache/ keyed by
    the (deterministic) weight/batch seeds, so reruns only pay the JAX
    forward (persistent XLA CPU cache makes that fast too),
  * the torch pts encoder routes big grids through _conv3d_shiftadd and
    the fuser oracle through window_knn_oracle_vec.

Run: COOCC_REAL_GOLDEN=1 python -m pytest tests/test_golden_real_shapes.py -q
"""
from __future__ import annotations

import dataclasses
import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from coocc_tpu.config import get_config
from coocc_tpu.data.synthetic import synthetic_batch
from coocc_tpu.ops.window_knn import make_offsets

from golden_refs import (_conv3d_shiftadd, window_knn_oracle,
                         window_knn_oracle_vec)

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_cache")
GATE = os.environ.get("COOCC_REAL_GOLDEN", "") == "1"


# --- ungated: pin the oracle accelerations against their slow twins -------

def test_conv3d_shiftadd_matches_f_conv3d():
    rng = np.random.RandomState(0)
    x = torch.from_numpy(rng.randn(1, 5, 10, 9, 7).astype("f4"))
    w = torch.from_numpy(rng.randn(6, 5, 3, 3, 3).astype("f4"))
    for stride in (1, 2):
        ours = _conv3d_shiftadd(x, w, stride=stride)
        ref = F.conv3d(x, w, stride=stride, padding=1)
        np.testing.assert_allclose(ours.numpy(), ref.numpy(), atol=2e-5)


def test_window_knn_oracle_vec_matches_scalar():
    rng = np.random.RandomState(1)
    offsets = make_offsets(3, 3, 4, 5.0)
    for density in (0.05, 0.4, 0.9):
        mask = rng.rand(12, 11, 9) < density
        slow = window_knn_oracle(mask, offsets, 2)
        fast = window_knn_oracle_vec(mask, offsets, 2)
        np.testing.assert_array_equal(fast, slow)


# --- the gated real-shape golden ------------------------------------------

@pytest.mark.skipif(not GATE, reason="set COOCC_REAL_GOLDEN=1 (slow)")
def test_full_model_real_shape_golden():
    from coocc_tpu.models.coocc_ray import CoOccRay
    from coocc_tpu.train.convert_torch import convert_coocc_ray

    from golden_refs import (TorchBiFuserN, TorchCustomResNet3D,
                             TorchDepthNet, TorchFPN3D, TorchNeRFMLP,
                             TorchResNet50, TorchSECONDFPN,
                             TorchSparseLiDAREnc8x, hard_voxelize_vfe,
                             quickcumsum_splat, randomize_bn_stats,
                             torch_create_frustum, torch_get_geometry,
                             torch_get_mlp_input)
    from test_golden_full_model import _dense_pts
    from test_golden_cascade import TorchOccHeadFull, torch_fine_path

    cfg = get_config("coocc_multi_r50_256x704")
    # uncapped eval cascade: torch refines ALL predicted-occupied coarse
    # voxels (reference occ_head.py:182-237 test path); raise our static
    # cap to the full coarse grid so the sets agree exactly
    n_coarse = int(np.prod([s // 2 for s in cfg.occ_size]))
    cfg = dataclasses.replace(
        cfg, occ_head=dataclasses.replace(cfg.occ_head,
                                          max_coarse_occupied=n_coarse))
    rng = np.random.RandomState(0)
    torch.manual_seed(0)

    D = cfg.grid.num_depth_bins
    N = len(cfg.data.cams)

    t_backbone = TorchResNet50().eval()
    t_neck = TorchSECONDFPN((256, 512, 1024, 2048), (128,) * 4,
                            (0.25, 0.5, 1.0, 2.0)).eval()
    t_depthnet = TorchDepthNet(512, cfg.lss.numC_input, cfg.lss.numC_Trans,
                               D).eval()
    t_enc = TorchSparseLiDAREnc8x(cin=cfg.pts.input_channel, base=16,
                                  cout=128).eval()
    t_fuser = TorchBiFuserN(cfg.fuser.in_channels, cfg.fuser.knum).eval()
    t_sem = TorchCustomResNet3D(cfg.fuser.out_channels,
                                cfg.semantic.block_inplanes).eval()
    t_fpn = TorchFPN3D(cfg.semantic.block_inplanes,
                       cfg.semantic.neck_out_channels).eval()
    t_head = TorchOccHeadFull(cfg.occ_head.in_channels,
                              cfg.occ_head.out_channel, img_ch=512).eval()
    for m in (t_backbone, t_neck, t_depthnet, t_enc, t_fuser, t_sem, t_fpn,
              t_head):
        randomize_bn_stats(m, rng)

    sd = {}
    for name, m in [("img_backbone", t_backbone), ("img_neck", t_neck),
                    ("img_view_transformer.depth_net", t_depthnet),
                    ("pts_middle_encoder", t_enc), ("occ_fuser", t_fuser),
                    ("semantic_encoder", t_sem), ("semantic_neck", t_fpn),
                    ("pts_bbox_head", t_head),
                    ("sigma_head",
                     TorchNeRFMLP(cfg.fuser.out_channels, 1, 1)),
                    ("rgb_head", TorchNeRFMLP(cfg.fuser.out_channels, 3, 3))]:
        for k, v in m.state_dict().items():
            sd[f"{name}.{k}"] = v.detach().numpy()

    batch_np = synthetic_batch(cfg, batch_size=1, seed=3)

    cache_path = os.path.join(CACHE, "real_golden_r50_seed0_batch3.npz")
    if os.path.exists(cache_path):
        z = np.load(cache_path)
        ref_occ = z["ref_occ"]
        ref_coords_np = z["ref_coords"]
        ref_fine_np = z["ref_fine"]
    else:
        with torch.no_grad():
            imgs = torch.from_numpy(batch_np.imgs[0].transpose(0, 3, 1, 2))
            rots = torch.from_numpy(batch_np.rots)
            trans = torch.from_numpy(batch_np.trans)
            intrins = torch.from_numpy(batch_np.intrins)
            post_rots = torch.from_numpy(batch_np.post_rots)
            post_trans = torch.from_numpy(batch_np.post_trans)
            bda = torch.from_numpy(batch_np.bda)

            feats = t_backbone(imgs)
            neck = t_neck(list(feats))
            mlp_in = torch_get_mlp_input(rots, trans, intrins, post_rots,
                                         post_trans, bda)
            dn_out = t_depthnet(neck, mlp_in.reshape(N, -1))
            depth_prob = torch.softmax(dn_out[:, :D], dim=1)
            ctx = dn_out[:, D:D + cfg.lss.numC_Trans]
            volume = depth_prob.unsqueeze(2) * ctx.unsqueeze(1)
            volume = volume.permute(0, 1, 3, 4, 2)[None]
            frustum = torch_create_frustum(cfg.data.input_size,
                                           cfg.lss.downsample,
                                           cfg.grid.dbound)
            geom = torch_get_geometry(frustum, rots, trans, intrins,
                                      post_rots, post_trans, bda)
            img_voxel = quickcumsum_splat(
                volume, geom, torch.tensor(cfg.grid.dx),
                torch.tensor(cfg.grid.bx),
                torch.tensor(cfg.grid.nx, dtype=torch.long))
            img_voxel = img_voxel.permute(0, 4, 1, 2, 3)

            xin, msk = _dense_pts(batch_np.points[0], cfg)
            pts_voxel, _ = t_enc(xin, msk)

            offsets = make_offsets(cfg.fuser.window_rx, cfg.fuser.window_ry,
                                   cfg.fuser.window_rz,
                                   cfg.fuser.dist_thresh)
            fz = cfg.fuser
            img_offsets = make_offsets(
                fz.window_img_rx if fz.window_img_rx is not None
                else fz.window_rx,
                fz.window_img_ry if fz.window_img_ry is not None
                else fz.window_ry,
                fz.window_img_rz if fz.window_img_rz is not None
                else fz.window_rz,
                fz.dist_thresh)
            img_act = (img_voxel.abs().sum(1)[0] != 0).numpy()
            pts_act = (pts_voxel.abs().sum(1)[0] != 0).numpy()
            # queries gather nearest IMG keys with the img window and
            # nearest PTS keys with the base window (nn/bifuser.py wiring,
            # pinned by test_golden_full_model at tiny shapes)
            nn_img = torch.from_numpy(
                window_knn_oracle_vec(img_act, img_offsets, cfg.fuser.knum))
            nn_pts = torch.from_numpy(
                window_knn_oracle_vec(pts_act, offsets, cfg.fuser.knum))
            fused = t_fuser(img_voxel, pts_voxel, nn_img, nn_pts)

            sem = t_sem(fused)
            neck3d = t_fpn(list(sem))
            t_transform = (rots[0], trans[0], intrins[0], post_rots[0],
                           post_trans[0], bda[0])
            ref_coords, ref_fine, ref_coarse = torch_fine_path(
                t_head, [f for f in neck3d], neck[:N], t_transform,
                cfg.occ_head.final_occ_size, cfg.occ_head.cascade_ratio,
                cfg.point_cloud_range, cfg.data.input_size)
        ref_occ = ref_coarse[0].permute(1, 2, 3, 0).numpy()
        ref_coords_np = ref_coords.numpy()
        ref_fine_np = ref_fine.numpy()
        os.makedirs(CACHE, exist_ok=True)
        np.savez_compressed(cache_path, ref_occ=ref_occ,
                            ref_coords=ref_coords_np, ref_fine=ref_fine_np)

    # --- converted JAX forward at the same shapes -----------------------
    batch = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(x), batch_np,
        is_leaf=lambda x: x is None)
    model = CoOccRay(cfg=cfg)
    variables = convert_coocc_ray(sd, cfg)
    outs = jax.jit(
        lambda v, b: model.apply(v, b, train=False))(variables, batch)

    occ = np.asarray(outs["occ"][0], np.float32)
    np.testing.assert_allclose(occ, ref_occ, atol=1e-2, rtol=1e-2)

    got = {}
    for c, l, v in zip(np.asarray(outs["fine_coords"][0]),
                       np.asarray(outs["fine_logits"][0]),
                       np.asarray(outs["fine_valid"][0])):
        if v:
            got[tuple(int(i) for i in c)] = l
    ref = {tuple(int(i) for i in c): l
           for c, l in zip(ref_coords_np, ref_fine_np)}
    assert set(got) == set(ref)
    diffs = np.array([np.abs(got[k] - ref[k]).max() for k in ref])
    # measured at the first real-shape runs (2026-08-20): p99.9 = 6.0e-3,
    # max = 1.11e-2 over ~75k refined points, coords sets identical — a
    # deep-stack fp32 reassociation tail (shift-add vs F.conv3d tap order,
    # 27k-K GEMMs), not a convention bug (those produce O(1) diffs at many
    # points, and flip the coords sets). Gate just above the measured
    # distribution; argmax-stable at these magnitudes.
    p999 = float(np.quantile(diffs, 0.999))
    assert p999 < 1e-2, f"fine logits p99.9 abs diff {p999}"
    assert diffs.max() < 2.5e-2, f"fine logits max abs diff {diffs.max()}"
