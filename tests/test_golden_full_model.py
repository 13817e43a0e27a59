"""ONE full-model tiny-forward golden: torch composite -> convert -> logits.

Closes the last VERDICT r2 parity gap: every stage of the flagship eval
forward — image backbone/neck/DepthNet/lift-splat, voxelize/sparse encoder,
GSFusion fuser, semantic encoder/neck, OccHead coarse + cascade fine — runs
END TO END on both sides from ONE shared state_dict, certifying the stage
boundaries (layouts, geometry conventions, the spconv GN16 stem collapse,
KNN gather wiring) that the per-module goldens cannot see.

Torch side: reference-semantics transcriptions (get_geometry/get_mlp_input/
create_frustum from ViewTransformerLSSBEVDepth.py:104-150,636-691; the
QuickCumsum splat :197-240; dense spconv emulation sparse_lidar_enc.py
:125-178; the OccHead fine path occ_head.py:149-237). The fuser twin
replays our documented window-KNN selection (indices from the shared numpy
oracle; selection semantics pinned separately in test_window_knn.py).
"""
import dataclasses

import numpy as np
import torch

import jax
import jax.numpy as jnp

from coocc_tpu.data.synthetic import synthetic_batch, tiny_config
from coocc_tpu.models.coocc_ray import CoOccRay
from coocc_tpu.ops.window_knn import make_offsets
from coocc_tpu.train.convert_torch import convert_coocc_ray

from golden_refs import (TorchBiFuserN, TorchCustomResNet3D, TorchDepthNet,
                         TorchFPN3D, TorchNeRFMLP, TorchResNet50,
                         TorchSECONDFPN, TorchSparseLiDAREnc8x,
                         hard_voxelize_vfe, quickcumsum_splat,
                         randomize_bn_stats, torch_create_frustum,
                         torch_get_geometry, torch_get_mlp_input,
                         window_knn_oracle)
from test_golden_cascade import TorchOccHeadFull, torch_fine_path


def _dense_pts(points, cfg):
    """Torch pts-branch input: hard-voxelize + VFE -> dense grid + mask."""
    pts_cfg = cfg.pts
    X0, Y0, Z0 = pts_cfg.sparse_shape_xyz
    coords, feats = hard_voxelize_vfe(
        points, cfg.point_cloud_range, pts_cfg.voxel_size, (X0, Y0, Z0),
        pts_cfg.max_num_points, pts_cfg.max_voxels_test,
        num_features=pts_cfg.input_channel)
    x = np.zeros((1, pts_cfg.input_channel, X0, Y0, Z0), np.float32)
    m = np.zeros((1, 1, X0, Y0, Z0), np.float32)
    x[0, :, coords[:, 0], coords[:, 1], coords[:, 2]] = feats
    m[0, 0, coords[:, 0], coords[:, 1], coords[:, 2]] = 1.0
    return torch.from_numpy(x), torch.from_numpy(m)


def test_full_model_forward_golden(rng):
    cfg = tiny_config(use_camera=True, use_lidar=True)
    # real ResNet-50 twin; uncapped eval cascade so torch's refine-ALL
    # matches our static-cap path exactly
    n_coarse = int(np.prod([s // 2 for s in cfg.occ_size]))
    cfg = dataclasses.replace(
        cfg,
        img_backbone=dataclasses.replace(cfg.img_backbone, depth=50),
        occ_head=dataclasses.replace(cfg.occ_head,
                                     max_coarse_occupied=n_coarse))
    torch.manual_seed(0)

    # --- shared weights ------------------------------------------------
    D = cfg.grid.num_depth_bins
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

    # --- shared batch ----------------------------------------------------
    batch_np = synthetic_batch(cfg, batch_size=1, seed=3)
    batch = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(x), batch_np,
        is_leaf=lambda x: x is None)

    # --- torch reference forward ----------------------------------------
    with torch.no_grad():
        N = cfg.data.num_cams
        H, W = cfg.data.input_size
        imgs = torch.from_numpy(
            batch_np.imgs[0].transpose(0, 3, 1, 2))  # [N, 3, H, W]
        rots = torch.from_numpy(batch_np.rots)
        trans = torch.from_numpy(batch_np.trans)
        intrins = torch.from_numpy(batch_np.intrins)
        post_rots = torch.from_numpy(batch_np.post_rots)
        post_trans = torch.from_numpy(batch_np.post_trans)
        bda = torch.from_numpy(batch_np.bda)

        feats = t_backbone(imgs)
        neck = t_neck(list(feats))  # [N, 512, fH, fW]
        mlp_in = torch_get_mlp_input(rots, trans, intrins, post_rots,
                                     post_trans, bda)  # [1, N, 27]
        dn_out = t_depthnet(neck, mlp_in.reshape(N, -1))
        depth_prob = torch.softmax(dn_out[:, :D], dim=1)  # [N, D, fH, fW]
        ctx = dn_out[:, D:D + cfg.lss.numC_Trans]
        volume = depth_prob.unsqueeze(2) * ctx.unsqueeze(1)  # [N,D,C,fH,fW]
        volume = volume.permute(0, 1, 3, 4, 2)[None]  # [1,N,D,fH,fW,C]
        frustum = torch_create_frustum(cfg.data.input_size,
                                       cfg.lss.downsample, cfg.grid.dbound)
        geom = torch_get_geometry(frustum, rots, trans, intrins, post_rots,
                                  post_trans, bda)
        dx = torch.tensor(cfg.grid.dx)
        bx = torch.tensor(cfg.grid.bx)
        nx = torch.tensor(cfg.grid.nx, dtype=torch.long)
        img_voxel = quickcumsum_splat(volume, geom, dx, bx, nx)
        img_voxel = img_voxel.permute(0, 4, 1, 2, 3)  # [1, C, X, Y, Z]

        xin, msk = _dense_pts(batch_np.points[0], cfg)
        pts_voxel, _ = t_enc(xin, msk)  # [1, C, X, Y, Z]

        offsets = make_offsets(cfg.fuser.window_rx, cfg.fuser.window_ry,
                               cfg.fuser.window_rz, cfg.fuser.dist_thresh)
        img_act = (img_voxel.abs().sum(1)[0] != 0).numpy()
        pts_act = (pts_voxel.abs().sum(1)[0] != 0).numpy()
        nn_img = torch.from_numpy(window_knn_oracle(img_act, offsets, 2))
        nn_pts = torch.from_numpy(window_knn_oracle(pts_act, offsets, 2))
        fused = t_fuser(img_voxel, pts_voxel, nn_img, nn_pts)

        sem = t_sem(fused)
        neck3d = t_fpn(list(sem))
        t_transform = (rots[0], trans[0], intrins[0], post_rots[0],
                       post_trans[0], bda[0])
        ref_coords, ref_fine, ref_coarse = torch_fine_path(
            t_head, [f for f in neck3d], neck[: N], t_transform,
            cfg.occ_head.final_occ_size, cfg.occ_head.cascade_ratio,
            cfg.point_cloud_range, cfg.data.input_size)

    # --- converted jax forward ------------------------------------------
    model = CoOccRay(cfg=cfg)
    variables = convert_coocc_ray(sd, cfg)
    outs = model.apply(variables, batch, train=False)

    occ = np.asarray(outs["occ"][0])  # [X, Y, Z, out]
    ref_occ = ref_coarse[0].permute(1, 2, 3, 0).numpy()
    np.testing.assert_allclose(occ, ref_occ, atol=5e-3, rtol=5e-3)

    got = {}
    for c, l, v in zip(np.asarray(outs["fine_coords"][0]),
                       np.asarray(outs["fine_logits"][0]),
                       np.asarray(outs["fine_valid"][0])):
        if v:
            got[tuple(c)] = l
    ref = {tuple(c): l for c, l in
           zip(ref_coords.numpy(), ref_fine.numpy())}
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], atol=5e-3, rtol=5e-3,
                                   err_msg=str(k))
