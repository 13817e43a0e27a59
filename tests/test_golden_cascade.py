"""Numeric golden for the OccHead cascade fine path.

Our head folds the fine/img fc matrices INTO the sampled feature tables
(nn/occ_head._LinearParams) — mathematically identical because sampling is
linear, but exactly the kind of transform that silently breaks parity. This
test replays the reference fine path (occ_head.py:182-237: coarse-occupied
-> fine children -> 5D grid_sample of voxel feats (align_corners=False)
+ multi-view projection + 2D grid_sample of image feats
(align_corners=True) -> img_mlp -> fine_mlp) in plain torch and compares
per-coordinate fine logits against our converted head."""
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from coocc_tpu.config.base import OccHeadConfig
from coocc_tpu.nn.occ_head import OccHead
from coocc_tpu.train import convert_torch as C

from golden_refs import TorchOccHeadCoarse, randomize_bn_stats


class TorchOccHeadFull(nn.Module):
    """Coarse head + cascade extras with reference state_dict names."""

    def __init__(self, in_channels, out_channel, img_ch=24):
        super().__init__()
        base = TorchOccHeadCoarse(in_channels, out_channel)
        self.occ_convs = base.occ_convs
        self.occ_pred_conv = base.occ_pred_conv
        self.voxel_soft_weights = base.voxel_soft_weights
        self._coarse = base
        vox_dim = in_channels[-1] // 2
        # channel widths follow the reference's hardcoded cascade dims
        # (occ_head.py:66-82: img_mlp_0 *->128 GN16, img_mlp 128->64 GN16,
        # fine_mlp (vox+64)->64 GN16 ->out), which our head mirrors
        self.img_mlp_0 = nn.Sequential(
            nn.Conv2d(img_ch, 128, 1), nn.GroupNorm(16, 128), nn.ReLU(True))
        self.img_mlp = nn.Sequential(
            nn.Linear(128, 64), nn.GroupNorm(16, 64), nn.ReLU(True))
        self.fine_mlp = nn.Sequential(
            nn.Linear(vox_dim + 64, 64), nn.GroupNorm(16, 64),
            nn.ReLU(True), nn.Linear(64, out_channel))


def torch_fine_path(tm, voxel_feats, img_feats, transform, final_size,
                    ratio, pc_range, img_hw, empty_idx=0):
    """Reference forward: coarse blend + fine refinement (occ_head.py
    :149-237), eval mode (refine ALL occupied)."""
    outs = [conv(f) for conv, f in zip(tm.occ_convs, voxel_feats)]
    w = torch.softmax(tm.voxel_soft_weights(outs[0]), dim=1)
    H, W, D = outs[0].shape[2:]
    blended = 0
    for f, wi in zip(outs, torch.unbind(w, dim=1)):
        f = F.interpolate(f, size=[H, W, D], mode="trilinear",
                          align_corners=False)
        blended = blended + f * wi.unsqueeze(1)
    coarse_occ = tm.occ_pred_conv(blended)

    mask = coarse_occ.argmax(1)[0] != empty_idx  # [X, Y, Z]
    X, Y, Z = mask.shape
    gx, gy, gz = torch.meshgrid(torch.arange(X), torch.arange(Y),
                                torch.arange(Z), indexing="ij")
    coarse = torch.stack([gx[mask], gy[mask], gz[mask]], dim=0)  # [3, N]
    r = ratio
    val = torch.stack(torch.meshgrid(torch.arange(r), torch.arange(r),
                                     torch.arange(r), indexing="ij"),
                      dim=3).reshape(-1, 3)
    fine = (coarse * r)[None].repeat(r ** 3, 1, 1) + val[:, :, None]
    fine = fine.permute(1, 0, 2).reshape(3, -1)  # [3, 8N] offset-major

    W_occ, H_occ, D_occ = final_size
    fc = fine.float()
    norm = torch.stack([
        (fc[0] / (W_occ - 1) - 0.5) * 2,
        (fc[1] / (H_occ - 1) - 0.5) * 2,
        (fc[2] / (D_occ - 1) - 0.5) * 2], dim=0)
    grid = norm[None, None, None].permute(0, 4, 1, 2, 3)  # [1, P, 1, 1, 3]
    sampled = F.grid_sample(blended.permute(0, 1, 4, 3, 2), grid,
                            mode="bilinear", padding_mode="zeros",
                            align_corners=False)
    feats = [sampled[0, :, :, 0, 0].permute(1, 0)]  # [P, Cvox]

    rots, trans, intrins, post_rots, post_trans, bda = transform
    pts = fc.t()  # [P, 3]
    pr = torch.tensor(pc_range, dtype=torch.float32)
    vs = (pr[3:] - pr[:3]) / torch.tensor(
        [W_occ - 1, H_occ - 1, D_occ - 1], dtype=torch.float32)
    world = pts * vs[None] + pr[:3][None]
    world = (torch.linalg.inv(bda) @ world.unsqueeze(-1)).squeeze(-1)
    p = world[None] - trans[:, None]
    p = (torch.linalg.inv(rots)[:, None] @ p.unsqueeze(-1)).squeeze(-1)
    p = (intrins[:, None] @ p.unsqueeze(-1)).squeeze(-1)
    d = p[..., 2:3]
    uv = p[..., :2] / (d + 1e-5)
    uv = (post_rots[:, None, :2, :2] @ uv.unsqueeze(-1)).squeeze(-1) \
        + post_trans[:, None, :2]
    H_img, W_img = img_hw
    u = (uv[..., 0] / (W_img - 1) - 0.5) * 2
    v = (uv[..., 1] / (H_img - 1) - 0.5) * 2
    m = (d[..., 0] > 1e-5) & (u > -1) & (u < 1) & (v > -1) & (v < 1)
    imf = tm.img_mlp_0(img_feats)  # [N, 16, fH, fW]
    g = torch.stack([u, v], dim=-1)[:, :, None]  # [N, P, 1, 2]
    s = F.grid_sample(imf, g, align_corners=True, mode="bilinear",
                      padding_mode="zeros")[..., 0]  # [N, 16, P]
    s = s * m[:, None]
    s = tm.img_mlp(s.sum(0).permute(1, 0))  # [P, 16]
    feats.append(s)
    logits = tm.fine_mlp(torch.cat(feats, dim=1))
    return fine.t(), logits, coarse_occ  # [P, 3], [P, out], [1, out, X, Y, Z]


def test_cascade_fine_golden(rng):
    chans = (16, 16)
    out_ch = 7
    Xc, Yc, Zc = 6, 6, 4
    ratio = 2
    final = (Xc * ratio, Yc * ratio, Zc * ratio)
    N_cam, fH, fW, Ci = 2, 6, 8, 24
    img_hw = (24, 32)
    pc_range = (-5.0, -5.0, -2.0, 5.0, 5.0, 2.0)

    tm = TorchOccHeadFull(chans, out_ch, img_ch=Ci).eval()
    randomize_bn_stats(tm, rng)

    xs = [rng.randn(1, 16, Xc, Yc, Zc).astype(np.float32) * 2
          for _ in range(2)]
    img_feats = rng.randn(N_cam, Ci, fH, fW).astype(np.float32)
    rots = np.stack([np.eye(3, dtype=np.float32)] * N_cam)
    trans = rng.randn(N_cam, 3).astype(np.float32) * 0.3
    intr = np.array([[20.0, 0, 16], [0, 20.0, 12], [0, 0, 1]], np.float32)
    intrins = np.stack([intr] * N_cam)
    post_rots = np.stack([np.eye(3, dtype=np.float32)] * N_cam)
    post_trans = np.zeros((N_cam, 3), np.float32)
    bda = np.eye(3, dtype=np.float32)

    with torch.no_grad():
        t_transform = tuple(torch.from_numpy(a) for a in
                            (rots, trans, intrins, post_rots, post_trans,
                             bda))
        ref_coords, ref_logits, _ = torch_fine_path(
            tm, [torch.from_numpy(x) for x in xs],
            torch.from_numpy(img_feats), t_transform, final, ratio,
            pc_range, img_hw)

    cfg = OccHeadConfig(
        in_channels=chans, out_channel=out_ch, num_level=2,
        soft_weights=True, cascade_ratio=ratio, sample_from_voxel=True,
        sample_from_img=True, final_occ_size=final,
        point_cloud_range=pc_range, input_size=img_hw,
        max_coarse_occupied=Xc * Yc * Zc, fine_topk=Xc * Yc * Zc)
    jm = OccHead(cfg=cfg)

    b = C.ParamTreeBuilder()
    sd = {f"m.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
    C.convert_occ_head(b, sd, "m", "m", num_level=2)
    variables = {"params": b.params["m"], "batch_stats": b.batch_stats["m"]}

    j_xs = [jnp.asarray(x.transpose(0, 2, 3, 4, 1)) for x in xs]
    j_img = jnp.asarray(img_feats.transpose(0, 2, 3, 1))[None]  # [1,N,...]
    transform = tuple(jnp.asarray(a)[None] for a in
                      (rots, trans, intrins, post_rots, post_trans, bda))
    outs = jm.apply(variables, j_xs, img_feats=j_img, transform=transform,
                    train=False)

    got = {}
    fc = np.asarray(outs["fine_coords"][0])
    fl = np.asarray(outs["fine_logits"][0])
    fv = np.asarray(outs["fine_valid"][0])
    for c, l, v in zip(fc, fl, fv):
        if v:
            got[tuple(c)] = l
    ref = {tuple(c): l for c, l in
           zip(ref_coords.numpy(), ref_logits.numpy())}
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], atol=3e-4, rtol=3e-4,
                                   err_msg=str(k))
