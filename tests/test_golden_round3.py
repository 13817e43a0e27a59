"""Round-3 golden-activation parity: the previously-unpinned numerics.

Closes VERDICT r2 missing #3: lift-splat vs the reference's pure-torch
cumsum splat, voxelize+HardSimpleVFE vs a point-order oracle, the
SparseLiDAREnc8x activations vs a torch dense SubM/strided emulation, and
the frustum renderer vs a torch transcription of the reference inline loop.
"""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from coocc_tpu.train import convert_torch as C

from golden_refs import (SparseBasicBlockDense, TorchNeRFMLP,
                         TorchSparseLiDAREnc8x, hard_voxelize_vfe,
                         quickcumsum_splat, randomize_bn_stats,
                         torch_frustum_render)

ATOL = 2e-4


def test_lift_splat_golden(rng):
    """Fused scatter-add splat vs the reference QuickCumsum oracle
    (ViewTransformerLSSBEVDepth.py:197-240 / ViewTransformerLSSVoxel.py
    :100-123)."""
    from coocc_tpu.geometry.frustum import gen_dx_bx
    from coocc_tpu.ops.lift_splat import lift_splat

    B, N, D, fH, fW, Cc = 2, 3, 6, 4, 5, 7
    xb, yb, zb = (-8.0, 8.0, 2.0), (-8.0, 8.0, 2.0), (-2.0, 2.0, 1.0)
    dx, bx, nx = gen_dx_bx(xb, yb, zb)

    depth_prob = rng.rand(B, N, D, fH, fW).astype(np.float32)
    img_feat = rng.randn(B, N, fH, fW, Cc).astype(np.float32)
    # geometry: mostly inside, some outside (exercises the kept filter and
    # the torch .long() truncation convention)
    geom = rng.uniform(-10, 10, (B, N, D, fH, fW, 3)).astype(np.float32)
    geom[..., 2] = rng.uniform(-3, 3, (B, N, D, fH, fW))

    got = lift_splat(jnp.asarray(depth_prob), jnp.asarray(img_feat),
                     jnp.asarray(geom), dx, bx, nx)

    volume = depth_prob[..., None] * img_feat[:, :, None]  # [B,N,D,H,W,C]
    ref = quickcumsum_splat(
        torch.from_numpy(volume), torch.from_numpy(geom),
        torch.tensor(np.asarray(dx)), torch.tensor(np.asarray(bx)),
        torch.tensor(np.asarray(nx), dtype=torch.long))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=ATOL,
                               rtol=2e-4)


def test_voxelize_vfe_chain_golden(rng):
    """voxelize() (sorted segment-mean) vs the point-order hard-voxelize +
    HardSimpleVFE oracle (mmdet3d voxelize.py:10-148 + voxel_encoder.py
    :13-45), including BOTH overflow rules."""
    from coocc_tpu.ops.voxelize import voxelize

    pcr = (-4.0, -4.0, -1.0, 4.0, 4.0, 1.0)
    vs = (1.0, 1.0, 0.5)
    grid = (8, 8, 4)
    P = 300
    pts = np.zeros((P, 5), np.float32)
    pts[:, 0] = rng.uniform(-5, 5, P)  # some out of range
    pts[:, 1] = rng.uniform(-5, 5, P)
    pts[:, 2] = rng.uniform(-1.5, 1.5, P)
    pts[:, 3:] = rng.rand(P, 2)

    for max_pts, max_vox in ((100, 512), (3, 512), (100, 20), (3, 20)):
        coords, feats = hard_voxelize_vfe(pts, pcr, vs, grid, max_pts,
                                          max_vox)
        got = voxelize(jnp.asarray(pts), jnp.ones(P, bool), pcr, vs, grid,
                       max_voxels=max_vox, max_points_per_voxel=max_pts,
                       exact_overflow=True)
        ref = {(int(c[0]), int(c[1]), int(c[2])): f
               for c, f in zip(coords, feats)}
        ids = np.asarray(got.ids)
        mask = np.asarray(got.mask)
        nx, ny, nz = grid
        got_map = {}
        for i in range(len(ids)):
            if mask[i]:
                lid = int(ids[i])
                key = (lid // (ny * nz), (lid // nz) % ny, lid % nz)
                got_map[key] = np.asarray(got.features[i])
        assert set(got_map) == set(ref), (max_pts, max_vox)
        for k in ref:
            np.testing.assert_allclose(got_map[k], ref[k], atol=1e-5,
                                       err_msg=str((max_pts, max_vox)))


def _rand_gn(gn, rng):
    gn.weight.data.copy_(torch.from_numpy(
        rng.rand(gn.weight.shape[0]).astype("float32") + 0.5))
    gn.bias.data.copy_(torch.from_numpy(
        rng.randn(gn.bias.shape[0]).astype("float32") * 0.1))


def test_sparse_enc8x_activation_golden(rng):
    """Gather-GEMM SparseLiDAREnc8x activations vs the torch dense
    SubM/strided emulation (sparse_lidar_enc.py:125-178), through the
    converter name-map."""
    from coocc_tpu.nn.sparse_enc import SparseLiDAREnc8x
    from coocc_tpu.ops.sparse_conv import SparseTensor

    grid = (16, 16, 8)
    base, cin, cout = 32, 4, 32  # base 32: non-degenerate stem GN(16, 32)
    tm = TorchSparseLiDAREnc8x(cin, base, cout).eval()
    randomize_bn_stats(tm, rng)
    for m in tm.modules():
        if isinstance(m, torch.nn.GroupNorm):
            _rand_gn(m, rng)

    ncell = grid[0] * grid[1] * grid[2]
    n_active, cap = 60, 128
    ids = np.sort(rng.choice(ncell, n_active, replace=False)).astype(np.int32)
    feats = rng.randn(n_active, cin).astype(np.float32)

    # torch dense side
    dense = np.zeros((1, cin, *grid), np.float32)
    mask = np.zeros((1, 1, *grid), np.float32)
    nx, ny, nz = grid
    for lid, f in zip(ids, feats):
        x, y, z = lid // (ny * nz), (lid // nz) % ny, lid % nz
        dense[0, :, x, y, z] = f
        mask[0, 0, x, y, z] = 1.0
    with torch.no_grad():
        ref, ref_mask = tm(torch.from_numpy(dense), torch.from_numpy(mask))

    # ours via the converter
    sd = {f"m.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
    b = C.ParamTreeBuilder()
    C.convert_sparse_enc8x(b, sd, "m", "m")
    variables = {"params": b.params["m"], "batch_stats": b.batch_stats["m"]}

    sp = SparseTensor(
        ids=jnp.asarray(np.concatenate([ids, np.full(cap - n_active, ncell,
                                                     np.int32)]))[None],
        features=jnp.asarray(np.concatenate(
            [feats, np.zeros((cap - n_active, cin), np.float32)]))[None],
        mask=jnp.asarray(np.concatenate(
            [np.ones(n_active, bool), np.zeros(cap - n_active, bool)]))[None])
    jm = SparseLiDAREnc8x(input_channel=cin, base_channel=base,
                          out_channel=cout, sparse_shape_xyz=grid,
                          capacity=cap)
    got = jm.apply(variables, sp, train=False)  # [1, X/8, Y/8, Z/8, C]
    ref_chlast = ref.numpy().transpose(0, 2, 3, 4, 1)
    assert float(np.abs(ref_chlast).sum()) > 0
    # 10-layer chain with per-voxel GroupNorms (variance over 2-channel
    # groups): f32 accumulation-order drift reaches ~4e-3 on isolated
    # elements while the bulk agrees to <2e-4
    np.testing.assert_allclose(np.asarray(got), ref_chlast, atol=5e-3,
                               rtol=5e-3)
    close = np.isclose(np.asarray(got), ref_chlast, atol=ATOL, rtol=2e-4)
    assert close.mean() > 0.98


def test_frustum_renderer_golden(rng):
    """FrustumRenderer vs the torch transcription of the reference inline
    loop (coocc_ray.py:358-433), incl. the pre-sigmoid-masking and
    integer-dists quirks, through the NeRF-MLP converter."""
    from coocc_tpu.config.base import RenderConfig
    from coocc_tpu.models.renderer import FrustumRenderer

    Cc, N, D, H, W = 12, 2, 6, 4, 5
    X, Y, Z = 10, 10, 4
    bounds = ((-5.0, 5.0, 1.0), (-5.0, 5.0, 1.0), (-2.0, 2.0, 1.0))

    sigma_t = TorchNeRFMLP(Cc, 1, 1, net_width=16).eval()
    rgb_t = TorchNeRFMLP(Cc, 3, 3, net_width=16).eval()
    voxel_feats = rng.randn(1, X, Y, Z, Cc).astype(np.float32)
    geom = rng.uniform(-6, 6, (1, N, D, H, W, 3)).astype(np.float32)
    geom[..., 2] = rng.uniform(-2.5, 2.5, (1, N, D, H, W))

    with torch.no_grad():
        ref_rgb, ref_depth = torch_frustum_render(
            torch.from_numpy(voxel_feats[0].transpose(3, 0, 1, 2)),
            torch.from_numpy(geom[0]), rgb_t, sigma_t, bounds, scale=4)

    b = C.ParamTreeBuilder()
    sd = {f"sigma_head.{k}": v.detach().numpy()
          for k, v in sigma_t.state_dict().items()}
    sd.update({f"rgb_head.{k}": v.detach().numpy()
               for k, v in rgb_t.state_dict().items()})
    C.convert_nerf_mlp(b, sd, "sigma_head", "m/sigma_head", 1)
    C.convert_nerf_mlp(b, sd, "rgb_head", "m/rgb_head", 3)
    variables = {"params": b.params["m"]}

    rcfg = RenderConfig(use_rendering=True, render_xbound=bounds[0],
                        render_ybound=bounds[1], render_zbound=bounds[2])
    jm = FrustumRenderer(cfg=rcfg, scale=4, with_rgb=True)

    # the renderer hardcodes net_width=256 MLPs in the model; rebuild with
    # width-16 heads for the test via monkey-patched module defaults
    import functools

    import coocc_tpu.models.renderer as R
    orig = R.NeRFMLP
    R.NeRFMLP = functools.partial(orig, net_width=16)
    try:
        rgbs, depths = jm.apply(variables, jnp.asarray(voxel_feats),
                                jnp.asarray(geom))
    finally:
        R.NeRFMLP = orig

    np.testing.assert_allclose(np.asarray(rgbs[0]), ref_rgb.numpy(),
                               atol=ATOL, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(depths[0]), ref_depth.numpy(),
                               atol=2e-3, rtol=2e-4)
