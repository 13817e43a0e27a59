"""grid_sample / interpolate parity vs torch (CPU)."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from coocc_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d
from coocc_tpu.ops.interpolate import (
    resize_bilinear_chlast, resize_trilinear_chlast,
)


def test_grid_sample_2d_parity(rng):
    img = rng.randn(7, 9, 3).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, size=(5, 6, 2)).astype(np.float32)
    for ac in (False, True):
        for pm in ("zeros", "border"):
            ref = F.grid_sample(
                torch.from_numpy(img).permute(2, 0, 1)[None],
                torch.from_numpy(grid)[None],
                mode="bilinear", padding_mode=pm, align_corners=ac,
            )[0].permute(1, 2, 0).numpy()
            got = np.asarray(grid_sample_2d(
                jnp.asarray(img), jnp.asarray(grid),
                align_corners=ac, padding_mode=pm,
            ))
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_grid_sample_3d_parity(rng):
    vol = rng.randn(4, 6, 5, 2).astype(np.float32)  # [D, H, W, C]
    grid = rng.uniform(-1.2, 1.2, size=(3, 4, 2, 3)).astype(np.float32)
    for ac in (False, True):
        for pm in ("zeros", "border"):
            ref = F.grid_sample(
                torch.from_numpy(vol).permute(3, 0, 1, 2)[None],
                torch.from_numpy(grid)[None],
                mode="bilinear", padding_mode=pm, align_corners=ac,
            )[0].permute(1, 2, 3, 0).numpy()
            got = np.asarray(grid_sample_3d(
                jnp.asarray(vol), jnp.asarray(grid),
                align_corners=ac, padding_mode=pm,
            ))
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_trilinear_resize_parity(rng):
    x = rng.randn(1, 5, 6, 4, 3).astype(np.float32)  # [B, X, Y, Z, C]
    for ac in (False, True):
        for size in ((10, 12, 8), (3, 3, 2)):
            ref = F.interpolate(
                torch.from_numpy(x).permute(0, 4, 1, 2, 3),
                size=size, mode="trilinear", align_corners=ac,
            ).permute(0, 2, 3, 4, 1).numpy()
            got = np.asarray(resize_trilinear_chlast(
                jnp.asarray(x), size, align_corners=ac))
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_bilinear_resize_parity(rng):
    x = rng.randn(2, 8, 6, 4).astype(np.float32)  # [B, H, W, C]
    for ac in (False, True):
        for size in ((16, 12), (128, 96)):
            ref = F.interpolate(
                torch.from_numpy(x).permute(0, 3, 1, 2),
                size=size, mode="bilinear", align_corners=ac,
            ).permute(0, 2, 3, 1).numpy()
            got = np.asarray(resize_bilinear_chlast(
                jnp.asarray(x), size, align_corners=ac))
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_multicam_matches_vmapped():
    import jax
    from coocc_tpu.ops.grid_sample import (grid_sample_2d,
                                           multicam_grid_sample_2d)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(3, 5, 7, 4).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-1.3, 1.3, (3, 11, 2)).astype(np.float32))
    for ac in (True, False):
        for pm in ("zeros", "border"):
            ref = jax.vmap(lambda im, g: grid_sample_2d(
                im, g, align_corners=ac, padding_mode=pm))(imgs, grid)
            got = multicam_grid_sample_2d(imgs, grid, align_corners=ac,
                                          padding_mode=pm)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-5, atol=1e-6)


def test_multicam_bilinear_gemm_matches_masked_sum(rng):
    from coocc_tpu.ops.grid_sample import multicam_bilinear_gemm

    N, H, W, C, P = 4, 5, 9, 8, 37
    imgs = rng.randn(N, H, W, C).astype(np.float32)
    grid = rng.uniform(-1.2, 1.2, size=(N, P, 2)).astype(np.float32)
    mask = rng.uniform(size=(N, P)) < 0.5
    ref = 0.0
    for n in range(N):
        s = np.asarray(grid_sample_2d(
            jnp.asarray(imgs[n]), jnp.asarray(grid[n]),
            align_corners=True, padding_mode="zeros"))
        ref = ref + s * mask[n][:, None]
    got = np.asarray(multicam_bilinear_gemm(
        jnp.asarray(imgs), jnp.asarray(grid), jnp.asarray(mask),
        align_corners=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_cascade_sample_3d_matches_grid_sample(rng):
    from coocc_tpu.nn.occ_head import fine_coordinates
    from coocc_tpu.ops.grid_sample import cascade_sample_3d

    for (Xv, Yv, Zv, ratio) in ((10, 12, 4, 2), (8, 8, 5, 4)):
        SX, SY, SZ = Xv * ratio, Yv * ratio, Zv * ratio
        C, K = 6, 50
        vol = rng.randn(Xv, Yv, Zv, C).astype(np.float32)
        coarse = np.stack([
            rng.randint(0, Xv, size=K), rng.randint(0, Yv, size=K),
            rng.randint(0, Zv, size=K)], -1).astype(np.int32)
        fine = np.asarray(fine_coordinates(jnp.asarray(coarse), ratio))
        norm = (fine.astype(np.float32)
                / (np.array([SX, SY, SZ], np.float32) - 1) - 0.5) * 2
        ref = np.asarray(grid_sample_3d(
            jnp.asarray(np.transpose(vol, (2, 1, 0, 3))), jnp.asarray(norm),
            align_corners=False, padding_mode="zeros"))
        got = np.asarray(cascade_sample_3d(
            jnp.asarray(vol), jnp.asarray(coarse), ratio, (SX, SY, SZ)))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_select_occupied_eval_rank_order(rng):
    """Eval path (rank-scatter) keeps index order with exact cap semantics."""
    from coocc_tpu.nn.occ_head import select_occupied

    mask = rng.uniform(size=(7, 6, 5)) < 0.3
    for cap in (4, 64, 500):
        coords, valid = select_occupied(jnp.asarray(mask), cap, None)
        coords, valid = np.asarray(coords), np.asarray(valid)
        occ = np.argwhere(mask)  # index (row-major) order
        nkeep = min(cap, len(occ))
        assert valid[:nkeep].all() and not valid[nkeep:].any()
        np.testing.assert_array_equal(coords[:nkeep], occ[:nkeep])
