"""Frustum geometry parity vs a torch re-statement of the LSS math."""
import numpy as np
import jax.numpy as jnp
import torch

from coocc_tpu.config import get_config, list_configs
from coocc_tpu.geometry.frustum import (
    create_frustum, gen_dx_bx, get_geometry, get_mlp_input, voxel_indices,
)


def _rand_cams(rng, B=1, N=2):
    def rot(angles):
        a, b, c = angles
        Rz = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])
        Ry = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0], [-np.sin(b), 0, np.cos(b)]])
        Rx = np.array([[1, 0, 0], [0, np.cos(c), -np.sin(c)], [0, np.sin(c), np.cos(c)]])
        return (Rz @ Ry @ Rx).astype(np.float32)

    rots = np.stack([[rot(rng.uniform(-1, 1, 3)) for _ in range(N)]
                     for _ in range(B)])
    trans = rng.uniform(-2, 2, (B, N, 3)).astype(np.float32)
    intrins = np.zeros((B, N, 3, 3), np.float32)
    intrins[..., 0, 0] = 500.0
    intrins[..., 1, 1] = 510.0
    intrins[..., 0, 2] = 300.0
    intrins[..., 1, 2] = 200.0
    intrins[..., 2, 2] = 1.0
    post_rots = np.stack([[rot(rng.uniform(-0.1, 0.1, 3)) for _ in range(N)]
                          for _ in range(B)])
    post_trans = rng.uniform(-5, 5, (B, N, 3)).astype(np.float32)
    bda = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3)).copy()
    bda[:, 0, 0] = -1.0  # flip aug
    return rots, trans, intrins, post_rots, post_trans, bda


def torch_geometry(frustum, rots, trans, intrins, post_rots, post_trans, bda):
    frustum = torch.from_numpy(frustum)
    rots, trans, intrins, post_rots, post_trans, bda = map(
        torch.from_numpy, (rots, trans, intrins, post_rots, post_trans, bda))
    B, N, _ = trans.shape
    points = frustum - post_trans.view(B, N, 1, 1, 1, 3)
    points = torch.inverse(post_rots).view(B, N, 1, 1, 1, 3, 3).matmul(
        points.unsqueeze(-1))
    points = torch.cat(
        (points[..., :2, :] * points[..., 2:3, :], points[..., 2:3, :]), 5)
    combine = rots.matmul(torch.inverse(intrins))
    points = combine.view(B, N, 1, 1, 1, 3, 3).matmul(points).squeeze(-1)
    points += trans.view(B, N, 1, 1, 1, 3)
    points = bda.view(B, 1, 1, 1, 1, 3, 3).matmul(
        points.unsqueeze(-1)).squeeze(-1)
    return points.numpy()


def test_geometry_parity(rng):
    frustum = create_frustum((64, 176), 16, (2.0, 58.0, 0.5))
    assert frustum.shape == (112, 4, 11, 3)
    cams = _rand_cams(rng)
    ref = torch_geometry(frustum, *cams)
    got = np.asarray(get_geometry(jnp.asarray(frustum),
                                  *[jnp.asarray(c) for c in cams]))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_mlp_input_shape(rng):
    cams = _rand_cams(rng, B=2, N=6)
    out = get_mlp_input(*[jnp.asarray(c) for c in cams])
    assert out.shape == (2, 6, 27)


def test_voxel_indices_trunc_matches_torch_long(rng):
    dx, bx, nx = gen_dx_bx((-50, 50, 1.0), (-50, 50, 1.0), (-5, 3, 1.0))
    geom = rng.uniform(-60, 60, (100, 3)).astype(np.float32)
    idx, valid = voxel_indices(jnp.asarray(geom), dx, bx, nx)
    ref = ((torch.from_numpy(geom)
            - (torch.from_numpy(bx) - torch.from_numpy(dx) / 2.0))
           / torch.from_numpy(dx)).long().numpy()
    kept = (ref >= 0).all(-1) & (ref < nx).all(-1)
    np.testing.assert_array_equal(np.asarray(valid), kept)
    np.testing.assert_array_equal(np.asarray(idx)[kept], ref[kept])


def test_all_configs_build():
    for name in list_configs():
        cfg = get_config(name)
        assert cfg.name == name
        assert cfg.occ_size[0] in (200, 256, 512)
        if cfg.lss is not None:
            gs = cfg.lss_grid_size
            assert gs == tuple(np.asarray(
                gen_dx_bx(cfg.grid.xbound, cfg.grid.ybound, cfg.grid.zbound)[2]))
