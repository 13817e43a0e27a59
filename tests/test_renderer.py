"""Frustum renderer compositing parity vs a torch restatement of the
reference's inline math (coocc_ray.py:369-417)."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from coocc_tpu.models.renderer import composite, _gather_frustum


def torch_composite(rgb, sigma, pts):
    """rgb [H,W,D,3] sigmoided, sigma [H,W,D] relu'd, pts [H,W,D,3] float."""
    rgb = torch.from_numpy(rgb)
    sigma = torch.from_numpy(sigma)
    pts = torch.from_numpy(pts)
    H, W, D = sigma.shape
    dists = torch.norm(pts[:, :, 1:, :] - pts[:, :, :-1, :], dim=-1)
    dists = torch.cat([dists, torch.full_like(dists[..., :1], 1e10)], dim=-1)
    alpha = 1. - torch.exp(-F.relu(sigma * dists))
    weights = alpha * torch.cumprod(
        torch.cat([torch.ones(H, W, 1), 1. - alpha + 1e-10], -1), dim=-1
    )[:, :, :-1]
    rgb_map = torch.sum(weights.unsqueeze(-1) * rgb, dim=-2)
    z_vals = torch.linspace(0, D, D).reshape(1, 1, D)
    depth_map = torch.sum(weights * z_vals, dim=-1)
    return rgb_map.numpy(), depth_map.numpy()


def test_composite_parity(rng):
    H, W, D = 4, 6, 16
    rgb = rng.rand(H, W, D, 3).astype(np.float32)
    sigma = np.abs(rng.randn(H, W, D)).astype(np.float32)
    pts = rng.randint(0, 20, (H, W, D, 3)).astype(np.float32)
    ref_rgb, ref_depth = torch_composite(rgb, sigma, pts)
    got_rgb, got_depth = composite(jnp.asarray(rgb), jnp.asarray(sigma),
                                   jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(got_rgb), ref_rgb, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_depth), ref_depth, rtol=1e-4,
                               atol=1e-4)


def test_gather_frustum_lookup(rng):
    """Frustum points inside the grid read the right voxel feature."""
    X, Y, Z, C = 10, 10, 4, 2
    vol = rng.randn(X, Y, Z, C).astype(np.float32)
    dx = jnp.array([1.0, 1.0, 1.0])
    bx = jnp.array([-4.5, -4.5, -1.5])  # grid origin -5..5, -2..2
    nx = np.array([X, Y, Z])
    # one camera, frustum points at known ego positions
    geom = np.zeros((1, 3, 2, 2, 3), np.float32)
    geom[0, 0, 0, 0] = [-4.9, -4.9, -1.9]   # cell (0, 0, 0)
    geom[0, 1, 0, 0] = [0.2, 1.3, 0.7]      # cell (5, 6, 2)
    geom[0, 2, 0, 0] = [99.0, 0.0, 0.0]     # outside
    feat, mask, pts = _gather_frustum(jnp.asarray(vol), jnp.asarray(geom),
                                      dx, bx, nx)
    # feat is [N=1, H=2, W=2, D=3, C]
    np.testing.assert_allclose(np.asarray(feat)[0, 0, 0, 0], vol[0, 0, 0])
    np.testing.assert_allclose(np.asarray(feat)[0, 0, 0, 1], vol[5, 6, 2])
    assert not bool(mask[0, 0, 0, 2])
    assert bool(mask[0, 0, 0, 0]) and bool(mask[0, 0, 0, 1])
