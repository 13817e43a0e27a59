"""BEVDet4D shift_feature vs the torch grid_sample oracle.

Pins the exact reference semantics (bevdepth.py:195-249): feat2bev
conjugation of the planar ego motion, align_corners=True normalization,
zeros padding — evaluated against torch F.grid_sample on the reference's
[n, c, h, w] layout (h = our x axis, w = our y axis).
"""
import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from coocc_tpu.models.temporal import shift_bev_feature


def torch_shift_oracle(feat, l02l1, dx, bx):
    X, Y = feat.shape[1:3]
    inp = torch.from_numpy(feat).permute(0, 3, 1, 2)  # [1, C, X, Y]
    h, w = X, Y
    ys_ = torch.linspace(0, h - 1, h).view(h, 1).expand(h, w)
    xs_ = torch.linspace(0, w - 1, w).view(1, w).expand(h, w)
    grid = torch.stack((ys_, xs_, torch.ones_like(xs_)), -1)
    grid = grid.view(1, h, w, 3, 1)
    f2b = torch.zeros(3, 3)
    f2b[0, 0] = dx[0]
    f2b[1, 1] = dx[1]
    f2b[0, 2] = bx[0] - dx[0] / 2.0
    f2b[1, 2] = bx[1] - dx[1] / 2.0
    f2b[2, 2] = 1
    tf = torch.inverse(f2b) @ torch.from_numpy(l02l1[0]) @ f2b
    pts = (tf.view(1, 1, 1, 3, 3) @ grid).squeeze(-1)
    norm = torch.tensor([w - 1.0, h - 1.0])
    g = torch.stack([pts[..., 1], pts[..., 0]], -1) / norm * 2.0 - 1.0
    ref = F.grid_sample(inp, g, align_corners=True, padding_mode="zeros")
    return ref.permute(0, 2, 3, 1).numpy()


def test_shift_matches_torch_grid_sample(rng):
    X, Y, C = 12, 10, 3
    dx = (0.5, 0.4)
    bx = (-3.0, -2.0)
    feat = rng.randn(1, X, Y, C).astype(np.float32)
    th = 0.3
    l02l1 = np.array([[[np.cos(th), -np.sin(th), 0.7],
                       [np.sin(th), np.cos(th), -0.3],
                       [0.0, 0.0, 1.0]]], np.float32)
    got = np.asarray(shift_bev_feature(jnp.asarray(feat),
                                       jnp.asarray(l02l1), dx, bx))
    ref = torch_shift_oracle(feat, l02l1, dx, bx)
    np.testing.assert_allclose(got, ref, atol=2e-5)
