"""Deformable conv: zero-offset == regular conv; offsets == numpy oracle."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from coocc_tpu.ops.dcn import deform_conv2d


def test_zero_offset_equals_conv(rng):
    B, H, W, Cin, Cout = 2, 6, 7, 4, 5
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    w = rng.randn(3, 3, Cin, Cout).astype(np.float32) * 0.2
    offset = np.zeros((B, H, W, 18), np.float32)

    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                                   jnp.asarray(w)))
    ref = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(w.transpose(3, 2, 0, 1)),
                   padding=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def _oracle(x, offset, w, groups=1):
    B, H, W, Cin = x.shape
    K = 3
    Cout = w.shape[-1]
    out = np.zeros((B, H, W, Cout), np.float32)
    cg_in = Cin // groups
    cg_out = Cout // groups
    for b in range(B):
        for oy in range(H):
            for ox in range(W):
                acc = np.zeros(Cout)
                for kk in range(9):
                    ky, kx = kk // K, kk % K
                    py = oy - 1 + ky + offset[b, oy, ox, 2 * kk]
                    px = ox - 1 + kx + offset[b, oy, ox, 2 * kk + 1]
                    y0, x0 = int(np.floor(py)), int(np.floor(px))
                    wy, wx = py - y0, px - x0
                    v = np.zeros(Cin)
                    for dy, fy in ((0, 1 - wy), (1, wy)):
                        for dx, fx in ((0, 1 - wx), (1, wx)):
                            yy, xx = y0 + dy, x0 + dx
                            if 0 <= yy < H and 0 <= xx < W:
                                v += fy * fx * x[b, yy, xx]
                    for g in range(groups):
                        acc[g * cg_out:(g + 1) * cg_out] += \
                            v[g * cg_in:(g + 1) * cg_in] @ \
                            w[ky, kx, :, g * cg_out:(g + 1) * cg_out]
                out[b, oy, ox] = acc
    return out


def test_deform_matches_oracle(rng):
    B, H, W, Cin, Cout = 1, 5, 6, 4, 6
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    w = rng.randn(3, 3, Cin // 2, Cout).astype(np.float32) * 0.2
    offset = (rng.randn(B, H, W, 18) * 0.7).astype(np.float32)
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                                   jnp.asarray(w), groups=2))
    ref = _oracle(x, offset, w, groups=2)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)
