"""Deformable convolution v1 as bilinear gather + MXU matmul.

Replaces the mmcv DCN CUDA op used inside DepthNet's depth branch
(reference: build_conv_layer(dict(type='DCN', kernel_size=3, padding=1,
groups=4)), ViewTransformerLSSBEVDepth.py:524-532) with an XLA formulation:
for each of the 9 kernel taps, sample the input at (p + tap + offset_tap(p))
with bilinear interpolation (out-of-bounds -> 0, matching mmcv), stack the
taps and contract with the (grouped) weight in a single dot_general.

Offset layout matches mmcv/torchvision: [B, H, W, 2*G_off*Kh*Kw] with
(dy, dx) pairs per offset-group then per tap (row-major taps).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_sample_hw(x, py, px):
    """x: [H, W, C]; py/px: [...] float positions. Zeros outside. -> [..., C]"""
    H, W, _ = x.shape
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = py - y0
    wx = px - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(yi, xi):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        v = x[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return v * inb[..., None]

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    wy_ = wy[..., None]
    wx_ = wx[..., None]
    return (v00 * (1 - wy_) * (1 - wx_) + v01 * (1 - wy_) * wx_
            + v10 * wy_ * (1 - wx_) + v11 * wy_ * wx_)


def deform_conv2d(x, offset, weight, *, kernel_size=3, padding=1, stride=1,
                  groups=1, deform_groups=1, bias=None):
    """DCNv1 forward.

    Args:
      x:      [B, H, W, Cin]
      offset: [B, Ho, Wo, 2 * deform_groups * K * K], (dy, dx) per tap.
      weight: [K, K, Cin // groups, Cout] (HWIO grouped layout).
      bias:   optional [Cout].

    Returns [B, Ho, Wo, Cout].
    """
    B, H, W, Cin = x.shape
    K = kernel_size
    Cout = weight.shape[-1]
    Ho = (H + 2 * padding - K) // stride + 1
    Wo = (W + 2 * padding - K) // stride + 1

    base_y = jnp.arange(Ho) * stride - padding
    base_x = jnp.arange(Wo) * stride - padding
    off = offset.reshape(B, Ho, Wo, deform_groups, K * K, 2)

    cg = Cin // deform_groups

    def one_image(xi, offi):
        taps = []
        for kk in range(K * K):
            ky, kx = kk // K, kk % K
            py = (base_y[:, None, None] + ky) + offi[:, :, :, kk, 0]  # [Ho,Wo,Gd]
            px = (base_x[None, :, None] + kx) + offi[:, :, :, kk, 1]
            if deform_groups == 1:
                s = _bilinear_sample_hw(xi, py[..., 0], px[..., 0])
            else:
                parts = [
                    _bilinear_sample_hw(xi[..., g * cg:(g + 1) * cg],
                                        py[..., g], px[..., g])
                    for g in range(deform_groups)
                ]
                s = jnp.concatenate(parts, axis=-1)
            taps.append(s)
        return jnp.stack(taps, axis=-2)  # [Ho, Wo, K*K, Cin]

    sampled = jax.vmap(one_image)(x, off)  # [B, Ho, Wo, K2, Cin]

    cin_g = Cin // groups
    cout_g = Cout // groups
    s = sampled.reshape(B, Ho, Wo, K * K, groups, cin_g)
    # weight [K, K, cin_g, Cout]: group g owns output columns g*cout_g:... and
    # input channels g*cin_g:... -> split the OUTPUT dim by group
    w = weight.reshape(K * K, cin_g, groups, cout_g)
    out = jnp.einsum("bhwkgc,kcgd->bhwgd", s, w,
                     preferred_element_type=jnp.float32)
    out = out.reshape(B, Ho, Wo, Cout).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out
