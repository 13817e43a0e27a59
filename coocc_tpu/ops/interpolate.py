"""torch-compatible F.interpolate (bilinear / trilinear) in pure jnp.

Needed for parity in FPN3D top-down upsampling (fpn3d.py:94-96,
align_corners=False), OccHead multi-scale blending (occ_head.py:164),
eval-time logit upsampling (coocc_ray.py:661) and the renderer's x16 bilinear
upsample (coocc_ray.py:412-417). jax.image.resize implements neither torch's
align_corners=True nor its half-pixel variant exactly, so this builds the
separable 1-D gather weights explicitly.
"""
from __future__ import annotations

import jax.numpy as jnp


def _axis_weights(in_size: int, out_size: int, align_corners: bool):
    """Source indices (lo, hi) and lerp weight for one axis."""
    out = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        if out_size == 1:
            src = jnp.zeros((1,), jnp.float32)
        else:
            src = out * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = jnp.clip((out + 0.5) * scale - 0.5, 0.0, None)
    lo = jnp.floor(src).astype(jnp.int32)
    lo = jnp.clip(lo, 0, in_size - 1)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    w = src - lo
    return lo, hi, w


def _shift_edge(x: jnp.ndarray, axis: int, delta: int) -> jnp.ndarray:
    """x[i + delta] with edge replication, via slice+concat (no gathers)."""
    if delta == 0:
        return x
    idx = [slice(None)] * x.ndim
    edge = [slice(None)] * x.ndim
    if delta > 0:
        idx[axis] = slice(delta, None)
        edge[axis] = slice(-1, None)
        parts = [x[tuple(idx)]] + [x[tuple(edge)]] * delta
    else:
        idx[axis] = slice(None, delta)
        edge[axis] = slice(None, 1)
        parts = [x[tuple(edge)]] * (-delta) + [x[tuple(idx)]]
    return jnp.concatenate(parts, axis=axis)


def _upsample_int_axis(x: jnp.ndarray, axis: int, r: int) -> jnp.ndarray:
    """Integer-factor linear upsample, align_corners=False, gather-free.

    TPU note: the generic jnp.take path lowers to slow gathers (measured
    9.7 ms for ONE 2x trilinear upsample of [1,50,50,4,256] on v5e); the
    integer-ratio case reduces to r fixed-weight blends of +-1-shifted
    copies interleaved along the axis — pure slices and elementwise ops.
    """
    in_size = x.shape[axis]
    xm1 = _shift_edge(x, axis, -1)
    xp1 = _shift_edge(x, axis, +1)
    phases = []
    for p in range(r):
        f = (p + 0.5) / r - 0.5
        if f < 0:
            ph = x + (-f) * (xm1 - x)   # (-f)*x[i-1] + (1+f)*x[i]
        elif f == 0:
            ph = x
        else:
            ph = x + f * (xp1 - x)      # (1-f)*x[i] + f*x[i+1]
        phases.append(ph.astype(x.dtype))
    out = jnp.stack(phases, axis=axis + 1 if axis >= 0 else x.ndim + axis + 1)
    shape = list(x.shape)
    shape[axis] = in_size * r
    return out.reshape(shape)


def _resize_axis(x: jnp.ndarray, axis: int, out_size: int, align_corners: bool):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    axis = axis % x.ndim
    if (not align_corners) and out_size % in_size == 0 \
            and out_size // in_size <= 16:
        return _upsample_int_axis(x, axis, out_size // in_size)
    lo, hi, w = _axis_weights(in_size, out_size, align_corners)
    xl = jnp.take(x, lo, axis=axis)
    xh = jnp.take(x, hi, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = w.reshape(shape)
    return xl * (1 - w) + xh * w


def resize_linear(x: jnp.ndarray, out_sizes, spatial_axes,
                  align_corners: bool = False) -> jnp.ndarray:
    """Separable linear resize of `spatial_axes` to `out_sizes` (torch parity)."""
    for ax, s in zip(spatial_axes, out_sizes):
        x = _resize_axis(x, ax, int(s), align_corners)
    return x


def resize_trilinear_chlast(x: jnp.ndarray, out_size,
                            align_corners: bool = False) -> jnp.ndarray:
    """x: [..., X, Y, Z, C] -> [..., out_size..., C]."""
    n = x.ndim
    return resize_linear(x, out_size, (n - 4, n - 3, n - 2), align_corners)


def resize_bilinear_chlast(x: jnp.ndarray, out_size,
                           align_corners: bool = False) -> jnp.ndarray:
    """x: [..., H, W, C] -> [..., out_size..., C]."""
    n = x.ndim
    return resize_linear(x, out_size, (n - 3, n - 2), align_corners)
