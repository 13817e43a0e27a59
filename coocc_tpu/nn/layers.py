"""Foundation layers with torch-compatible semantics, channels-last layouts.

Padding note: torch Conv2d/3d pads symmetrically and floors the output size;
XLA 'SAME' distributes padding differently for even sizes under stride 2, so
every conv here uses explicit (lo, hi) padding pairs — bit-parity with
converted checkpoints depends on it.

BatchNorm follows torch eps/momentum conventions (torch momentum m updates
running <- (1-m)*running + m*batch; flax momentum is the decay 1-m).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.conv_acc import conv2d_f32acc


def _pad_tuple(padding, rank):
    if isinstance(padding, int):
        return [(padding, padding)] * rank
    return [(p, p) if isinstance(p, int) else tuple(p) for p in padding]


# --- SyncBN context ---------------------------------------------------------
# Inside a shard_map'd train step each device sees a batch shard; setting
# this context while TRACING makes every BatchNorm psum its batch statistics
# over the named mesh axis — the TPU-native SyncBN (reference converts
# BN->SyncBN at tools/train.py:222-223). Trace-time only: the value is baked
# into the jitted program, so the context manager must wrap the trace
# (shard_map body), not the execution.
_BN_SYNC_AXIS = [None]


class bn_sync_axis:
    """Context manager: BatchNorms traced inside sync stats over axis_name."""

    def __init__(self, axis_name: Optional[str]):
        self.axis_name = axis_name

    def __enter__(self):
        self.prev = _BN_SYNC_AXIS[0]
        _BN_SYNC_AXIS[0] = self.axis_name
        return self

    def __exit__(self, *exc):
        _BN_SYNC_AXIS[0] = self.prev
        return False


class Conv2d(nn.Module):
    """torch-style Conv2d on [..., H, W, C]."""
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    padding: Any = 0
    dilation: Tuple[int, int] = (1, 1)
    groups: int = 1
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.stride,
            padding=_pad_tuple(self.padding, 2),
            kernel_dilation=self.dilation,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)


def _zslice_tap_conv(xc, w, pads, stride, groups):
    """Sum of per-z-tap conv2ds over z-batched [B, Z, X, Y, C] input.

    For each z tap the needed z planes are sliced on the INPUT side
    (static strided slice), so the conv computes exactly the slices that
    reach the output. The padded-stack form (COOCC_ZPAD_STACK=1) instead
    convolves all Z+plo+phi slices per tap and discards — 27% wasted
    MACs at Z=8 stride-1, ~60% for stride-2-z, ~67% at Z=1.

    Returns fp32 [B, Zout, Xo, Yo, Co]; numerics identical to the padded
    form (the dropped taps contributed exact fp32 zeros).
    """
    import jax

    sx, sy, sz = stride
    plo, phi = pads[2]
    kx, ky, kz, _, Co = w.shape
    B, Z, X, Y, C = xc.shape
    Zout = (Z + plo + phi - kz) // sz + 1
    Xo = (X + pads[0][0] + pads[0][1] - kx) // sx + 1
    Yo = (Y + pads[1][0] + pads[1][1] - ky) // sy + 1
    out = None
    for dz in range(kz):
        zi0 = dz - plo  # input z read by output 0 for this tap
        lo = 0 if zi0 >= 0 else (-zi0 + sz - 1) // sz
        hi = min(Zout - 1, (Z - 1 - zi0) // sz) if zi0 <= Z - 1 else -1
        if lo > hi:
            continue  # tap lands entirely in z padding
        n = hi - lo + 1
        start = zi0 + sz * lo
        xs = jax.lax.slice_in_dim(xc, start, start + sz * (n - 1) + 1, sz,
                                  axis=1)
        y = conv2d_f32acc(xs.reshape(B * n, X, Y, C), w[:, :, dz],
                          (sx, sy), (pads[0], pads[1]), groups)
        y = y.reshape(B, n, Xo, Yo, Co)
        full = lo == 0 and hi == Zout - 1
        if out is None:
            out = y if full else jnp.zeros(
                (B, Zout, Xo, Yo, Co), jnp.float32).at[:, lo:hi + 1].set(y)
        else:
            out = out + y if full else out.at[:, lo:hi + 1].add(y)
    if out is None:  # degenerate: every tap in padding
        out = jnp.zeros((B, Zout, Xo, Yo, Co), jnp.float32)
    return out


def _ztap_cat_conv(xc, w, pads, stride, groups):
    """ONE conv2d for the whole 3D kernel: z taps concatenated into lanes.

    xc: z-batched [B, Z, X, Y, C]. The kz z-taps are sliced on the input
    side (like _zslice_tap_conv) but CONCATENATED along channels instead of
    summed across kz separate conv2ds, so XLA sees a single implicit GEMM
    with K = kx*ky*kz*C. Measured on v5e at the fuser-tail shapes
    (100x100x8, 512->256->128): 8.76 ms (zslice, 81 TF/s) -> 1.97 ms
    (358 TF/s, 91% of bf16 peak). Exact same math — the weight reshape
    [kx,ky,kz,Ci,Co] -> [kx,ky,kz*Ci,Co] matches the tap-major concat.

    Requires groups == 1 (lane concat breaks group structure); callers
    fall back to _zslice_tap_conv otherwise. Returns fp32.
    """
    import jax

    sx, sy, sz = stride
    plo, phi = pads[2]
    kx, ky, kz, Ci, Co = w.shape
    B, Z, X, Y, C = xc.shape
    Zout = (Z + plo + phi - kz) // sz + 1
    xp = jnp.pad(xc, ((0, 0), (plo, phi), (0, 0), (0, 0), (0, 0)))
    slabs = [
        jax.lax.slice_in_dim(xp, dz, dz + (Zout - 1) * sz + 1, sz, axis=1)
        for dz in range(kz)
    ]
    cat = jnp.concatenate(slabs, axis=-1)          # [B, Zout, X, Y, kz*C]
    y = conv2d_f32acc(cat.reshape(B * Zout, X, Y, kz * C),
                      w.reshape(kx, ky, kz * Ci, Co),
                      (sx, sy), (pads[0], pads[1]), 1)
    return y.reshape(B, Zout, y.shape[1], y.shape[2], Co)


class _Conv3dParams(nn.Module):
    """Param holder with nn.Conv's exact tree (kernel [kx,ky,kz,Ci,Co], bias)."""
    features: int
    kernel_size: Tuple[int, int, int]
    in_features: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel_size, self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,)) if self.use_bias else None
        return kernel, bias


class Conv3d(nn.Module):
    """torch-style Conv3d on [..., X, Y, Z, C] (any 3 trailing spatial dims).

    TPU note: XLA's native 3D convolution runs at ~4% of MXU peak at this
    model's shapes (measured on v5e), so kernels with a z extent are
    decomposed into kz 2D convolutions with z folded into the BATCH dim —
    same math, measured ~10x faster. Parameter tree is identical to nn.Conv
    ("conv"/kernel+bias), so checkpoints are unaffected.
    """
    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Any = 0
    groups: int = 1
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, zb: bool = False):
        import os
        pads = _pad_tuple(self.padding, 3)
        kx, ky, kz = self.kernel_size
        if zb:
            # z-batch-RESIDENT layout [B, Z, X, Y, C] in and out: skips the
            # two 20MB+ moveaxis transposes _zbatch pays per call (measured
            # 1.54 -> 0.47 ms for a stage-1 semantic block on v5e)
            return self._zbatch_resident(x, pads)
        if x.ndim == 5 and self.groups == 1 and kz > 1 \
                and not os.environ.get("COOCC_CONV3D_NATIVE"):
            return self._zbatch(x, pads)
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.stride,
            padding=pads,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)

    def _zbatch_resident(self, x, pads):
        """x: [B, Z, X, Y, C] -> [B, Zout, Xout, Yout, Co] (z in batch)."""
        import jax
        import os

        kx, ky, kz = self.kernel_size
        sx, sy, sz = self.stride
        B, Z, X, Y, C = x.shape
        kernel, bias = _Conv3dParams(self.features, self.kernel_size,
                                     C // self.groups, self.use_bias,
                                     name="conv")()
        cd = self.dtype or x.dtype
        xc = x.astype(cd)
        w = kernel.astype(cd)
        (plo, phi) = pads[2]
        Zout = (Z + plo + phi - kz) // sz + 1
        if kz == 1:
            xt = xc[:, ::sz] if sz > 1 else xc
            xt = xt[:, :Zout].reshape(B * Zout, X, Y, C)
            out = conv2d_f32acc(xt, w[:, :, 0], (sx, sy),
                                (pads[0], pads[1]), self.groups)
            out = out.reshape(B, Zout, out.shape[1], out.shape[2], -1)
        elif os.environ.get("COOCC_ZPAD_STACK"):
            out = self._zpad_stack(xc, w, pads)
        elif self.groups == 1 and not os.environ.get("COOCC_ZSLICE_TAP") \
                and not (sz > 1 and Z % 2 == 1):
            # odd-Z strided convs go through _zslice_tap_conv: the cat form
            # at [1, 3, 32, 32, 512] -> 1024 s2 (openoccupancy semantic
            # stage 3, Z 3 -> 2) KILLS the TPU worker ("kernel fault",
            # bisected tools/repro_openocc_sem.py c31, round 5); the zslice
            # and zpad lowerings run the same shapes fine. Even-Z strided
            # convs (all flagship shapes) stay on the measured-fast path.
            out = _ztap_cat_conv(xc, w, pads, self.stride, self.groups)
        else:
            out = _zslice_tap_conv(xc, w, pads, self.stride, self.groups)
        out = out.astype(cd)
        if bias is not None:
            out = out + bias.astype(cd)
        return out

    def _zpad_stack(self, xc, w, pads):
        """Legacy padded-stack tap sum (kept for on-chip A/B): convolves all
        Z+plo+phi slices per tap and slices the OUTPUT, wasting up to 75%
        of the MACs vs _zslice_tap_conv. xc: [B, Z, X, Y, C] -> fp32
        [B, Zout, Xo, Yo, Co]."""
        import jax

        kz = self.kernel_size[2]
        sx, sy, sz = self.stride
        B, Z, X, Y, C = xc.shape
        (plo, phi) = pads[2]
        Zout = (Z + plo + phi - kz) // sz + 1
        Zpad = Z + plo + phi
        xt = jnp.pad(xc, ((0, 0), (plo, phi), (0, 0), (0, 0), (0, 0)))
        xt = xt.reshape(B * Zpad, X, Y, C)
        out = None
        for dz in range(kz):
            y = conv2d_f32acc(xt, w[:, :, dz], (sx, sy),
                              (pads[0], pads[1]), self.groups)
            Xo, Yo, Co = y.shape[1], y.shape[2], y.shape[3]
            y = y.reshape(B, Zpad, Xo, Yo, Co)
            y = jax.lax.slice_in_dim(y, dz, dz + (Zout - 1) * sz + 1, sz,
                                     axis=1)
            out = y if out is None else out + y
        return out

    def _zbatch(self, x, pads):
        import os

        kx, ky, kz = self.kernel_size
        B, X, Y, Z, C = x.shape
        kernel, bias = _Conv3dParams(self.features, self.kernel_size,
                                     C // self.groups, self.use_bias,
                                     name="conv")()
        cd = self.dtype or x.dtype
        xc = jnp.moveaxis(x.astype(cd), 3, 1)  # [B, Z, X, Y, C]
        w = kernel.astype(cd)
        if os.environ.get("COOCC_ZPAD_STACK"):
            out = self._zpad_stack(xc, w, pads)
        elif not os.environ.get("COOCC_ZSLICE_TAP") \
                and not (self.stride[2] > 1 and Z % 2 == 1):
            # same odd-Z strided reroute as _zbatch_resident (TPU worker
            # kill at the openoccupancy stage-3 shapes, round-5 bisect)
            out = _ztap_cat_conv(xc, w, pads, self.stride, 1)
        else:
            out = _zslice_tap_conv(xc, w, pads, self.stride, 1)
        out = out.astype(cd)
        if bias is not None:
            out = out + bias.astype(cd)
        return jnp.moveaxis(out, 1, 3)


class ConvTranspose3d(nn.Module):
    """torch-style ConvTranspose3d (deconv) used by SECOND3DFPN upsampling."""
    features: int
    kernel_size: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # torch deconv output size = (n-1)*s + k with padding 0; flax
        # ConvTranspose with padding 'VALID' matches.
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.stride,
            padding="VALID",
            use_bias=self.use_bias,
            dtype=self.dtype,
            transpose_kernel=True,
            name="conv",
        )(x)


class BatchNorm(nn.Module):
    """torch-compatible BatchNorm over the last axis (any leading layout).

    In a pjit data-parallel step, pass axis_name to sync batch stats across
    devices — the TPU-native SyncBN (reference converts BN->SyncBN,
    tools/train.py:222-223); XLA turns it into a fused psum.
    """
    eps: float = 1e-5
    momentum: float = 0.1
    use_running_average: Optional[bool] = None
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        axis = self.axis_name if self.axis_name is not None \
            else _BN_SYNC_AXIS[0]
        return nn.BatchNorm(
            use_running_average=ura,
            momentum=1.0 - self.momentum,
            epsilon=self.eps,
            axis_name=None if ura else axis,
            dtype=self.dtype,
            name="bn",
        )(x)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over rows of a [A, C] padded sparse-feature matrix.

    torch BatchNorm1d over spconv features normalizes across ACTIVE voxels
    only; padding rows must not contaminate the statistics, so mean/var are
    computed with the validity mask.
    """
    eps: float = 1e-5
    momentum: float = 0.1
    use_running_average: Optional[bool] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask, use_running_average: Optional[bool] = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))

        if ura:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = mask.astype(x.dtype)[:, None]
            n = jnp.maximum(m.sum(), 1.0)
            axis = self.axis_name if self.axis_name is not None \
                else _BN_SYNC_AXIS[0]
            if axis is not None:
                import jax
                n = jax.lax.psum(n, axis)
                mean = jax.lax.psum((x * m).sum(0), axis) / n
                var = jax.lax.psum(((x - mean) ** 2 * m).sum(0),
                                   axis) / n
            else:
                mean = (x * m).sum(0) / n
                var = ((x - mean) ** 2 * m).sum(0) / n
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value \
                    + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value \
                    + self.momentum * var * n / jnp.maximum(n - 1, 1.0)
        y = (x - mean) / jnp.sqrt(var + self.eps) * scale + bias
        return y * mask[:, None]


class GroupNorm(nn.Module):
    """torch-compatible GroupNorm over the last axis."""
    num_groups: int
    eps: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.eps, dtype=self.dtype,
            name="gn",
        )(x)


class Linear(nn.Module):
    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.features, use_bias=self.use_bias,
                        dtype=self.dtype, name="linear")(x)


def max_pool_2d(x, kernel=3, stride=2, padding=1):
    """torch MaxPool2d on [..., H, W, C] (pads with -inf, floors output)."""
    return nn.max_pool(
        x, window_shape=(kernel, kernel), strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
    )


def avg_pool_global_2d(x):
    """AdaptiveAvgPool2d((1,1)) on [..., H, W, C] -> [..., 1, 1, C]."""
    return jnp.mean(x, axis=(-3, -2), keepdims=True)
