#!/usr/bin/env python
"""Serialized TPU perf session 9: re-validate key probes with the
hoist-proof timer (perf_session8's C/knn numbers were partly hoisted)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from coocc_tpu.config import get_config
    from tools._prof import make_timer

    timed = make_timer()
    cfg = get_config("coocc_multi_r50_256x704")
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    # res1 conv forms
    from coocc_tpu.nn.sparse_enc_packed import (_conv2d, _shift_ext,
                                                _subm_ext_weight)

    C_, p = 32, 4
    x_pb = jax.random.normal(key, (1, 8, 400, 400, p * C_), dtype)
    w27 = jax.random.normal(jax.random.fold_in(key, 2), (27, C_, C_),
                            jnp.float32) * 0.05
    wext = jnp.asarray(_subm_ext_weight(w27, p), dtype)

    def conv_ext(x):
        xe = _shift_ext(x, C_)
        return _conv2d(xe.reshape(8, 400, 400, 192), wext).astype(x.dtype)

    timed("ext conv (current)", conv_ext, x_pb)

    w128 = wext[:, :, :128, :]

    def conv_128(x):
        return _conv2d(x.reshape(8, 400, 400, 128), w128).astype(x.dtype)

    timed("128-lane conv (no carry)", conv_128, x_pb)

    def shift_only(x):
        return _shift_ext(x, C_)

    timed("shift_ext alone", shift_only, x_pb)

    # carry as separate small conv + add (vs fat concat conv)
    wcar_up = wext[:, :, 128:160, :]   # up-carry input lanes
    wcar_dn = wext[:, :, 160:192, :]

    def conv_split_carry(x):
        main = _conv2d(x.reshape(8, 400, 400, 128), w128)
        up = jnp.concatenate(
            [x[:, 1:, ..., :C_], jnp.zeros_like(x[:, :1, ..., :C_])], 1)
        dn = jnp.concatenate(
            [jnp.zeros_like(x[:, :1, ..., -C_:]), x[:, :-1, ..., -C_:]], 1)
        car = _conv2d(jnp.concatenate([up, dn], -1).reshape(8, 400, 400, 64),
                      jnp.concatenate([wcar_up, wcar_dn], 2))
        return (main + car).reshape(x.shape[:-1] + (128,)).astype(x.dtype)

    timed("split-carry conv", conv_split_carry, x_pb)
    a = jax.jit(conv_ext)(x_pb)
    b = jax.jit(conv_split_carry)(x_pb)
    print("   split-carry agree:",
          float(jnp.abs(a.astype(jnp.float32)
                        - b.astype(jnp.float32)).max()), flush=True)

    # knn / gather / new samplers re-check
    from coocc_tpu.ops.window_knn import make_offsets, window_knn
    Xg, Yg, Zg, Cf = 100, 100, 8, 128
    ia = jax.random.uniform(key, (Xg, Yg, Zg)) < 0.4
    offsets = make_offsets(4, 4, 7, cfg.fuser.dist_thresh)
    timed("window_knn x1", lambda m: window_knn(m, offsets, 2), ia)

    from coocc_tpu.ops.grid_sample import (cascade_sample_3d,
                                           multicam_bilinear_gemm)
    cap, ratio = 20000, 2
    P = cap * 8
    imf = jax.random.normal(key, (6, 16, 44, 64), dtype)
    uv = jax.random.uniform(jax.random.fold_in(key, 1), (6, P, 2)) * 2 - 1
    m = jax.random.uniform(jax.random.fold_in(key, 2), (6, P)) < 0.3
    timed("mc one-hot GEMM (integrated)",
          lambda t, g, mm: multicam_bilinear_gemm(t, g, mm,
                                                  align_corners=True),
          imf, uv, m)
    vol = jax.random.normal(jax.random.fold_in(key, 3),
                            (100, 100, 8, 64), dtype)
    coarse = jnp.stack(
        [jax.random.randint(jax.random.fold_in(key, 4 + i), (cap,), 0, d)
         for i, d in enumerate((100, 100, 8))], -1).astype(jnp.int32)
    timed("cascade_sample_3d (integrated)",
          lambda v, c: cascade_sample_3d(v, c, ratio, (200, 200, 16)),
          vol, coarse)

    # semantic zb-resident re-check
    from coocc_tpu.nn.resnet3d import BasicBlock3D
    x0 = jax.random.normal(key, (1, 100, 100, 8, 128), dtype)
    blk = BasicBlock3D(planes=128, stride=1, has_downsample=False,
                       dtype=dtype)
    bv = jax.jit(blk.init, static_argnames="train")(key, x0, train=False)
    timed("stage1 block (current)", lambda v, x: blk.apply(
        v, x, train=False), bv, x0)

    w1 = jax.random.normal(jax.random.fold_in(key, 5),
                           (3, 3, 3, 128, 128), dtype) * 0.02

    def conv_zb_resident(xzb, w):
        out = None
        Z = xzb.shape[0] - 2
        for dz in range(3):
            y = jax.lax.conv_general_dilated(
                xzb, w[:, :, dz], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            y = y[dz:dz + Z]
            out = y if out is None else out + y
        return out.astype(xzb.dtype)

    def block_zb(x):
        xzb = jnp.moveaxis(x[0], 2, 0)
        pad = jnp.pad(xzb, ((1, 1), (0, 0), (0, 0), (0, 0)))
        y = jax.nn.relu(conv_zb_resident(pad, w1))
        pad2 = jnp.pad(y, ((1, 1), (0, 0), (0, 0), (0, 0)))
        y = conv_zb_resident(pad2, w1)
        return jnp.moveaxis(jax.nn.relu(y + xzb), 0, 2)[None]

    timed("stage1 block zb (no bn)", block_zb, x0)
    print("[perf session 9 done]", flush=True)


if __name__ == "__main__":
    main()
