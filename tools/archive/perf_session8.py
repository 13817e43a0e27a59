#!/usr/bin/env python
"""Serialized TPU perf session 8 (full-leaf timer): semantic internals,
img-branch internals, res1 conv variants."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from coocc_tpu.config import get_config
    from tools._prof import make_timer

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    timed = make_timer()
    cfg = get_config("coocc_multi_r50_256x704")
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    # ---------------- A. semantic encoder internals ----------------
    if which in ("all", "A"):
        from coocc_tpu.nn.resnet3d import BasicBlock3D, CustomResNet3D
        from coocc_tpu.nn.fpn3d import FPN3D

        x0 = jax.random.normal(key, (1, 100, 100, 8, 128), dtype)
        enc = CustomResNet3D(depth=cfg.semantic.depth,
                             block_inplanes=cfg.semantic.block_inplanes,
                             block_strides=cfg.semantic.block_strides,
                             out_indices=cfg.semantic.out_indices,
                             dtype=dtype)
        ev = jax.jit(enc.init, static_argnames="train")(key, x0, train=False)
        timed("A enc full (4 stages)", lambda v, x: enc.apply(
            v, x, train=False), ev, x0)

        blk = BasicBlock3D(planes=128, stride=1, has_downsample=False,
                           dtype=dtype)
        bv = jax.jit(blk.init, static_argnames="train")(key, x0, train=False)
        timed("A one stage1 block", lambda v, x: blk.apply(
            v, x, train=False), bv, x0)

        # z-batch-persistent twin of one block: conv via 3-tap z-batch with
        # NO per-conv moveaxis (input already [B*Z, X, Y, C], z-pad rows)
        w1 = jax.random.normal(jax.random.fold_in(key, 1),
                               (3, 3, 3, 128, 128), dtype) * 0.02
        w2 = jax.random.normal(jax.random.fold_in(key, 2),
                               (3, 3, 3, 128, 128), dtype) * 0.02

        def conv_zb_resident(xzb, w):
            # xzb: [Z+2, X, Y, C] already padded in z(batch)
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
            # x: [B, X, Y, Z, C] -> persistent z-batch compute
            xzb = jnp.moveaxis(x[0], 2, 0)  # [Z, X, Y, C]
            pad = jnp.pad(xzb, ((1, 1), (0, 0), (0, 0), (0, 0)))
            y = conv_zb_resident(pad, w1)
            y = nn_relu(y)
            pad2 = jnp.pad(y, ((1, 1), (0, 0), (0, 0), (0, 0)))
            y = conv_zb_resident(pad2, w2)
            return jnp.moveaxis(nn_relu(y + xzb), 0, 2)[None]

        import flax.linen as _nn
        nn_relu = jax.nn.relu
        timed("A block zb-resident (no bn)", block_zb, x0)

        mids = []
        for i, c in enumerate(cfg.semantic.block_inplanes):
            s = 2 ** i
            mids.append(jax.random.normal(
                jax.random.fold_in(key, 10 + i),
                (1, 100 // s, 100 // s, max(8 // s, 1), c), dtype))
        neck = FPN3D(in_channels=cfg.semantic.block_inplanes,
                     out_channels=cfg.semantic.neck_out_channels, dtype=dtype)
        vn = jax.jit(neck.init, static_argnames="train")(key, mids,
                                                         train=False)
        timed("A fpn3d full", lambda v, m: neck.apply(
            v, list(m), train=False), vn, mids)

    # ---------------- B. img branch internals ----------------
    if which in ("all", "B"):
        from coocc_tpu.data.synthetic import synthetic_batch
        from coocc_tpu.nn.resnet2d import ResNet
        from coocc_tpu.nn.second_fpn import SECONDFPN
        from coocc_tpu.nn.depthnet import DepthNet

        batch = synthetic_batch(cfg, batch_size=1)
        imgs = jnp.asarray(batch.imgs).reshape(6, 256, 704, 3)
        res = ResNet(depth=50, dtype=dtype)
        rv = jax.jit(res.init, static_argnames="train")(key, imgs,
                                                        train=False)
        timed("B resnet50 x6", lambda v, x: res.apply(
            v, x, train=False), rv, imgs)
        feats = jax.jit(lambda v, x: res.apply(v, x, train=False))(rv, imgs)
        feats = [f.block_until_ready() for f in feats]

        fpn = SECONDFPN(in_channels=cfg.img_neck.in_channels,
                        out_channels=cfg.img_neck.out_channels,
                        upsample_strides=cfg.img_neck.upsample_strides,
                        dtype=dtype)
        fv = jax.jit(fpn.init, static_argnames="train")(
            key, feats, train=False)
        timed("B secondfpn", lambda v, f: fpn.apply(
            v, list(f), train=False), fv, feats)
        x16 = jax.jit(lambda v, f: fpn.apply(v, list(f), train=False))(
            fv, feats).block_until_ready()

        dn = DepthNet(mid_channels=512, context_channels=cfg.lss.numC_Trans,
                      depth_channels=cfg.grid.num_depth_bins, dtype=dtype)
        mlp_in = jax.random.normal(jax.random.fold_in(key, 3), (6, 27),
                                   jnp.float32)
        dv = jax.jit(dn.init, static_argnames="train")(
            key, x16, mlp_in, train=False)
        timed("B depthnet", lambda v, x, m: dn.apply(
            v, x, m, train=False), dv, x16, mlp_in)

    # ---------------- C. res1 conv variants ----------------
    if which in ("all", "C"):
        from coocc_tpu.nn.sparse_enc_packed import (_conv2d, _shift_ext,
                                                    _subm_ext_weight)

        C_, p = 32, 4
        x_pb = jax.random.normal(key, (1, 8, 400, 400, p * C_), dtype)
        w27 = jax.random.normal(jax.random.fold_in(key, 2), (27, C_, C_),
                                jnp.float32) * 0.05
        wext = jnp.asarray(_subm_ext_weight(w27, p), dtype)  # [3,3,192,128]

        def conv_ext(x):
            xe = _shift_ext(x, C_)
            return _conv2d(xe.reshape(8, 400, 400, 192), wext).astype(x.dtype)

        timed("C ext conv (current form)", conv_ext, x_pb)

        w128 = wext[:, :, :128, :]

        def conv_128(x):
            return _conv2d(x.reshape(8, 400, 400, 128), w128).astype(x.dtype)

        timed("C 128-lane conv (no carry)", conv_128, x_pb)

        def conv_ext_bf16acc(x):
            xe = _shift_ext(x, C_).reshape(8, 400, 400, 192)
            return jax.lax.conv_general_dilated(
                xe, wext.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)

        timed("C ext conv bf16 accum", conv_ext_bf16acc, x_pb)

        # conv expressed as 9 shifted GEMMs on pre-padded input
        xpad = jnp.pad(x_pb.reshape(8, 400, 400, 192 // 192 * 128),
                       ((0, 0), (1, 1), (1, 1), (0, 0)))

        def conv_9dot(x):
            xe = _shift_ext(x, C_).reshape(8, 400, 400, 192)
            xp = jnp.pad(xe, ((0, 0), (1, 1), (1, 1), (0, 0)))
            out = None
            for dx in range(3):
                for dy in range(3):
                    blk = jax.lax.dynamic_slice(
                        xp, (0, dx, dy, 0), (8, 400, 400, 192))
                    y = jax.lax.dot_general(
                        blk.reshape(-1, 192), wext[dx, dy],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    out = y if out is None else out + y
            return out.reshape(8, 400, 400, 128).astype(x.dtype)

        timed("C 9-dot conv", conv_9dot, x_pb)

    print("[perf session 8 done]", flush=True)


if __name__ == "__main__":
    main()
