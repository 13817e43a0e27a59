#!/usr/bin/env python
"""Serialized TPU perf session 7: matmul-shaped rewrites of the cascade
samplers (multicam one-hot GEMM; windowed batched-GEMM 3D sampler)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from coocc_tpu.config import get_config
    from coocc_tpu.nn.occ_head import fine_coordinates
    from coocc_tpu.ops.grid_sample import (_unnormalize, grid_sample_3d,
                                           multicam_grid_sample_2d)
    from tools._prof import make_timer

    timed = make_timer()
    cfg = get_config("coocc_multi_r50_256x704")
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    cap, ratio = 20000, 2
    P = cap * ratio ** 3
    N, fH, fW, C = 6, 16, 44, 64

    # ---------------- multicam one-hot GEMM ----------------
    imf = jax.random.normal(key, (N, fH, fW, C), dtype)
    uv = jax.random.uniform(jax.random.fold_in(key, 1), (N, P, 2)) * 2.2 - 1.1
    m = jax.random.uniform(jax.random.fold_in(key, 2), (N, P)) < 0.3

    def current(t, g, mm):
        s = multicam_grid_sample_2d(t, g, align_corners=True,
                                    padding_mode="zeros")
        return (s * mm[..., None]).sum(0)

    timed("mc current sample+masksum", current, imf, uv, m)

    def onehot(t, g, mm):
        # fold bilinear weights, zero-padding, camera mask and camera-sum
        # into ONE [P, N*fH*fW] @ [N*fH*fW, C] matmul
        ix = _unnormalize(g[..., 0], fW, True).T   # [P, N]
        iy = _unnormalize(g[..., 1], fH, True).T
        x0 = jnp.floor(ix).astype(jnp.int32)
        y0 = jnp.floor(iy).astype(jnp.int32)
        wx = (ix - x0).astype(dtype)
        wy = (iy - y0).astype(dtype)
        xi = jnp.arange(fW, dtype=jnp.int32)
        yi = jnp.arange(fH, dtype=jnp.int32)
        mmd = mm.T.astype(dtype)  # [P, N]
        # [P, N, fW] / [P, N, fH] separable one-hot-of-2 weight rows
        wxr = ((xi == x0[..., None]).astype(dtype) * (1 - wx)[..., None]
               + (xi == (x0 + 1)[..., None]).astype(dtype) * wx[..., None])
        wyr = ((yi == y0[..., None]).astype(dtype) * (1 - wy)[..., None]
               + (yi == (y0 + 1)[..., None]).astype(dtype) * wy[..., None])
        wyr = wyr * mmd[..., None]
        # [P, N, fH, fW] one-hot built with P leading (no big transpose)
        W = (wyr[..., :, None] * wxr[..., None, :]).reshape(P, N * fH * fW)
        return jax.lax.dot_general(
            W, t.reshape(N * fH * fW, C).astype(dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    timed("mc one-hot GEMM", onehot, imf, uv, m)
    a = jax.jit(current)(imf, uv, m)
    b = jax.jit(onehot)(imf, uv, m)
    print("   mc agree:", float(jnp.abs(
        a.astype(jnp.float32) - b.astype(jnp.float32)).max()),
        "scale", float(jnp.abs(a.astype(jnp.float32)).max()), flush=True)

    # ---------------- windowed 3D cascade sampler ----------------
    Xv, Yv, Zv = 100, 100, 8
    SX, SY, SZ = 200, 200, 16  # final_occ_size
    blended = jax.random.normal(jax.random.fold_in(key, 3),
                                (Xv, Yv, Zv, C), dtype)
    coarse = jnp.stack([
        jax.random.randint(jax.random.fold_in(key, 4), (cap,), 0, Xv),
        jax.random.randint(jax.random.fold_in(key, 5), (cap,), 0, Yv),
        jax.random.randint(jax.random.fold_in(key, 6), (cap,), 0, Zv),
    ], -1).astype(jnp.int32)

    def via_grid_sample(vol_xyz, cc):
        fine = fine_coordinates(cc, ratio)
        norm = (fine.astype(jnp.float32)
                / (jnp.array([SX, SY, SZ], jnp.float32) - 1) - 0.5) * 2
        vol = jnp.transpose(vol_xyz, (2, 1, 0, 3))  # [Z, Y, X, C]
        return grid_sample_3d(vol, norm, align_corners=False,
                              padding_mode="zeros")

    timed("3d via grid_sample (current)", via_grid_sample, blended, coarse)

    def axis_w(cc_axis, S, V):
        """Per-child absolute corner weights over a 3-slot window + base.

        cc_axis: [cap] coarse coord. Returns base [cap], w [cap, ratio, 3].
        """
        ch = jnp.arange(ratio, dtype=jnp.int32)
        fine = cc_axis[:, None] * ratio + ch  # [cap, ratio]
        normf = (fine.astype(jnp.float32) / (S - 1) - 0.5) * 2
        ixf = _unnormalize(normf, V, False)
        x0 = jnp.floor(ixf).astype(jnp.int32)  # [cap, ratio]
        fx = ixf - x0
        base = jnp.clip(x0[:, 0], 0, V - 3)  # [cap]
        slot = jnp.arange(3, dtype=jnp.int32)
        absx = base[:, None, None] + slot  # [cap, 1, 3]
        okl = (x0 >= 0) & (x0 < V)
        okh = (x0 + 1 >= 0) & (x0 + 1 < V)
        w = ((absx == x0[..., None]) * ((1 - fx) * okl)[..., None]
             + (absx == (x0 + 1)[..., None]) * (fx * okh)[..., None])
        return base, w.astype(jnp.float32)  # [cap, ratio, 3]

    def windowed(vol_xyz, cc):
        bx, wx = axis_w(cc[:, 0], SX, Xv)
        by, wy = axis_w(cc[:, 1], SY, Yv)
        bz, wz = axis_w(cc[:, 2], SZ, Zv)
        # gather 3x3 xy window of full-z columns from [Xv*Yv, Zv*C]
        tab = vol_xyz.reshape(Xv * Yv, Zv * C)
        i3 = jnp.arange(3, dtype=jnp.int32)
        rows = ((bx[:, None, None] + i3[None, :, None]) * Yv
                + by[:, None, None] + i3[None, None, :])  # [cap, 3, 3]
        Ncol = tab[rows.reshape(-1)].reshape(cap, 9, Zv, C)
        # z one-hot over the full Zv: wz3 [cap, ratio, 3] + bz -> [cap,r,Zv]
        zslot = jnp.arange(Zv, dtype=jnp.int32)
        wzf = jnp.zeros((cap, ratio, Zv))
        for s in range(3):
            wzf = wzf + wz[:, :, s:s + 1] * (
                zslot[None, None, :] == (bz[:, None, None] + s))
        # combined weights over children^3 x window (3,3,Zv)
        # child index raster (cx, cy, cz) must match fine_coordinates
        Wc = (wx[:, :, None, None, :, None, None]      # [cap,rx,1,1,3,1,1]
              * wy[:, None, :, None, None, :, None]    # [cap,1,ry,1,1,3,1]
              * wzf[:, None, None, :, None, None, :])  # [cap,1,1,rz,1,1,Zv]
        Wc = Wc.reshape(cap, ratio ** 3, 9 * Zv).astype(dtype)
        Nmat = Ncol.transpose(0, 1, 2, 3).reshape(cap, 9 * Zv, C)
        out = jnp.einsum("qck,qkd->qcd", Wc, Nmat.astype(dtype),
                         preferred_element_type=jnp.float32)
        return out.reshape(cap * ratio ** 3, C)

    timed("3d windowed batched GEMM", windowed, blended, coarse)
    a = jax.jit(via_grid_sample)(blended, coarse)
    b = jax.jit(windowed)(blended, coarse)
    print("   3d agree:", float(jnp.abs(
        a.astype(jnp.float32) - b.astype(jnp.float32)).max()),
        "scale", float(jnp.abs(a.astype(jnp.float32)).max()), flush=True)

    # ---------------- gather row-size scaling ----------------
    for rows, width in ((80000, 64), (10000, 512), (2500, 2048)):
        tabr = jax.random.normal(key, (rows, width), dtype)
        nidx = P * 64 // width  # constant total bytes
        idx = jax.random.randint(jax.random.fold_in(key, rows),
                                 (nidx,), 0, rows)
        timed(f"gather {width}ch x {nidx}",
              lambda t, i: t[i], tabr, idx)

    print("[perf session 7 done]", flush=True)


if __name__ == "__main__":
    main()
