#!/usr/bin/env python
"""Serialized TPU perf session 6: cascade fine-path internals (full-leaf
reduction timer), select_occupied rank-scatter A/B, sampling probes."""
from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from coocc_tpu.config import get_config
    from coocc_tpu.nn.occ_head import (fine_coordinates,
                                       project_points_on_img,
                                       select_occupied)
    from coocc_tpu.ops.grid_sample import (grid_sample_3d,
                                           multicam_grid_sample_2d)
    from tools._prof import make_timer

    timed = make_timer()
    cfg = get_config("coocc_multi_r50_256x704")
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    X, Y, Z = 100, 100, 8
    cap = cfg.occ_head.max_coarse_occupied  # 20000
    ratio = 2
    P = cap * ratio ** 3
    n = X * Y * Z

    occ_mask = jax.random.uniform(key, (X, Y, Z)) < 0.3

    # ---- select: argsort (current) vs rank-scatter (eval order)
    timed("select argsort (current)",
          lambda m: select_occupied(m, cap, None), occ_mask)

    def select_rank(m):
        flat = m.reshape(-1)
        rank = jnp.cumsum(flat.astype(jnp.int32)) - flat.astype(jnp.int32)
        # scatter cell-id into its rank slot (only first `cap` kept)
        tgt = jnp.where(flat & (rank < cap), rank, cap)
        idx = jnp.zeros((cap + 1,), jnp.int32).at[tgt].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")[:cap]
        valid = jnp.arange(cap) < jnp.sum(flat.astype(jnp.int32))
        z = idx % Z
        y = (idx // Z) % Y
        x = idx // (Z * Y)
        return jnp.stack([x, y, z], -1).astype(jnp.int32), valid

    timed("select rank-scatter", select_rank, occ_mask)
    a = jax.jit(lambda m: select_occupied(m, cap, None))(occ_mask)
    b = jax.jit(select_rank)(occ_mask)
    import numpy as np
    na, nb = np.asarray(a[0]), np.asarray(b[0])
    va, vb = np.asarray(a[1]), np.asarray(b[1])
    print("   select agree coords:", bool((na[va] == nb[vb]).all()),
          "valid:", bool((va == vb).all()), flush=True)

    # ---- 3D voxel sampling at P points
    vol = jax.random.normal(key, (Z, Y, X, 64), dtype)
    norm3 = jax.random.uniform(jax.random.fold_in(key, 1), (P, 3)) * 2 - 1

    timed("grid_sample_3d P=160k C=64",
          lambda v, g: grid_sample_3d(v, g, align_corners=False,
                                      padding_mode="zeros"), vol, norm3)

    # ---- projection + multicam 2D sampling
    N, fH, fW = 6, 16, 44
    imf = jax.random.normal(jax.random.fold_in(key, 2), (N, fH, fW, 64),
                            dtype)
    uv = jax.random.uniform(jax.random.fold_in(key, 3), (N, P, 2)) * 2 - 1
    m = jax.random.uniform(jax.random.fold_in(key, 4), (N, P)) < 0.3

    timed("multicam 2d sample P=160k",
          lambda t, g: multicam_grid_sample_2d(t, g, align_corners=True,
                                               padding_mode="zeros"),
          imf, uv)

    def mc_sum(t, g, mm):
        s = multicam_grid_sample_2d(t, g, align_corners=True,
                                    padding_mode="zeros")
        return (s * mm[..., None]).sum(0)

    timed("multicam sample+masksum", mc_sum, imf, uv, m)

    fine = jax.random.randint(jax.random.fold_in(key, 5), (P, 3), 0, 200)
    rots = jnp.broadcast_to(jnp.eye(3), (N, 3, 3))
    trans = jnp.zeros((N, 3))
    intr = jnp.broadcast_to(jnp.diag(jnp.array([500., 500., 1.])), (N, 3, 3))
    prots = jnp.broadcast_to(jnp.eye(3), (N, 3, 3))
    ptr = jnp.zeros((N, 3))
    bda = jnp.eye(3)

    timed("project_points_on_img",
          lambda f: project_points_on_img(
              f.astype(jnp.float32), rots, trans, intr, prots, ptr, bda,
              pts_range=cfg.occ_head.point_cloud_range,
              img_hw=cfg.occ_head.input_size,
              occ_whd=tuple(cfg.occ_head.final_occ_size)), fine)

    # ---- tail: GN + fc2 chain at P
    from coocc_tpu.nn.layers import GroupNorm, Linear
    import flax.linen as nn

    class Tail(nn.Module):
        @nn.compact
        def __call__(self, acc):
            x = nn.relu(GroupNorm(16, name="gn")(acc))
            return Linear(17, name="fc2")(x)

    tail = Tail()
    acc = jax.random.normal(key, (P, 64), jnp.float32)
    tv = tail.init(key, acc)
    timed("tail GN+fc2 (fp32)", lambda v, x: tail.apply(v, x), tv, acc)

    print("[perf session 6 done]", flush=True)


if __name__ == "__main__":
    main()
