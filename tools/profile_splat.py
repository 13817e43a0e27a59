#!/usr/bin/env python
"""lift_splat internals: what do the sort / gather / segment-sum cost?"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from coocc_tpu.config import get_config
    from tools._prof import make_timer

    timed = make_timer()
    cfg = get_config("coocc_multi_r50_256x704")
    N, D, fH, fW, C = 6, 112, 16, 44, 128
    P = N * D * fH * fW
    n_vox = 100 * 100 * 8
    key = jax.random.PRNGKey(0)
    vox_id = jax.random.randint(key, (P,), 0, n_vox + 1)
    w = jax.random.uniform(jax.random.fold_in(key, 1), (P,), jnp.float32)
    feats = jax.random.normal(jax.random.fold_in(key, 2),
                              (N * fH * fW, C), jnp.float32)
    pix = jax.random.randint(jax.random.fold_in(key, 3), (P,), 0, N * fH * fW)

    timed("argsort P=473k", jax.jit(lambda v: jnp.argsort(v)), vox_id)

    order = jnp.argsort(vox_id)

    timed("take order [P]x2", jax.jit(
        lambda v, o, ww: (v[o], ww[o])), vox_id, order, w)

    timed("gather feats [P,128]", jax.jit(
        lambda f, p: f[p]), feats, pix[order])

    vb_s = vox_id[order]
    contrib = feats[pix[order]] * w[order][:, None]
    contrib = contrib.block_until_ready()

    timed("segsum sorted [P,128]", jax.jit(
        lambda c, v: jax.ops.segment_sum(c, v, num_segments=n_vox + 1,
                                         indices_are_sorted=True)),
        contrib, vb_s)

    timed("segsum UNsorted [P,128]", jax.jit(
        lambda c, v: jax.ops.segment_sum(c, v, num_segments=n_vox + 1)),
        contrib, vox_id)

    # bf16 variant of the whole splat
    def full(vid, ww, f, p):
        o = jnp.argsort(vid)
        c = f[p[o]] * ww[o][:, None]
        return jax.ops.segment_sum(c, vid[o], num_segments=n_vox + 1,
                                   indices_are_sorted=True)

    timed("full splat f32", jax.jit(full), vox_id, w, feats, pix)
    timed("full splat bf16", jax.jit(full), vox_id, w.astype(jnp.bfloat16),
          feats.astype(jnp.bfloat16), pix)

    # sort ONCE on (key) then use sorted segment ids: compare sort carrying
    # the f32 weight payload too (saves one gather)
    def full_sortpair(vid, ww, f, p):
        vid_s, w_s, p_s = jax.lax.sort((vid, ww, p), num_keys=1)
        c = f[p_s] * w_s[:, None]
        return jax.ops.segment_sum(c, vid_s, num_segments=n_vox + 1,
                                   indices_are_sorted=True)

    timed("full splat sort3", jax.jit(full_sortpair), vox_id, w, feats, pix)


if __name__ == "__main__":
    main()
