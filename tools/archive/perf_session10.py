#!/usr/bin/env python
"""Serialized TPU perf session 10: shift_ext build variants + honest fuser
internals (timer now perturbs bool/int leaves too)."""
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

    # ---- shift_ext variants
    from coocc_tpu.nn.sparse_enc_packed import (_conv2d, _shift_ext,
                                                _subm_ext_weight)

    C_, p = 32, 4
    x_pb = jax.random.normal(key, (1, 8, 400, 400, p * C_), dtype)
    w27 = jax.random.normal(jax.random.fold_in(key, 2), (27, C_, C_),
                            jnp.float32) * 0.05
    wext = jnp.asarray(_subm_ext_weight(w27, p), dtype)

    timed("shift_ext current (3-concat)", lambda x: _shift_ext(x, C_), x_pb)

    def shift_pad_add(x):
        # up lanes via whole-tensor pack shift, sliced: one roll-like pad
        up = jnp.pad(x[:, 1:, ..., :C_],
                     ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
        dn = jnp.pad(x[:, :-1, ..., -C_:],
                     ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
        return jnp.concatenate([x, up, dn], -1)

    timed("shift_ext pad-based", shift_pad_add, x_pb)

    def shift_dus(x):
        B, bz, X, Y, L = x.shape
        out = jnp.zeros((B, bz, X, Y, L + 2 * C_), x.dtype)
        out = jax.lax.dynamic_update_slice(out, x, (0, 0, 0, 0, 0))
        up = jnp.pad(x[:, 1:, ..., :C_],
                     ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
        out = jax.lax.dynamic_update_slice(out, up, (0, 0, 0, 0, L))
        dn = jnp.pad(x[:, :-1, ..., -C_:],
                     ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
        return jax.lax.dynamic_update_slice(out, dn, (0, 0, 0, 0, L + C_))

    timed("shift_ext dyn-update", shift_dus, x_pb)
    a = jax.jit(lambda x: _shift_ext(x, C_))(x_pb)
    for nm, f in (("pad", shift_pad_add), ("dus", shift_dus)):
        b = jax.jit(f)(x_pb)
        print(f"   {nm} agree:", float(jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32)).max()),
            flush=True)

    def conv_ext_pad(x):
        return _conv2d(shift_pad_add(x).reshape(8, 400, 400, 192),
                       wext).astype(x.dtype)

    timed("ext conv w/ pad-based shift", conv_ext_pad, x_pb)

    # carry-in-Y trick: append 2 x-rows holding up/dn carries, conv with a
    # taller kernel? (shape probe only: conv cost at [8,402,400,128])
    def conv_128_402(x):
        xx = jnp.pad(x.reshape(8, 400, 400, 128),
                     ((0, 0), (0, 2), (0, 0), (0, 0)))
        return _conv2d(xx, wext[:, :, :128, :]).astype(x.dtype)

    timed("128-lane conv (402 rows)", conv_128_402, x_pb)

    # ---- fuser internals, honest
    from coocc_tpu.ops.window_knn import make_offsets, window_knn
    Xg, Yg, Zg, Cf = 100, 100, 8, 128
    ia = jax.random.uniform(key, (Xg, Yg, Zg)) < 0.4
    offsets = make_offsets(4, 4, 7, cfg.fuser.dist_thresh)
    timed("window_knn x1 honest", lambda m: window_knn(m, offsets, 2), ia)

    imgv = jax.random.normal(key, (Xg, Yg, Zg, Cf), dtype)
    nn_i = jax.jit(lambda m: window_knn(m, offsets, 2))(ia)
    nn_i = nn_i.block_until_ready()

    def gather1(feats, idxs):
        flat = feats.reshape(-1, Cf)
        safe = jnp.maximum(idxs, 0)
        g = flat[safe.reshape(-1)].reshape(Xg, Yg, Zg, 2, Cf)
        return (g * (idxs >= 0)[..., None]).reshape(Xg, Yg, Zg, 2 * Cf)

    timed("gather x1 honest", gather1, imgv, nn_i)

    # activity masks
    def masks(a, b):
        return (jnp.abs(a).sum(-1) != 0), (jnp.abs(b).sum(-1) != 0)

    imgv2 = jax.random.normal(jax.random.fold_in(key, 9),
                              (1, Xg, Yg, Zg, Cf), dtype)
    ptsv2 = jax.random.normal(jax.random.fold_in(key, 10),
                              (1, Xg, Yg, Zg, Cf), dtype)
    timed("activity masks x2", masks, imgv2, ptsv2)

    print("[perf session 10 done]", flush=True)


if __name__ == "__main__":
    main()
