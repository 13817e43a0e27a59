#!/usr/bin/env python
"""Serialized TPU perf session 5: find the full-graph gap.

Stage-sum (profile_stages) gives ~109 ms but the bench full forward costs
~134 ms. Time the full model under output truncations to attribute the
difference: full cascade+img-sampling head vs coarse-only reduction vs a
config twin with cascade off.
"""
from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch
    from coocc_tpu.models.coocc_ray import CoOccRay
    from coocc_tpu.utils.init_utils import jit_init
    from tools._prof import make_timer

    timed = make_timer(reps=3, iters=4)
    cfg = get_config("coocc_multi_r50_256x704")
    dtype = jnp.bfloat16
    model = CoOccRay(cfg=cfg, dtype=dtype)
    batch = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(x),
        synthetic_batch(cfg, batch_size=1),
        is_leaf=lambda x: x is None)
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                         train=False)

    def red(outs):
        return sum(jnp.sum(jnp.abs(v.astype(jnp.float32)))
                   for v in jax.tree.leaves(outs))

    def fwd_full(v, b):
        return red(model.apply(v, b, train=False))

    timed("full fwd (bench-equal)", fwd_full, variables, batch)

    def fwd_coarse_reduce(v, b):
        outs = model.apply(v, b, train=False)
        keep = {k: outs[k] for k in ("occ",) if k in outs}
        return red(keep)

    timed("fwd reduce occ only (fine DCE'd)", fwd_coarse_reduce,
          variables, batch)

    def fwd_no_aux_reduce(v, b):
        outs = model.apply(v, b, train=False)
        drop = ("depth_prob", "voxel_feats", "geom")
        keep = {k: x for k, x in outs.items()
                if k not in drop and x is not None}
        return red(keep)

    timed("fwd reduce head outs only", fwd_no_aux_reduce, variables, batch)

    coarse_model = CoOccRay(cfg=dataclasses.replace(
        cfg, occ_head=dataclasses.replace(cfg.occ_head, cascade_ratio=1)),
        dtype=dtype)

    def fwd_coarse_model(v, b):
        return red(coarse_model.apply(v, b, train=False))

    timed("full fwd cascade OFF twin", fwd_coarse_model, variables, batch)

    # ---- fuser: full module vs de-vmapped twin (suspected vmap lowering)
    from coocc_tpu.nn.bifuser import BiFuserN
    from coocc_tpu.ops.window_knn import make_offsets, window_knn

    key = jax.random.PRNGKey(1)
    Xg, Yg, Zg, C = 100, 100, 8, 128
    imgv = jax.random.normal(key, (1, Xg, Yg, Zg, C), dtype)
    imgv = imgv * (jax.random.uniform(key, (1, Xg, Yg, Zg, 1)) < 0.5)
    ptsv = jax.random.normal(jax.random.fold_in(key, 2),
                             (1, Xg, Yg, Zg, C), dtype)
    ptsv = ptsv * (jax.random.uniform(jax.random.fold_in(key, 3),
                                      (1, Xg, Yg, Zg, 1)) < 0.5)
    fus = BiFuserN(in_channels=cfg.fuser.in_channels,
                   out_channels=cfg.fuser.out_channels, knum=cfg.fuser.knum,
                   dist_thresh=cfg.fuser.dist_thresh, dtype=dtype)
    fv = {c: t["occ_fuser"] for c, t in variables.items()
          if "occ_fuser" in t}
    timed("fuser full (vmapped)", lambda v, a, b: fus.apply(
        v, a, b, train=False), fv, imgv, ptsv)

    offsets = make_offsets(4, 4, 7, cfg.fuser.dist_thresh)

    def fuser_parts(a, b):
        ia = jnp.abs(a[0]).sum(-1) != 0
        pa = jnp.abs(b[0]).sum(-1) != 0
        nn_i = window_knn(ia, offsets, 2)
        nn_p = window_knn(pa, offsets, 2)

        def g(feats, idxs):
            flat = feats.reshape(-1, C)
            safe = jnp.maximum(idxs, 0)
            gg = flat[safe.reshape(-1)].reshape(Xg, Yg, Zg, 2, C)
            return (gg * (idxs >= 0)[..., None]).reshape(Xg, Yg, Zg, 2 * C)

        return g(a[0], nn_i).sum() + g(b[0], nn_p).sum()

    timed("fuser knn+gathers unvmapped", fuser_parts, imgv, ptsv)
    print("[perf session 5 done]", flush=True)


if __name__ == "__main__":
    main()
