#!/usr/bin/env python
"""Hoist-proof fuser + encoder internal breakdown (cumulative truncations)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch
    from coocc_tpu.models.coocc_ray import CoOccRay
    from coocc_tpu.nn.bifuser import BiFuserN
    from coocc_tpu.nn.sparse_enc_packed import PackedLiDAREnc8x
    from coocc_tpu.ops.voxelize import voxelize_mask
    from coocc_tpu.ops.window_knn import make_offsets, window_knn
    from coocc_tpu.utils.init_utils import jit_init
    from tools._prof import make_timer

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    cfg = get_config("coocc_multi_r50_256x704")
    dtype = jnp.bfloat16
    model = CoOccRay(cfg=cfg, dtype=dtype)
    batch = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(x),
        synthetic_batch(cfg, batch_size=1),
        is_leaf=lambda x: x is None)
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                         train=False)
    timed = make_timer()
    key = jax.random.PRNGKey(1)
    X, Y, Z, C = 100, 100, 8, 128

    if which in ("all", "fuser"):
        imgv = jax.random.normal(key, (1, X, Y, Z, C), dtype)
        imgv = imgv * (jax.random.uniform(key, (1, X, Y, Z, 1)) < 0.5)
        ptsv = jax.random.normal(jax.random.fold_in(key, 1),
                                 (1, X, Y, Z, C), dtype)
        ptsv = ptsv * (jax.random.uniform(jax.random.fold_in(key, 2),
                                          (1, X, Y, Z, 1)) < 0.5)
        fcfg = cfg.fuser
        offsets = make_offsets(4, 4, 7, fcfg.dist_thresh)

        def s_masks(iv, pv):
            return (jnp.abs(iv[0]).sum(-1) != 0,
                    jnp.abs(pv[0]).sum(-1) != 0)

        timed("activity masks", s_masks, imgv, ptsv)

        def s_knn(iv, pv):
            ia, pa = s_masks(iv, pv)
            return window_knn(ia, offsets, 2), window_knn(pa, offsets, 2)

        timed("masks+knn x2", s_knn, imgv, ptsv)

        def s_gather(iv, pv):
            nn_i, nn_p = s_knn(iv, pv)

            def g(feats, idxs):
                flat = feats.reshape(-1, C)
                safe = jnp.maximum(idxs, 0)
                gg = flat[safe.reshape(-1)].reshape(X, Y, Z, 2, C)
                return (gg * (idxs >= 0)[..., None]).reshape(X, Y, Z, 2 * C)

            return g(iv[0], nn_i), g(pv[0], nn_p)

        timed("+gathers", s_gather, imgv, ptsv)

        fuser = BiFuserN(in_channels=fcfg.in_channels,
                         out_channels=fcfg.out_channels, knum=fcfg.knum,
                         dist_thresh=fcfg.dist_thresh, dtype=dtype)
        fv = {c: t["occ_fuser"] for c, t in variables.items()
              if "occ_fuser" in t}
        timed("full fuser", jax.jit(
            lambda v, a, b: fuser.apply(v, a, b, train=False)),
            fv, imgv, ptsv)

    if which in ("all", "enc"):
        pts_cfg = cfg.pts
        enc_vars = {c: t["pts_middle_encoder"] for c, t in variables.items()
                    if "pts_middle_encoder" in t}

        def mk(stop):
            enc = PackedLiDAREnc8x(
                input_channel=pts_cfg.input_channel,
                base_channel=pts_cfg.base_channel,
                out_channel=pts_cfg.out_channel,
                sparse_shape_xyz=pts_cfg.sparse_shape_xyz,
                capacity=pts_cfg.max_voxels_test,
                compute_dtype=dtype, stop_after=stop)

            def run(ev, points, mask):
                m0 = jax.vmap(lambda p, m: voxelize_mask(
                    p, m, cfg.point_cloud_range, pts_cfg.voxel_size,
                    pts_cfg.sparse_shape_xyz,
                    max_voxels=pts_cfg.max_voxels_test))(points, mask)
                return enc.apply(ev, m0, train=False)
            return run

        prev = 0.0
        for stop in ["stem", "res1", "res2", "res3", None]:
            t = timed(f"vox+enc thru {stop or 'full'}", mk(stop),
                      enc_vars, batch.points, batch.points_mask)
            print(f"   (+{(t - prev) * 1e3:.1f})", flush=True)
            prev = t


if __name__ == "__main__":
    main()
