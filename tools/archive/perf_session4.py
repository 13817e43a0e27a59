#!/usr/bin/env python
"""Serialized TPU perf session 4 (post resize/splat fixes).

Probes, each standalone jits with scan-amortized timing:
  A. voxelize_mask: random scatter vs sort+sorted-scatter vs cap on/off
  B. packed encoder res1: full block vs conv-only (glue split), and a
     concat-free carry-add SubM variant
  C. fuser: knn / gathers / con_enc split + one-conv 3-tap z fold probe
  D. stem: strided conv vs space-to-depth unstrided equivalent
Run: python tools/perf_session4.py [A|B|C|D|all]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch
    from coocc_tpu.ops.voxelize import linearize
    from tools._prof import make_timer

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    timed = make_timer()
    cfg = get_config("coocc_multi_r50_256x704")
    batch = synthetic_batch(cfg, batch_size=1)
    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16

    # ---------------- A. voxelize_mask internals ----------------
    if which in ("all", "A"):
        pts = jnp.asarray(batch.points)[0]
        pm = jnp.asarray(batch.points_mask)[0]
        gs = cfg.pts.sparse_shape_xyz
        nx, ny, nz = [int(g) for g in gs]
        num_cells = nx * ny * nz
        cap = cfg.pts.max_voxels_test
        pcr = jnp.asarray(cfg.point_cloud_range, pts.dtype)
        vs = jnp.asarray(cfg.pts.voxel_size, pts.dtype)

        def ids_of(p, m):
            coords = jnp.floor((p[:, :3] - pcr[:3]) / vs).astype(jnp.int32)
            ok = jnp.all((coords >= 0) &
                         (coords < jnp.array([nx, ny, nz], jnp.int32)), -1)
            return jnp.where(ok & m, linearize(coords, gs), num_cells)

        timed("A ids only", jax.jit(ids_of), pts, pm)

        def scat_random(p, m):
            ids = ids_of(p, m)
            return jnp.zeros((num_cells,), bool).at[ids].set(
                True, mode="drop")

        timed("A scatter random", jax.jit(scat_random), pts, pm)

        def scat_sorted(p, m):
            ids = jax.lax.sort(ids_of(p, m))
            return jnp.zeros((num_cells,), bool).at[ids].set(
                True, mode="drop", indices_are_sorted=True)

        timed("A sort+scatter sorted", jax.jit(scat_sorted), pts, pm)

        def via_segmax(p, m):
            ids = ids_of(p, m)
            return jax.ops.segment_max(
                jnp.ones((ids.shape[0],), jnp.int32), ids,
                num_segments=num_cells + 1)[:-1] > 0

        timed("A segment_max", jax.jit(via_segmax), pts, pm)

        def cap_rank(occ_flat):
            L = 1024
            rows = occ_flat.reshape(num_cells // L, L).astype(jnp.bfloat16)
            tri = jnp.triu(jnp.ones((L, L), jnp.bfloat16))
            pref = jax.lax.dot_general(
                rows, tri, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            roff = jnp.cumsum(pref[:, -1]) - pref[:, -1]
            rank = pref + roff[:, None]
            return occ_flat & (rank <= cap).reshape(-1)

        occ = jax.jit(scat_random)(pts, pm)
        occ.block_until_ready()
        timed("A cap rank matmul", jax.jit(cap_rank), occ)

    # ---------------- B. res1 conv vs glue ----------------
    if which in ("all", "B"):
        from coocc_tpu.nn.sparse_enc_packed import (
            _PackedBasicBlock, _conv2d_pb, _shift_ext, _subm_ext_weight)
        from coocc_tpu.nn.sparse_enc import _kaiming

        C, Z, Xg, Yg, p = 32, 32, 400, 400, 4
        bz = Z // p
        x_pb = jax.random.normal(key, (1, bz, Xg, Yg, p * C), dtype)
        mf = (jax.random.uniform(jax.random.fold_in(key, 1),
                                 (1, bz, Xg, Yg, p)) < 0.6)
        mf = jnp.repeat(mf, C, axis=-1).astype(dtype)
        w27 = jax.random.normal(jax.random.fold_in(key, 2), (27, C, C),
                                jnp.float32) * 0.05

        blk = _PackedBasicBlock(C, name="b")
        bv = blk.init(key, x_pb, mf, False)
        timed("B full block (2conv+2bn)", jax.jit(
            lambda v, x, m: blk.apply(v, x, m, False)), bv, x_pb, mf)

        wext = _subm_ext_weight(w27, p)

        def conv_only(x, m):
            y = _conv2d_pb(_shift_ext(x, C), wext).astype(x.dtype) * m
            y = _conv2d_pb(_shift_ext(y, C), wext).astype(x.dtype) * m
            return y

        timed("B 2x ext conv only", jax.jit(conv_only), x_pb, mf)

        # concat-free: 128-lane tridiagonal conv + 64-lane carry conv add
        w_tri = _subm_ext_weight(w27, p)[:, :, :p * C, :]  # [3,3,pC,pC]
        w3 = w27.reshape(3, 3, 3, C, C)
        w_car = jnp.concatenate(
            [jnp.concatenate([w3[:, :, 2], jnp.zeros_like(w3[:, :, 2])], 3),
             jnp.concatenate([jnp.zeros_like(w3[:, :, 0]), w3[:, :, 0]], 3)],
            axis=2)  # [3,3,2C,2C]: (up_in,dn_in) -> (up_out,dn_out)

        def conv_carryadd(x, m):
            def one(xx):
                B, bzz, X, Y, L = xx.shape
                main = _conv2d_pb(xx, w_tri)
                up = jnp.concatenate([xx[:, 1:, ..., :C],
                                      jnp.zeros_like(xx[:, :1, ..., :C])], 1)
                dn = jnp.concatenate([jnp.zeros_like(xx[:, :1, ..., -C:]),
                                      xx[:, :-1, ..., -C:]], 1)
                car = _conv2d_pb(jnp.concatenate([up, dn], -1), w_car)
                main = main.at[..., -C:].add(car[..., :C])
                main = main.at[..., :C].add(car[..., -C:])
                return main.astype(xx.dtype)
            y = one(x) * m
            return one(y) * m

        timed("B 2x carry-add conv", jax.jit(conv_carryadd), x_pb, mf)
        a = jax.jit(conv_only)(x_pb, mf)
        b2 = jax.jit(conv_carryadd)(x_pb, mf)
        print("   carry-add agree:",
              float(jnp.abs(a.astype(jnp.float32)
                            - b2.astype(jnp.float32)).max()), flush=True)

    # ---------------- C. fuser internals ----------------
    if which in ("all", "C"):
        from coocc_tpu.ops.window_knn import make_offsets, window_knn

        Xg, Yg, Zg, C = 100, 100, 8, 128
        imgv = jax.random.normal(key, (1, Xg, Yg, Zg, C), dtype)
        imgv = imgv * (jax.random.uniform(key, (1, Xg, Yg, Zg, 1)) < 0.5)
        ptsv = jax.random.normal(jax.random.fold_in(key, 2),
                                 (1, Xg, Yg, Zg, C), dtype)
        ptsv = ptsv * (jax.random.uniform(jax.random.fold_in(key, 3),
                                          (1, Xg, Yg, Zg, 1)) < 0.5)
        offsets = make_offsets(4, 4, 7, cfg.fuser.dist_thresh)
        k = 2

        ia = jnp.abs(imgv[0]).sum(-1) != 0
        nn_i = jax.jit(lambda a: window_knn(a, offsets, k))(ia)
        nn_i.block_until_ready()

        timed("C knn x1", jax.jit(lambda a: window_knn(a, offsets, k)), ia)

        def gather1(feats, idxs):
            flat = feats.reshape(-1, C)
            safe = jnp.maximum(idxs, 0)
            g = flat[safe.reshape(-1)].reshape(Xg, Yg, Zg, k, C)
            return (g * (idxs >= 0)[..., None]).reshape(Xg, Yg, Zg, k * C)

        timed("C gather x1", jax.jit(gather1), imgv[0], nn_i)

        # conv3d 512->256 z-batch (as Conv3d lowers) vs single fat-tap conv
        xcat = jax.random.normal(key, (1, Xg, Yg, Zg, 4 * C), dtype)
        wc = jax.random.normal(jax.random.fold_in(key, 5),
                               (3, 3, 3, 4 * C, 2 * C), dtype) * 0.02

        def zb3(x):
            xt = jnp.pad(jnp.moveaxis(x, 3, 1),
                         ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
            xt = xt.reshape(Zg + 2, Xg, Yg, 4 * C)
            out = None
            for dz in range(3):
                y = jax.lax.conv_general_dilated(
                    xt, wc[:, :, dz], (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
                y = y[dz:dz + Zg]
                out = y if out is None else out + y
            return jnp.moveaxis(out.astype(x.dtype)[None], 1, 3)

        timed("C conv3d zb 3-pass", jax.jit(zb3), xcat)

        def zb1(x):
            xt = jnp.pad(jnp.moveaxis(x, 3, 1),
                         ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
            xt = xt.reshape(Zg + 2, Xg, Yg, 4 * C)
            wf = jnp.concatenate([wc[:, :, dz] for dz in range(3)], -1)
            y = jax.lax.conv_general_dilated(
                xt, wf, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            out = (y[0:Zg, ..., :2 * C] + y[1:Zg + 1, ..., 2 * C:4 * C]
                   + y[2:Zg + 2, ..., 4 * C:])
            return jnp.moveaxis(out.astype(x.dtype)[None], 1, 3)

        timed("C conv3d zb 1-pass fat", jax.jit(zb1), xcat)
        a = jax.jit(zb3)(xcat)
        b2 = jax.jit(zb1)(xcat)
        print("   zb1 agree:",
              float(jnp.abs(a.astype(jnp.float32)
                            - b2.astype(jnp.float32)).max()), flush=True)

    # ---------------- D. stem strided vs space-to-depth ----------------
    if which in ("all", "D"):
        from coocc_tpu.nn.sparse_enc_packed import (_conv2d, _dilate_weight,
                                                    _strided_weight)

        X0 = Y0 = 800
        Z0 = 64
        mask0f = (jax.random.uniform(key, (1, X0, Y0, Z0)) < 0.05).astype(
            dtype)
        w_eff = jax.random.normal(jax.random.fold_in(key, 7),
                                  (27, 1, 32), jnp.float32) * 0.1
        ws = _strided_weight(w_eff, Z0)  # [3,3,64,32*32=1024]

        timed("D stem strided conv", jax.jit(
            lambda m: _conv2d(m, ws, 2)), mask0f)

        # space-to-depth: [1,800,800,64] -> [1,400,400,256], 2x2 conv
        w4 = jnp.asarray(np.zeros((2, 2, 4 * Z0, 1024), np.float32))
        wsn = np.asarray(ws, np.float32)  # [3,3,64,1024]
        w4n = np.zeros((2, 2, 4 * Z0, 1024), np.float32)
        # out(i,j) = sum_{dx,dy in 0..2} w[dx,dy] x[2i+dx-1, 2j+dy-1]
        # phase coords: 2i+dx-1 = 2(i+r)-1+.. map: dx->(row offset R, phase px)
        for dx in range(3):
            for dy in range(3):
                R, px = divmod(dx + 1, 2)   # x index 2i+dx-1 = 2*(i-1+R)+px
                Sy, py = divmod(dy + 1, 2)
                # conv tap (R, Sy) on the phase-packed grid shifted by -1
                w4n[R, Sy, (px * 2 + py) * Z0:(px * 2 + py + 1) * Z0] \
                    += wsn[dx, dy]
        w4 = jnp.asarray(w4n)

        def s2d(m):
            x = m.reshape(1, 400, 2, 400, 2, Z0)
            x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
                1, 400, 400, 4 * Z0)
            return jax.lax.conv_general_dilated(
                x, w4.astype(m.dtype), (1, 1), [(1, 0), (1, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)

        timed("D stem s2d conv", jax.jit(s2d), mask0f)
        a = jax.jit(lambda m: _conv2d(m, ws, 2))(mask0f)
        b2 = jax.jit(s2d)(mask0f)
        print("   s2d shapes:", a.shape, b2.shape, flush=True)
        if a.shape == b2.shape:
            print("   s2d agree:",
                  float(jnp.abs(a - b2).max()), flush=True)
        timed("D mask dilate conv", jax.jit(
            lambda m: _conv2d(m, _dilate_weight(Z0, dtype), 2)), mask0f)

    print("[perf session 4 done]", flush=True)


if __name__ == "__main__":
    main()
