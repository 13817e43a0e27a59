#!/usr/bin/env python
"""On-chip A/B: XLA window-KNN vs the Pallas best-2 kernel (round 3).

Correctness first (indices must match exactly at both window sizes), then
timing of the bare KNN and of the full fuser apply, at the default
(6,6,7) window and the legacy (4,4,7), on flagship activity statistics.
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
    from coocc_tpu.nn.bifuser import BiFuserN
    from coocc_tpu.ops.window_knn import make_offsets, window_knn
    from tools._prof import make_timer

    print("devices:", jax.devices())
    cfg = get_config("coocc_multi_r50_256x704")
    dtype = jnp.bfloat16
    X, Y, Z, C = 100, 100, 8, 128
    key = jax.random.PRNGKey(0)
    imgv = jax.random.normal(key, (1, X, Y, Z, C), dtype)
    imgv = imgv * (jax.random.uniform(key, (1, X, Y, Z, 1)) < 0.6)
    ptsv = jax.random.normal(jax.random.fold_in(key, 1),
                             (1, X, Y, Z, C), dtype)
    ptsv = ptsv * (jax.random.uniform(jax.random.fold_in(key, 2),
                                      (1, X, Y, Z, 1)) < 0.05)
    mask = np.asarray(jnp.abs(ptsv[0]).sum(-1) != 0)
    maski = np.asarray(jnp.abs(imgv[0]).sum(-1) != 0)
    timed = make_timer()

    for (rx, ry, rz) in [(6, 6, 7), (4, 4, 7)]:
        offsets = make_offsets(rx, ry, rz, cfg.fuser.dist_thresh)
        print(f"\n== window ({rx},{ry},{rz}): O={offsets.shape[0]} ==")
        for m, nm in [(mask, "pts"), (maski, "img")]:
            os.environ["COOCC_PALLAS_KNN"] = ""
            ref = np.asarray(jax.jit(
                lambda a: window_knn(a, offsets, 2))(jnp.asarray(m)))
            os.environ["COOCC_PALLAS_KNN"] = "1"
            got = np.asarray(jax.jit(
                lambda a: window_knn(a, offsets, 2))(jnp.asarray(m)))
            ok = (ref == got).all()
            print(f"   correctness[{nm}]: {'OK' if ok else 'MISMATCH'}")
            if not ok:
                bad = (ref != got).any(-1)
                print("   ndiff:", bad.sum(), "of", bad.size)

        for tag in ["", "1"]:
            os.environ["COOCC_PALLAS_KNN"] = tag
            name = "pallas" if tag else "xla"
            timed(f"knn[{name}] ({rx},{ry},{rz})",
                  jax.jit(lambda a, b: (window_knn(a, offsets, 2),
                                        window_knn(b, offsets, 2))),
                  jnp.asarray(mask), jnp.asarray(maski))

        fuser = BiFuserN(in_channels=cfg.fuser.in_channels,
                         out_channels=cfg.fuser.out_channels,
                         knum=cfg.fuser.knum,
                         dist_thresh=cfg.fuser.dist_thresh,
                         window_rx=rx, window_ry=ry, window_rz=rz,
                         dtype=dtype)
        os.environ["COOCC_PALLAS_KNN"] = ""
        fv = fuser.init(jax.random.PRNGKey(3), imgv, ptsv, train=False)
        for tag in ["", "1"]:
            os.environ["COOCC_PALLAS_KNN"] = tag
            name = "pallas" if tag else "xla"
            timed(f"fuser[{name}] ({rx},{ry},{rz})",
                  jax.jit(lambda v, a, b: fuser.apply(v, a, b, train=False)),
                  fv, imgv, ptsv)
    os.environ["COOCC_PALLAS_KNN"] = ""


if __name__ == "__main__":
    main()
