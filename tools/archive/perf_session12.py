#!/usr/bin/env python
"""Serialized TPU perf session 12: Pallas window-KNN vs XLA plane reduce.

A/Bs ops/window_knn.py's two providers at the flagship fuser shapes (one
modality and the full BiFuserN), using the scalar-readback timing method.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from coocc_tpu.nn.bifuser import BiFuserN
    from coocc_tpu.ops.window_knn import make_offsets, window_knn
    from tools._prof import make_timer

    timed = make_timer()
    rng = np.random.RandomState(0)
    X, Y, Z, C = 100, 100, 8, 128
    mask = jnp.asarray(rng.rand(X, Y, Z) < 0.25)
    offs = make_offsets(4, 4, 7, dist_thresh=13.3)
    print(f"[offsets {offs.shape[0]}]", flush=True)

    @jax.jit
    def knn(m):
        return window_knn(m, offs, k=2)

    os.environ.pop("COOCC_PALLAS_KNN", None)
    timed("window_knn XLA planes", knn, mask)
    a = jax.jit(knn)(mask)

    os.environ["COOCC_PALLAS_KNN"] = "1"

    @jax.jit
    def knn_p(m):
        return window_knn(m, offs, k=2)

    timed("window_knn pallas vmem", knn_p, mask)
    b = knn_p(mask)
    print("   agree:", bool((np.asarray(a) == np.asarray(b)).all()),
          flush=True)

    # full fuser A/B
    img = jnp.asarray(rng.randn(1, X, Y, Z, C), jnp.bfloat16)
    img = img * (jnp.asarray(rng.rand(1, X, Y, Z, 1)) < 0.5)
    pts = jnp.asarray(rng.randn(1, X, Y, Z, C), jnp.bfloat16)
    pts = pts * (jnp.asarray(rng.rand(1, X, Y, Z, 1)) < 0.25)
    fuser = BiFuserN(dtype=jnp.bfloat16)
    vs = jax.jit(fuser.init, static_argnames="train")(
        jax.random.PRNGKey(0), img, pts, train=False)

    for flag in ("", "1"):
        if flag:
            os.environ["COOCC_PALLAS_KNN"] = flag
        else:
            os.environ.pop("COOCC_PALLAS_KNN", None)

        @jax.jit
        def run(v, a_, b_):
            return fuser.apply(v, a_, b_, train=False)

        timed(f"fuser PALLAS_KNN='{flag}'", run, vs, img, pts)

    print("[perf session 12 done]", flush=True)


if __name__ == "__main__":
    main()
