#!/usr/bin/env python
"""Shape-validate a named config's eval forward at REAL shapes, no compile.

`jax.eval_shape` runs the full flax trace (so every conv/stride/pad/gather
shape is checked at the config's true resolutions) without allocating
buffers or touching a backend — the cheap first gate before burning relay
time compiling a 896x1600 R101 graph on the real chip (VERDICT round-4
task #1). Prints param count and every output leaf's shape/dtype.

Runs on forced CPU: the axon plugin pins the platform to TPU unless
jax_platforms is updated after import (see tests/conftest.py).
"""
from __future__ import annotations

import argparse
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--train", action="store_true",
                   help="also trace the train-mode forward (losses path)")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch
    from coocc_tpu.models.coocc_ray import CoOccRay

    cfg = get_config(args.config)
    model = CoOccRay(cfg=cfg, dtype=jnp.bfloat16)
    batch = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(x),
        synthetic_batch(cfg, batch_size=1), is_leaf=lambda x: x is None)

    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    var_shapes = jax.eval_shape(
        lambda r, b: model.init(r, b, train=False), {"params": rng}, batch)
    n_params = sum(int(np.prod(s.shape))
                   for s in jax.tree.leaves(var_shapes["params"]))
    print(f"[{args.config}] init trace ok in "
          f"{time.perf_counter()-t0:.1f}s — params {n_params/1e6:.2f} M",
          flush=True)

    t0 = time.perf_counter()
    out_shapes = jax.eval_shape(
        lambda v, b: model.apply(v, b, train=False), var_shapes, batch)
    print(f"[{args.config}] eval-forward trace ok in "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    for path, leaf in jax.tree_util.tree_flatten_with_path(out_shapes)[0]:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        print(f"  out {name}: {leaf.shape} {leaf.dtype}")

    if args.train:
        t0 = time.perf_counter()
        tr_shapes = jax.eval_shape(
            lambda v, b: model.apply(
                v, b, train=True, fine_rng=rng,
                rngs={"dropout": rng}),
            var_shapes, batch)
        print(f"[{args.config}] train-forward trace ok in "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        del tr_shapes
    print(f"[{args.config}] DRYRUN OK")


if __name__ == "__main__":
    main()
