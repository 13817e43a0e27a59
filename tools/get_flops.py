#!/usr/bin/env python
"""Model complexity report: parameter counts + XLA FLOP/byte estimates.

Capability parity with the reference's tools/get_flops.py (mmcv
complexity tool) using jax's compiled cost analysis instead: parameters
come from the initialized pytree, FLOPs/bytes from
`jit(fwd).lower(...).compile().cost_analysis()`.

Usage: python tools/get_flops.py [config] [--cpu] [--train]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def human(n):
    for unit in ("", "K", "M", "G", "T", "P"):
        if abs(n) < 1000:
            return f"{n:.2f}{unit}"
        n /= 1000
    return f"{n:.2f}E"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default="coocc_multi_r50_256x704")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--train", action="store_true",
                   help="analyze the train-mode forward instead of eval")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch, tiny_config
    from coocc_tpu.models.coocc_ray import CoOccRay
    from coocc_tpu.utils.init_utils import jit_init

    cfg = tiny_config() if args.config == "tiny" else get_config(args.config)
    model = CoOccRay(cfg=cfg, dtype=jnp.bfloat16)
    batch = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(x),
        synthetic_batch(cfg, batch_size=1), is_leaf=lambda x: x is None)
    rngs = {"params": jax.random.PRNGKey(0)}
    kw = {}
    if args.train:
        rngs["dropout"] = jax.random.PRNGKey(1)
        kw = dict(train=True, fine_rng=jax.random.PRNGKey(2))
    variables = jit_init(model, rngs, batch, **kw)

    # per-module parameter counts
    print(f"== {cfg.name} parameters ==")
    total = 0
    for mod, tree in sorted(variables["params"].items()):
        n = sum(x.size for x in jax.tree.leaves(tree))
        total += n
        print(f"  {mod:28s} {human(n)} ({n:,})")
    print(f"  {'TOTAL':28s} {human(total)} ({total:,})")

    def fwd(v, b):
        return model.apply(v, b, train=bool(args.train),
                           **({"fine_rng": jax.random.PRNGKey(2)}
                              if args.train else {}))

    compiled = jax.jit(fwd).lower(variables, batch).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    print(f"\n== XLA cost analysis ({'train' if args.train else 'eval'}"
          " forward) ==")
    for k in ("flops", "bytes accessed", "transcendentals"):
        if k in ca:
            print(f"  {k:20s} {human(ca[k])}")


if __name__ == "__main__":
    main()
