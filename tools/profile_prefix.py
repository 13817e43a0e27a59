#!/usr/bin/env python
"""Prefix-truncation latency profile of the flagship eval forward.

Times the REAL jitted model forward truncated after each stage (stop_at
hook in CoOccRay.__call__); the marginal difference between consecutive
prefixes attributes every cost — including inter-stage layout changes,
fusion boundaries, and output materialization — to a stage. The isolated
per-stage profiler (tools/profile_stages.py) times hand-rebuilt sub-graphs
and missed ~18 ms/frame of boundary cost (round-2 verdict weak #4); the
prefix sums here are the end-to-end number by construction.

Usage: python tools/profile_prefix.py [config]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default="coocc_multi_r50_256x704")
    p.add_argument("--stages", default="img,pts,fuse,sem,full")
    p.add_argument("--batch", type=int, default=1,
                   help="batch size (e.g. 2 to attribute the B=2 "
                        "per-frame regression stage by stage)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch
    from coocc_tpu.models.coocc_ray import CoOccRay
    from coocc_tpu.utils.init_utils import jit_init
    from tools._prof import make_timer

    cfg = get_config(args.config)
    dtype = jnp.bfloat16
    model = CoOccRay(cfg=cfg, dtype=dtype)
    batch = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(x),
        synthetic_batch(cfg, batch_size=args.batch),
        is_leaf=lambda x: x is None)
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                         train=False)

    timed = make_timer()
    prev, prev_name = 0.0, "start"
    report = []
    for stage in args.stages.split(","):
        stop = None if stage == "full" else stage

        def fwd(variables, batch, stop=stop):
            return model.apply(variables, batch, train=False, stop_at=stop)

        t = timed(f"prefix:{stage}", fwd, variables, batch)
        report.append((f"{prev_name}->{stage}", t - prev))
        prev, prev_name = t, stage

    B = args.batch
    print(f"\n=== marginal stage costs (real forward, ms, B={B}) ===")
    for name, dt in sorted(report, key=lambda kv: -kv[1]):
        print(f"  {name:14s} {dt*1e3:8.1f}")
    print(f"  {'TOTAL':14s} {prev*1e3:8.1f}  -> {B/prev:.2f} fps equiv"
          + (f" ({prev/B*1e3:.1f} ms/frame)" if B > 1 else ""))


if __name__ == "__main__":
    main()
