#!/usr/bin/env python
"""Prefix-truncation fwd+bwd latency profile of the flagship TRAIN step.

The round-3 number nobody attributed: 1036.6 ms/step (tools/bench_train.py)
vs ~105 ms eval forward. This tool times value_and_grad of the REAL model
truncated after each stage (stop_at hook in CoOccRay.__call__), so the
marginal difference between consecutive prefixes attributes forward AND
backward cost — including the backward of the splat sort, window-KNN
gathers, cascade argsort and renderer chain — to a stage. The final row
runs the full loss_fn of parallel/train_step.py (losses + depth BCE +
renderer), matching what bench_train times minus the AdamW update.

Mirrors the reference's latency logging at stage granularity
(coocc_ray.py:76-77,497-508) but for training.

Usage: python tools/profile_train.py [config] [--stages img,pts,...]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default="coocc_multi_r50_256x704")
    p.add_argument("--stages", default="img,pts,fuse,sem,coarse,full,loss")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch
    from coocc_tpu.models.coocc_ray import CoOccRay
    from coocc_tpu.models.losses import compute_losses
    from coocc_tpu.utils.init_utils import jit_init
    from tools._prof import make_timer

    if args.config == "tiny":
        from coocc_tpu.data.synthetic import tiny_config
        cfg = tiny_config()
    else:
        cfg = get_config(args.config)
    model = CoOccRay(cfg=cfg, dtype=jnp.bfloat16)
    batch = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(x),
        synthetic_batch(cfg, batch_size=1),
        is_leaf=lambda x: x is None)
    rng = jax.random.PRNGKey(0)
    variables = jit_init(model, {"params": rng, "dropout": rng}, batch,
                         train=True, fine_rng=rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")

    timed = make_timer()
    prev, prev_name = 0.0, "start"
    report = []
    for stage in args.stages.split(","):
        stop = None if stage in ("full", "loss") else stage

        def loss_fn(params, batch, stop=stop, with_loss=(stage == "loss")):
            variables = {"params": params}
            if batch_stats is not None:
                variables["batch_stats"] = batch_stats
            outs, _ = model.apply(
                variables, batch, train=True, fine_rng=rng,
                rngs={"dropout": rng}, stop_at=stop,
                mutable=["batch_stats"] if batch_stats is not None else [])
            if with_loss:
                losses = compute_losses(outs, batch, cfg)
                return sum(v for k, v in losses.items()
                           if k.startswith("loss"))
            # surrogate scalar over every output leaf so no sub-path is
            # dead-code-eliminated (same rule as tools/_prof.make_timer)
            return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                       for l in jax.tree.leaves(outs)
                       if hasattr(l, "dtype")
                       and jnp.issubdtype(l.dtype, jnp.floating)) * 1e-9

        def vag(params, batch, loss_fn=loss_fn):
            return jax.value_and_grad(loss_fn)(params, batch)

        t = timed(f"train:{stage}", vag, params, batch)
        report.append((f"{prev_name}->{stage}", t - prev))
        if stage != "loss":  # 'loss' replaces 'full', both are full-model
            prev, prev_name = t, stage

    print("\n=== marginal fwd+bwd stage costs (ms) ===")
    for name, dt in sorted(report, key=lambda kv: -kv[1]):
        print(f"  {name:16s} {dt*1e3:8.1f}")


if __name__ == "__main__":
    main()
