#!/usr/bin/env python
"""Training-step wall clock for the flagship config (one chip).

Complements bench.py (inference fps) and tools/bench_render.py (rays/s)
with the training axis from BASELINE.md's cost table (reference: 24
epochs at batch 1/GPU on 8x A40, docs/train_and_eval.md:3-9). Prints one
JSON line {"metric": "train_step_ms", ...}.

Run MANUALLY after the main relay session: a flagship backward pass is
the largest graph we compile, and an OOM through the axon relay can
wedge it for other clients. Start with --config tiny to probe.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="coocc_multi_r50_256x704")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--scan-only", action="store_true",
                   help="skip the single-call measurement (saves one "
                        "flagship-size compile; scan marginal is the "
                        "headline number anyway)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch
    from coocc_tpu.models.coocc_ray import CoOccRay
    from coocc_tpu.parallel.train_step import make_train_step
    from coocc_tpu.train.state import create_train_state
    from coocc_tpu.utils.init_utils import jit_init

    if args.config == "tiny":
        from coocc_tpu.data.synthetic import tiny_config
        cfg = tiny_config()
    else:
        cfg = get_config(args.config)
    model = CoOccRay(cfg=cfg, dtype=jnp.bfloat16)
    # device-resident batch: with numpy leaves every step() re-uploads the
    # ~15 MB batch through the relay, inflating the "step" by hundreds of
    # ms (observed 1040 ms vs 470 ms fwd+bwd); the real loop prefetches
    batch = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(x),
        synthetic_batch(cfg, batch_size=1), is_leaf=lambda x: x is None)
    rng = jax.random.PRNGKey(0)
    variables = jit_init(model, {"params": rng, "dropout": rng}, batch,
                         train=True, fine_rng=rng)
    state = create_train_state(model, variables, cfg.optim,
                               steps_per_epoch=1000)
    step = make_train_step(model, cfg)

    def readback(metrics):
        return float(metrics["loss_total"])

    @jax.jit
    def trivial(x):
        return (x * 2.0).sum()

    float(trivial(jnp.ones((8, 128))))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(jnp.ones((8, 128))))
        ts.append(time.perf_counter() - t0)
    t_rt = float(np.median(ts))

    ms = compile_s = None
    loss = None
    if not args.scan_only:
        t0 = time.perf_counter()
        state, metrics = step(state, batch, rng)
        loss = readback(metrics)
        compile_s = time.perf_counter() - t0

        tt = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            state, metrics = step(state, batch, rng)
            loss = readback(metrics)
            tt.append(time.perf_counter() - t0)
        ms = (float(np.median(tt)) - t_rt) * 1e3

    # Per-call dispatch through the axon relay scales with the argument
    # tree (hundreds of state buffers), so the single-call number above
    # overstates device time by an amount the 1-arg round-trip probe
    # cannot cancel (round 4: 1040 ms single-call vs 405 ms fwd+bwd by
    # prefix profiling). The scanned marginal below chains K steps inside
    # ONE jit (state carried on device, per-step rng fold — exactly a
    # prefetch-fed training loop) and differences K=9 against K=1, so
    # both dispatch and readback cancel. This is the honest device
    # ms/step; real multi-host training dispatches locally, not through
    # a debugging relay.
    def scan_steps(state, batch, rng, K):
        def body(st, i):
            st2, m = step(st, batch, jax.random.fold_in(rng, i))
            return st2, m["loss_total"]
        st, losses = jax.lax.scan(body, state, jnp.arange(K))
        return losses[-1]

    times = {}
    for K in (1, 9):
        jfn = jax.jit(partial(scan_steps, K=K))
        t0 = time.perf_counter()
        loss = float(jfn(state, batch, rng))
        times[f"compile_{K}"] = time.perf_counter() - t0
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            loss = float(jfn(state, batch, rng))
            ts.append(time.perf_counter() - t0)
        times[K] = float(np.median(ts))
    scan_ms = (times[9] - times[1]) / 8 * 1e3

    out = {
        "metric": "train_step_ms", "value": round(scan_ms, 2), "unit": "ms",
        "config": args.config,
        "compile_scan_s": round(times["compile_1"], 1),
        "loss": loss,
    }
    if ms is not None:
        out["single_call_ms"] = round(ms, 2)
        out["compile_s"] = round(compile_s, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
