"""Benchmark: coocc_multi_r50_256x704 inference frames/sec on one TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Baseline target: >= 10 frames/sec/chip on TPU v5e (BASELINE.md).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 10.0


def main():
    import jax
    import jax.numpy as jnp

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch
    from coocc_tpu.models.coocc_ray import CoOccRay

    cfg = get_config("coocc_multi_r50_256x704")
    model = CoOccRay(cfg=cfg)
    batch = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(x),
        synthetic_batch(cfg, batch_size=1),
        is_leaf=lambda x: x is None,
    )
    from coocc_tpu.utils.init_utils import jit_init
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                         train=False)

    @jax.jit
    def forward(variables, batch):
        return model.apply(variables, batch, train=False)["occ"]

    out = forward(variables, batch)
    jax.block_until_ready(out)  # compile + warm up

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(variables, batch)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "coocc_multi_r50_256x704 inference frames/sec/chip",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
