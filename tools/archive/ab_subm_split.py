#!/usr/bin/env python
"""On-chip A/B: packed SubM ext conv vs the split in-pack+carry form.
#
# VERDICT (round 5, on-chip): split LOSES — 260.45 ms vs 46.14 ms ext
# (docs/relay_session_r5a.log). Knob deleted from sparse_enc_packed.py;
# archived for the record.

Times the full pts branch (voxelize_mask + PackedLiDAREnc8x) at flagship
shapes with COOCC_SUBM_SPLIT toggled per process-internal flag flip (the
env is read at trace time, so each variant gets its own jit). Timing per
the verify-skill methodology: scalar readback, trivial-jit round-trip
subtracted, median of reps.

Run AFTER the main relay session (serialized chip)."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch
    from coocc_tpu.nn.sparse_enc_packed import PackedLiDAREnc8x
    from coocc_tpu.ops.voxelize import voxelize_mask

    cfg = get_config("coocc_multi_r50_256x704")
    pts_cfg = cfg.pts
    REPS = 7
    # one distinct voxel mask per rep: identical-args repeats can be served
    # from the relay's result cache (round-4 bench_render incident)
    masks = []
    for s in range(REPS + 1):
        b = synthetic_batch(cfg, batch_size=1, seed=s)
        m = voxelize_mask(jnp.asarray(b.points[0]),
                          jnp.asarray(b.points_mask[0]),
                          cfg.point_cloud_range,
                          pts_cfg.voxel_size, pts_cfg.sparse_shape_xyz,
                          max_voxels=pts_cfg.max_voxels_test)[None]
        masks.append(jax.block_until_ready(m))
    mask0 = masks[0]

    enc = PackedLiDAREnc8x(
        input_channel=pts_cfg.input_channel,
        base_channel=pts_cfg.base_channel,
        out_channel=pts_cfg.out_channel,
        sparse_shape_xyz=pts_cfg.sparse_shape_xyz,
        capacity=pts_cfg.max_voxels_test,
        compute_dtype=jnp.bfloat16,
        ztap_levels=tuple(pts_cfg.ztap_levels))
    vs = enc.init(jax.random.PRNGKey(0), mask0, train=False)

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

    results = {}
    for tag, env in (("ext", "0"), ("split", "1")):
        os.environ["COOCC_SUBM_SPLIT"] = env

        @jax.jit
        def run(vs, m):
            return enc.apply(vs, m, train=False).sum()

        t0 = time.perf_counter()
        float(run(vs, mask0))
        compile_s = time.perf_counter() - t0
        tt = []
        for i in range(REPS):
            t0 = time.perf_counter()
            float(run(vs, masks[i + 1]))
            tt.append(time.perf_counter() - t0)
        t_run = float(np.median(tt))
        if t_run <= 1.2 * t_rt:
            raise RuntimeError(
                f"A/B invalid ({tag}): run {t_run*1e3:.2f} ms does not "
                f"clear the round-trip floor {t_rt*1e3:.2f} ms")
        ms = (t_run - t_rt) * 1e3
        results[tag] = round(ms, 2)
        print(f"{tag}: {ms:.2f} ms  [compile {compile_s:.0f}s]", flush=True)

    print(json.dumps({"metric": "pts_encoder_ms", **results,
                      "winner": min(results, key=results.get)}), flush=True)


if __name__ == "__main__":
    main()
