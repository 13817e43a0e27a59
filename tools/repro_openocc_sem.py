#!/usr/bin/env python
"""Reproduce/bisect the openoccupancy semantic-stage TPU-worker crash.

relay_bisect_openocc.log: the stop_at=sem prefix of
coocc_multi_r101_openoccupancy kills the TPU worker (UNAVAILABLE, "kernel
fault") while img/pts/fuse prefixes run. The semantic stack at this
config's shapes is CustomResNet3D + FPN3D over [1, 128, 128, 10, 128] in
z-batch layout (Z progression 10 -> 5 -> 3 -> 2 with stride-2 stages —
the flagship runs 8 -> 4 -> 2 -> 1, all even). This drives the stack in
isolation, mode per process, so a worker kill names the sub-part:

  proj    input_proj only (1x1x1 conv + BN)
  s0..s3  encoder truncated after stage i (zb path, as the model runs)
  s3n     full encoder with zb=False (native conv3d lowering) — isolates
          the z-batch decomposition from the shapes themselves
  fpn     encoder + FPN3D (zb)

Usage: python tools/repro_openocc_sem.py --mode s1 [--z 10]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", required=True)
    p.add_argument("--z", type=int, default=10)
    p.add_argument("--xy", type=int, default=128)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from coocc_tpu.config import get_config
    from coocc_tpu.nn.fpn3d import FPN3D
    from coocc_tpu.nn.layers import Conv3d
    from coocc_tpu.nn.resnet3d import CustomResNet3D

    cfg = get_config("coocc_multi_r101_openoccupancy")
    dtype = jnp.bfloat16

    # single-conv modes: the exact stage-3 convs in isolation (zb layout),
    # optionally under the alternative z lowerings via env
    # (COOCC_ZSLICE_TAP / COOCC_ZPAD_STACK are read inside Conv3d)
    single = {
        # name: (in_shape [B, Z, X, Y, C], features, kernel, stride)
        "c31": ((1, 3, 32, 32, 512), 1024, (3, 3, 3), (2, 2, 2)),
        "c32": ((1, 2, 16, 16, 1024), 1024, (3, 3, 3), (1, 1, 1)),
        "ds3": ((1, 3, 32, 32, 512), 1024, (1, 1, 1), (2, 2, 2)),
    }
    if args.mode in single:
        shp, feats, ks, st = single[args.mode]
        x = jax.random.normal(jax.random.PRNGKey(0), shp, dtype)
        conv = Conv3d(feats, ks, st, 1 if ks[0] == 3 else 0,
                      use_bias=False, dtype=dtype)
        v = conv.init(jax.random.PRNGKey(1), x, zb=True)
        t0 = time.perf_counter()
        val = float(jax.jit(
            lambda v, x: jnp.sum(jnp.abs(
                conv.apply(v, x, zb=True).astype(jnp.float32))))(v, x))
        print(f"[{args.mode}] RUN OK {val:.3e} "
              f"{time.perf_counter()-t0:.0f}s "
              f"zslice={os.environ.get('COOCC_ZSLICE_TAP', '')} "
              f"zpad={os.environ.get('COOCC_ZPAD_STACK', '')}", flush=True)
        return
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (1, args.xy, args.xy, args.z, 128), dtype)

    enc = CustomResNet3D(depth=cfg.semantic.depth,
                         block_inplanes=cfg.semantic.block_inplanes,
                         block_strides=cfg.semantic.block_strides,
                         out_indices=cfg.semantic.out_indices, dtype=dtype)

    mode = args.mode
    zb = mode != "s3n"
    stop = {"proj": -1, "s0": 0, "s1": 1, "s2": 2, "s3": None,
            "s3n": None, "fpn": None}[mode]

    def run_enc(v, x):
        return enc.apply(v, x, train=False, zb=zb, zb_out=zb,
                         stop_stage=stop)

    t0 = time.perf_counter()
    v = jax.jit(lambda r, x: enc.init(r, x, train=False, zb=zb, zb_out=zb,
                                      stop_stage=stop))(
        jax.random.PRNGKey(1), x)
    print(f"[{mode}] init ok {time.perf_counter()-t0:.0f}s", flush=True)

    if mode == "fpn":
        neck = FPN3D(in_channels=cfg.semantic.block_inplanes,
                     out_channels=cfg.semantic.neck_out_channels,
                     with_cp=False, dtype=dtype)
        mid_shapes = jax.eval_shape(run_enc, v, x)
        nv = jax.jit(lambda r, m: neck.init(r, list(m), train=False,
                                            zb=True))(
            jax.random.PRNGKey(2),
            jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), mid_shapes))

        def run(v, nv, x):
            mid = run_enc(v, x)
            out = neck.apply(nv, list(mid), train=False, zb=True)
            return sum(jnp.sum(jnp.abs(o.astype(jnp.float32)))
                       for o in out)

        t0 = time.perf_counter()
        val = float(jax.jit(run)(v, nv, x))
        print(f"[{mode}] RUN OK {val:.3e} {time.perf_counter()-t0:.0f}s",
              flush=True)
        return

    def run(v, x):
        outs = run_enc(v, x)
        return sum(jnp.sum(jnp.abs(o.astype(jnp.float32))) for o in outs)

    t0 = time.perf_counter()
    val = float(jax.jit(run)(v, x))
    print(f"[{mode}] RUN OK {val:.3e} {time.perf_counter()-t0:.0f}s",
          flush=True)


if __name__ == "__main__":
    main()
