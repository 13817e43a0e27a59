#!/usr/bin/env python
"""One serialized TPU perf session: encoder ztap A/B + image/semantic
sub-breakdowns. Designed to run unattended after a relay outage — never
kill it mid-compile (that wedges the relay)."""
from __future__ import annotations

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
    batch = synthetic_batch(cfg, batch_size=1)

    def readback(out):
        leaf = jax.tree.leaves(out)[0]
        return float(leaf.reshape(-1)[0].astype(jnp.float32))

    @jax.jit
    def trivial(x):
        return (x * 2.0).sum()

    readback(trivial(jnp.ones((8, 128))))
    ts = [0.0] * 7
    for i in range(7):
        t0 = time.perf_counter()
        readback(trivial(jnp.ones((8, 128))))
        ts[i] = time.perf_counter() - t0
    t_rt = float(np.median(ts))
    print(f"[rt {t_rt * 1e3:.0f} ms]", flush=True)

    def timed(tag, fn, *a, reps=5):
        t0 = time.perf_counter()
        readback(fn(*a))
        c = time.perf_counter() - t0
        tt = []
        for _ in range(reps):
            t0 = time.perf_counter()
            readback(fn(*a))
            tt.append(time.perf_counter() - t0)
        ms = (float(np.median(tt)) - t_rt) * 1e3
        print(f"{tag:36s} {ms:8.2f} ms  [compile {c:.0f}s]", flush=True)
        return ms

    pts = jnp.asarray(batch.points)
    pm = jnp.asarray(batch.points_mask)
    mask0 = jax.jit(lambda p, m: jax.vmap(lambda pp, mm: voxelize_mask(
        pp, mm, cfg.point_cloud_range, pts_cfg.voxel_size,
        pts_cfg.sparse_shape_xyz,
        max_voxels=pts_cfg.max_voxels_test))(p, m))(pts, pm)

    # ---- encoder ztap A/B (full encoder, then per-level for the winner)
    results = {}
    for ztap in ((), (1,), (1, 2), (1, 2, 3)):
        enc = PackedLiDAREnc8x(
            input_channel=pts_cfg.input_channel,
            base_channel=pts_cfg.base_channel,
            out_channel=pts_cfg.out_channel,
            sparse_shape_xyz=pts_cfg.sparse_shape_xyz,
            capacity=pts_cfg.max_voxels_test,
            compute_dtype=jnp.bfloat16, ztap_levels=ztap)
        vs = jax.jit(enc.init, static_argnames="train")(
            jax.random.PRNGKey(0), mask0, train=False)

        @jax.jit
        def run(v, m, enc=enc):
            return enc.apply(v, m, train=False)

        results[ztap] = timed(f"encoder ztap={ztap}", run, vs, mask0)

    best = min(results, key=results.get)
    print(f"[best ztap {best}: {results[best]:.1f} ms]", flush=True)

    # per-level truncation breakdown for baseline and best
    for ztap in {(), best}:
        prev = 0.0
        for stop in ["stem", "res1", "res2", "res3"]:
            enc = PackedLiDAREnc8x(
                input_channel=pts_cfg.input_channel,
                base_channel=pts_cfg.base_channel,
                out_channel=pts_cfg.out_channel,
                sparse_shape_xyz=pts_cfg.sparse_shape_xyz,
                capacity=pts_cfg.max_voxels_test,
                compute_dtype=jnp.bfloat16, stop_after=stop,
                ztap_levels=ztap)
            vs = jax.jit(enc.init, static_argnames="train")(
                jax.random.PRNGKey(0), mask0, train=False)

            @jax.jit
            def run(v, m, enc=enc):
                return enc.apply(v, m, train=False)

            tt = timed(f"ztap={ztap} through {stop}", run, vs, mask0)
            print(f"    (+{tt - prev:.1f})", flush=True)
            prev = tt

    # ---- image branch breakdown
    from coocc_tpu.nn.depthnet import DepthNet
    from coocc_tpu.nn.resnet2d import ResNet
    from coocc_tpu.nn.second_fpn import SECONDFPN

    imgs = jnp.asarray(batch.imgs)
    B, N, H, W, _ = imgs.shape
    x6 = imgs.reshape(B * N, H, W, 3).astype(jnp.bfloat16)
    rn = ResNet(depth=50, dtype=jnp.bfloat16)
    v_rn = jax.jit(rn.init, static_argnames="train")(
        jax.random.PRNGKey(0), x6, train=False)
    timed("resnet50 6cam", jax.jit(
        lambda v, x: rn.apply(v, x, train=False)), v_rn, x6)

    # space-to-depth stem A/B (exact rewrite, tests/test_s2d_stem.py)
    os.environ["COOCC_S2D_STEM"] = "1"
    timed("resnet50 6cam s2d-stem", jax.jit(
        lambda v, x: rn.apply(v, x, train=False)), v_rn, x6)
    del os.environ["COOCC_S2D_STEM"]

    feats = jax.jit(lambda v, x: rn.apply(v, x, train=False))(v_rn, x6)
    fpn = SECONDFPN(dtype=jnp.bfloat16)
    v_fpn = jax.jit(fpn.init, static_argnames="train")(
        jax.random.PRNGKey(0), feats, train=False)
    timed("second_fpn", jax.jit(
        lambda v, f: fpn.apply(v, f, train=False)), v_fpn, feats)

    neck = jax.jit(lambda v, f: fpn.apply(v, f, train=False))(v_fpn, feats)
    dn = DepthNet(mid_channels=cfg.lss.numC_input,
                  context_channels=cfg.lss.numC_Trans,
                  depth_channels=cfg.grid.num_depth_bins,
                  dtype=jnp.bfloat16)
    mlp_in = jnp.zeros((B * N, 27), jnp.bfloat16)
    v_dn = jax.jit(dn.init, static_argnames="train")(
        jax.random.PRNGKey(0), neck, mlp_in, train=False)
    timed("depth_net", jax.jit(
        lambda v, f, m: dn.apply(v, f, m, train=False)), v_dn, neck, mlp_in)

    # ---- semantic breakdown
    from coocc_tpu.nn.fpn3d import FPN3D
    from coocc_tpu.nn.resnet3d import CustomResNet3D

    Xg, Yg, Zg = cfg.lss_grid_size
    vox = jnp.asarray(
        np.random.RandomState(0).randn(1, Xg, Yg, Zg, 128), jnp.bfloat16)
    sem = CustomResNet3D(depth=cfg.semantic.depth,
                         block_inplanes=cfg.semantic.block_inplanes,
                         block_strides=cfg.semantic.block_strides,
                         out_indices=cfg.semantic.out_indices,
                         dtype=jnp.bfloat16)
    v_sem = jax.jit(sem.init, static_argnames="train")(
        jax.random.PRNGKey(0), vox, train=False)
    timed("semantic_encoder", jax.jit(
        lambda v, x: sem.apply(v, x, train=False)), v_sem, vox)

    # z-sliced tap conv (default) vs legacy padded stack A/B
    # (exact rewrite, tests/test_zslice_conv.py)
    os.environ["COOCC_ZPAD_STACK"] = "1"
    timed("semantic_encoder zpad-stack", jax.jit(
        lambda v, x: sem.apply(v, x, train=False)), v_sem, vox)
    del os.environ["COOCC_ZPAD_STACK"]

    from coocc_tpu.nn.bifuser import BiFuserN
    fus = BiFuserN(in_channels=128, out_channels=128,
                   knum=cfg.fuser.knum, dist_thresh=cfg.fuser.dist_thresh,
                   dtype=jnp.bfloat16)
    vox2 = jnp.asarray(
        np.random.RandomState(1).randn(1, Xg, Yg, Zg, 128), jnp.bfloat16)
    v_fus = jax.jit(fus.init, static_argnames="train")(
        jax.random.PRNGKey(0), vox, vox2, train=False)
    timed("fuser", jax.jit(
        lambda v, a, b: fus.apply(v, a, b, train=False)), v_fus, vox, vox2)
    os.environ["COOCC_ZPAD_STACK"] = "1"
    timed("fuser zpad-stack", jax.jit(
        lambda v, a, b: fus.apply(v, a, b, train=False)), v_fus, vox, vox2)
    del os.environ["COOCC_ZPAD_STACK"]

    mids = jax.jit(lambda v, x: sem.apply(v, x, train=False))(v_sem, vox)
    neck3 = FPN3D(in_channels=cfg.semantic.block_inplanes,
                  out_channels=cfg.semantic.neck_out_channels,
                  dtype=jnp.bfloat16)
    v_n3 = jax.jit(neck3.init, static_argnames="train")(
        jax.random.PRNGKey(0), mids, train=False)
    timed("fpn3d", jax.jit(
        lambda v, m: neck3.apply(v, m, train=False)), v_n3, mids)

    print("[perf session done]", flush=True)


if __name__ == "__main__":
    main()
