#!/usr/bin/env python
"""Time the REAL OccHead.apply (full cascade, flagship variables) alone.

The prefix profile attributes 17 ms to coarse->full but the isolated cascade
pieces (tools/profile_cascade.py) only sum to ~3 ms; this times the actual
head subgraph with config toggles (img sampling off, voxel sampling off,
reduced eval capacity) to attribute the difference.
"""
from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch
    from coocc_tpu.nn.occ_head import OccHead
    from tools._prof import make_timer

    cfg = get_config("coocc_multi_r50_256x704")
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(1)
    # real semantic-neck output shapes/layout (z-batch, 256 ch)
    sem = [jax.random.normal(jax.random.fold_in(key, i),
                             (1, max(1, 8 // 2 ** i), 100 // 2 ** i,
                              100 // 2 ** i, 256), dtype)
           for i in range(4)]
    img_feats = jax.random.normal(key, (1, 6, 16, 44, 512), dtype)
    batch = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(x),
        synthetic_batch(cfg, batch_size=1),
        is_leaf=lambda x: x is None)
    transform = (batch.rots, batch.trans, batch.intrins, batch.post_rots,
                 batch.post_trans, batch.bda)

    timed = make_timer()
    variants = [
        ("full cascade", {}),
        ("no img sampling", dict(sample_from_img=False)),
        ("no voxel sampling", dict(sample_from_voxel=False)),
        ("cap 2000", dict(max_coarse_occupied=2000)),
        ("coarse only", dict(cascade_ratio=1)),
    ]
    for name, repl in variants:
        head = OccHead(cfg=dataclasses.replace(cfg.occ_head, **repl),
                       dtype=dtype)
        v = jax.jit(head.init, static_argnames=("train", "zb"))(
            jax.random.PRNGKey(0), sem, img_feats=img_feats,
            transform=transform, train=False, zb=True)

        def run(v, s, imf, tr, head=head):
            return head.apply(v, list(s), img_feats=imf, transform=tr,
                              train=False, zb=True)

        timed(name, jax.jit(run), v, sem, img_feats, transform)


if __name__ == "__main__":
    main()
