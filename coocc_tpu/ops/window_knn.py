"""Grid-space windowed K-nearest-active-cell search (GSFusion core op).

The reference's BiFuser_N finds, for every active voxel of one modality, the
k nearest active voxels of the other modality in voxel-index space, via an
FPS(2048) + ball-query cluster approximation with CUDA ops
(reference: coocc/fuser/bifuser_n.py:38-125; dist_thresh=13.3, knum from
config). Both query and key sets ARE grid cells, so on TPU this is re-designed
as a dense sliding-window search:

  * enumerate window offsets sorted by their (constant) L2 norm;
  * for every grid cell, scan offsets in that order over the shifted
    key-activity mask; the first k active offsets are the exact k nearest
    keys (within the window radius).

This is exact whenever k actives lie within the window — virtually always for
the dense post-splat grids — and strictly more faithful than the reference's
own FPS-cluster approximation, at ~1/1000th the distance computations.
Cells with fewer than k in-window actives yield invalid slots (idx -1),
which the fuser zeroes (the reference's -1 wraps to the last active voxel —
a wart we do not reproduce).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_offsets(rx: int, ry: int, rz: int,
                 dist_thresh: float) -> np.ndarray:
    """Window offsets sorted by L2 norm (stable), clipped at dist_thresh."""
    dx, dy, dz = np.meshgrid(np.arange(-rx, rx + 1), np.arange(-ry, ry + 1),
                             np.arange(-rz, rz + 1), indexing="ij")
    offs = np.stack([dx, dy, dz], -1).reshape(-1, 3)
    d = np.linalg.norm(offs, axis=-1)
    keep = d < dist_thresh
    offs, d = offs[keep], d[keep]
    order = np.argsort(d, kind="stable")
    return offs[order].astype(np.int32)


def window_knn(key_mask: jnp.ndarray, offsets: np.ndarray,
               k: int) -> jnp.ndarray:
    """For every cell, indices of the k nearest ACTIVE cells of `key_mask`.

    Args:
      key_mask: [X, Y, Z] bool activity of the key modality.
      offsets:  [O, 3] window offsets sorted by distance (make_offsets).
      k:        number of neighbours.

    Returns: [X, Y, Z, k] int32 linear cell index of each neighbour
      (-1 where fewer than k actives fall inside the window).

    Vectorized as k argmax reductions over the offset axis: offsets are
    pre-sorted by distance, so "first active offset" == nearest neighbour.
    No scan — ~k passes over the [O, X*Y*Z] shifted-activity tensor.
    """
    assert k == 2, "window_knn is specialized for k=2 (GSFusion knum)"
    import os

    X, Y, Z = key_mask.shape
    O = offsets.shape[0]
    rx, ry, rz = [int(np.abs(offsets[:, i]).max()) for i in range(3)]
    n = X * Y * Z
    BIG = jnp.int32(O)

    # Pallas best-2 kernel is the DEFAULT on TPU since the round-3 on-chip
    # A/B (exact match; fuser 14.56 vs 15.92 ms at (4,4,7), 16.80 vs 18.66
    # at (6,6,7) — tools/ab_knn_r3.py). COOCC_PALLAS_KNN=0 reverts to the
    # XLA reduction; =interpret forces the kernel's CPU interpreter (tests).
    mode = os.environ.get("COOCC_PALLAS_KNN", "1")
    if (mode not in ("", "0", "off")
            and (mode == "interpret" or jax.default_backend() == "tpu")):
        # VMEM-resident best-2 rank kernel: avoids materializing the
        # [O, n] plane tensor in HBM (numerics identical)
        from .pallas.window_knn import window_knn_best2
        b1, b2 = window_knn_best2(key_mask, offsets,
                                  interpret=(mode == "interpret"))
        return _ranks_to_ids(b1.reshape(n), b2.reshape(n), offsets,
                             (X, Y, Z), k)

    padded = jnp.pad(key_mask, ((rx, rx), (ry, ry), (rz, rz)))

    # Build ALL window planes with ~(2rx + 2ry + 2rz + 3) hierarchical
    # slices (a per-offset loop costs >1000 op launches), then find the two
    # smallest DISTANCE-RANKS among active planes: i16 rank constants are
    # looked up through the raster -> distance-rank permutation.
    zs = jnp.stack([padded[:, :, dz:dz + Z] for dz in range(2 * rz + 1)])
    ys = jnp.stack([zs[:, :, dy:dy + Y] for dy in range(2 * ry + 1)])
    xs = jnp.stack([ys[:, :, dx:dx + X] for dx in range(2 * rx + 1)])
    # xs: [2rx+1, 2ry+1, 2rz+1, X, Y, Z] raster-ordered window planes
    n_planes = (2 * rx + 1) * (2 * ry + 1) * (2 * rz + 1)
    planes = xs.reshape(n_planes, n)

    # raster position of each (distance-sorted, thresh-clipped) offset row;
    # window cells beyond dist_thresh never got an offset row -> rank BIG
    raster = ((offsets[:, 0] + rx) * (2 * ry + 1)
              + (offsets[:, 1] + ry)) * (2 * rz + 1) + (offsets[:, 2] + rz)
    I16BIG = np.int16(np.iinfo(np.int16).max)
    assert n_planes < np.iinfo(np.int16).max, (
        f"window_knn rank table overflows int16: {n_planes} planes")
    rank_of_raster = np.full(n_planes, I16BIG, np.int16)
    rank_of_raster[raster] = np.arange(O, dtype=np.int16)
    ranks = jnp.asarray(rank_of_raster)[:, None]  # [n_planes, 1] i16

    vals = jnp.where(planes, ranks, I16BIG)  # [n_planes, n] i16
    best1_16 = jnp.min(vals, axis=0)
    # ranks are unique, so masking by value-equality (one pass) replaces the
    # argmin+iota-compare construction of the second-best
    vals2 = jnp.where(vals == best1_16[None], I16BIG, vals)
    best2_16 = jnp.min(vals2, axis=0)
    best1 = jnp.minimum(best1_16.astype(jnp.int32), BIG)
    best2 = jnp.minimum(best2_16.astype(jnp.int32), BIG)
    return _ranks_to_ids(best1, best2, offsets, (X, Y, Z), k)


def _ranks_to_ids(best1, best2, offsets, shape, k):
    """Distance-ranks [n] i32 (O = none) -> neighbour ids [X, Y, Z, k]."""
    X, Y, Z = shape
    n = X * Y * Z
    O = offsets.shape[0]
    # neighbour linear id = cell id + per-offset delta (out-of-range offsets
    # are never active in the padded mask, so wraparound ids are never
    # selected)
    delta = jnp.asarray(
        (offsets[:, 0] * Y + offsets[:, 1]) * Z + offsets[:, 2]
    ).astype(jnp.int32)  # [O]
    delta = jnp.concatenate([delta, jnp.zeros((1,), jnp.int32)])  # BIG slot
    cell_id = jnp.arange(n, dtype=jnp.int32)

    idx1 = jnp.where(best1 < O, cell_id + delta[jnp.minimum(best1, O)], -1)
    idx2 = jnp.where(best2 < O, cell_id + delta[jnp.minimum(best2, O)], -1)
    return jnp.stack([idx1, idx2], axis=-1).reshape(X, Y, Z, k)
