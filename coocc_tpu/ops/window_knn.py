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
    X, Y, Z = key_mask.shape
    O = offsets.shape[0]
    rx, ry, rz = [int(np.abs(offsets[:, i]).max()) for i in range(3)]

    padded = jnp.pad(key_mask, ((rx, rx), (ry, ry), (rz, rz)))
    pY, pZ = Y + 2 * ry, Z + 2 * rz

    # flat index of every cell in the padded layout
    cx = jnp.arange(X)[:, None, None] + rx
    cy = jnp.arange(Y)[None, :, None] + ry
    cz = jnp.arange(Z)[None, None, :] + rz
    base = ((cx * pY) + cy) * pZ + cz  # [X, Y, Z]
    off_flat = jnp.asarray(
        (offsets[:, 0] * pY + offsets[:, 1]) * pZ + offsets[:, 2])

    padded_flat = padded.reshape(-1)
    n = X * Y * Z
    # shifted activity per offset: [O, n]
    shifted = padded_flat[base.reshape(1, n) + off_flat[:, None]]

    # neighbour linear id = cell id + per-offset delta (out-of-range offsets
    # are never active in `padded`, so wraparound ids are never selected)
    delta = jnp.asarray(
        (offsets[:, 0] * Y + offsets[:, 1]) * Z + offsets[:, 2]
    ).astype(jnp.int32)  # [O]
    cell_id = jnp.arange(n, dtype=jnp.int32)

    idxs = []
    act = shifted
    for _ in range(k):
        first = jnp.argmax(act, axis=0)               # first True offset
        has = jnp.any(act, axis=0)
        nb = cell_id + delta[first]                    # tiny-table gather
        idxs.append(jnp.where(has, nb, -1))
        # mask out the selected offset for the next round
        act = act & (jax.lax.broadcasted_iota(jnp.int32, act.shape, 0)
                     != first[None])
    return jnp.stack(idxs, axis=-1).reshape(X, Y, Z, k)
