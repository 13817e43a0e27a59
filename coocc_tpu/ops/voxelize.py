"""LiDAR voxelization as a sorted segment-mean (TPU-native hard voxelizer).

Replaces the reference's CUDA hard voxelization + HardSimpleVFE mean
(reference: mmdetection3d/mmdet3d/ops/voxel/voxelize.py:10-148 wrapper around
voxelization_cuda, and voxel_encoders/voxel_encoder.py:13-45), re-designed for
XLA: fixed-capacity padded tensors, one stable sort by voxel id, segment
reductions — no atomics, no dynamic shapes.

Semantics matched to the reference:
  * points outside point_cloud_range are dropped
  * at most `max_points_per_voxel` points contribute to a voxel's mean, taken
    in original point order (the CUDA kernel fills slots first-come)
  * at most `max_voxels` voxels are kept, in order of first appearance
  * per-voxel feature = mean over its (<= cap) points

Output is a fixed-capacity "sparse grid": sorted linear voxel ids + features +
validity mask, which feeds the gather-GEMM-scatter sparse conv stack
(coocc_tpu.ops.sparse_conv).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class VoxelizedPoints(NamedTuple):
    """Fixed-capacity voxelized point cloud.

    ids:      [V] int32 linear voxel ids (x-major: ((x*ny)+y)*nz+z), sorted
              ascending; padding slots hold id = num_cells (one past the end).
    features: [V, F] float mean point features per voxel (0 for padding).
    mask:     [V] bool validity.
    """
    ids: jnp.ndarray
    features: jnp.ndarray
    mask: jnp.ndarray


def linearize(coords: jnp.ndarray, grid_size) -> jnp.ndarray:
    """[..., 3] integer xyz -> linear id, x-major then y then z."""
    nx, ny, nz = [int(g) for g in grid_size]
    return (coords[..., 0] * ny + coords[..., 1]) * nz + coords[..., 2]


def delinearize(ids: jnp.ndarray, grid_size) -> jnp.ndarray:
    nx, ny, nz = [int(g) for g in grid_size]
    z = ids % nz
    y = (ids // nz) % ny
    x = ids // (nz * ny)
    return jnp.stack([x, y, z], axis=-1)


def voxelize(
    points: jnp.ndarray,
    points_mask: jnp.ndarray,
    point_cloud_range,
    voxel_size,
    grid_size: Tuple[int, int, int],
    max_voxels: int,
    max_points_per_voxel: int = 10,
    num_features: int | None = None,
    exact_overflow: bool = False,
) -> VoxelizedPoints:
    """Hard-voxelize a padded point cloud.

    Args:
      points:      [P, F] padded points (x, y, z, ...features).
      points_mask: [P] bool; False rows are padding.
      point_cloud_range: (x0, y0, z0, x1, y1, z1).
      voxel_size:  (vx, vy, vz).
      grid_size:   static (nx, ny, nz); must equal range/voxel_size.
      max_voxels:  static output capacity V.
      max_points_per_voxel: points beyond this per-voxel cap are excluded
        from the mean (reference cap = 10).
      num_features: mean only the first `num_features` columns (the reference
        feeds 5-dim points to a 4-channel encoder; see SURVEY §2.5-quirks).

    Returns: VoxelizedPoints with capacity max_voxels.
    """
    P, F = points.shape
    if num_features is None:
        num_features = F
    nx, ny, nz = [int(g) for g in grid_size]
    num_cells = nx * ny * nz

    pcr = jnp.asarray(point_cloud_range, points.dtype)
    vs = jnp.asarray(voxel_size, points.dtype)
    coords = jnp.floor((points[:, :3] - pcr[:3]) / vs).astype(jnp.int32)
    in_range = jnp.all(
        (coords >= 0) & (coords < jnp.array([nx, ny, nz], jnp.int32)), axis=-1
    )
    valid = in_range & points_mask

    ids = jnp.where(valid, linearize(coords, grid_size), num_cells)

    # Stable sort by voxel id keeps original point order inside each voxel,
    # reproducing the CUDA kernel's first-come slot filling.
    order = jnp.argsort(ids, stable=True)
    ids_sorted = ids[order]
    feats_sorted = points[order, :num_features]
    valid_sorted = valid[order]

    # Voxel creation order (the reference creates voxels in point order and
    # drops new voxels beyond max_voxels): the run head's ORIGINAL position is
    # the voxel's arrival index; rank voxels by arrival.
    is_first = jnp.concatenate(
        [jnp.array([True]), ids_sorted[1:] != ids_sorted[:-1]]
    ) & valid_sorted
    positions = jnp.arange(P, dtype=jnp.int32)

    # run index per point + each run's start position (sequence ops only —
    # a searchsorted here costs ~100 ns/query on TPU)
    run = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # [P], sorted-run index
    run_safe = jnp.clip(run, 0, P - 1)
    starts = jax.ops.segment_min(
        jnp.where(is_first, positions, P), jnp.clip(run, 0, P - 1), P,
        indices_are_sorted=True,
    )[run_safe]
    within_rank = positions - starts

    if exact_overflow:
        # Reference cap semantics: when the number of occupied voxels
        # exceeds max_voxels, drop the LATEST-ARRIVING voxels. Needs a rank
        # of run heads by original point position (2 extra sorts).
        head_arrival = jnp.where(is_first, order, jnp.iinfo(jnp.int32).max)
        arrival_rank = jnp.argsort(jnp.argsort(head_arrival)).astype(jnp.int32)
        seg_rank = arrival_rank[starts]  # [P]
    else:
        # Fast path: cap in sorted-id order (drop the largest voxel ids on
        # overflow). Identical whenever occupied voxels <= max_voxels — the
        # common case for the shipped configs' caps; ~2 sorts cheaper.
        seg_rank = run

    take = valid_sorted & (within_rank < max_points_per_voxel) \
        & (seg_rank < max_voxels)
    # output slot = voxel rank (capped segments -> overflow bin)
    slot_of_point = jnp.where(valid_sorted & (seg_rank < max_voxels),
                              seg_rank, max_voxels)
    num_segments = max_voxels + 1
    # fast path slots are the sorted run index -> monotonic, which lets the
    # segment reductions skip the scatter lowering
    sorted_slots = not exact_overflow

    feat_sum = jax.ops.segment_sum(
        jnp.where(take[:, None], feats_sorted, 0.0), slot_of_point,
        num_segments, indices_are_sorted=sorted_slots,
    )[:max_voxels]
    count = jax.ops.segment_sum(
        take.astype(points.dtype), slot_of_point, num_segments,
        indices_are_sorted=sorted_slots,
    )[:max_voxels]
    seg_ids = jax.ops.segment_min(
        jnp.where(slot_of_point < max_voxels, ids_sorted, num_cells),
        slot_of_point, num_segments, indices_are_sorted=sorted_slots,
    )[:max_voxels]

    n_voxels = jnp.sum(is_first.astype(jnp.int32))
    slot = jnp.arange(max_voxels, dtype=jnp.int32)
    seg_valid = slot < jnp.minimum(n_voxels, max_voxels)

    mean = feat_sum / jnp.maximum(count[:, None], 1.0)
    mean = jnp.where(seg_valid[:, None], mean, 0.0)
    out_ids = jnp.where(seg_valid, seg_ids, num_cells).astype(jnp.int32)

    if exact_overflow:
        # arrival-ranked slots are unordered in id space; re-sort so
        # downstream sparse ops get sorted ids
        id_order = jnp.argsort(out_ids, stable=True)
        return VoxelizedPoints(
            ids=out_ids[id_order],
            features=mean[id_order],
            mask=seg_valid[id_order],
        )
    # fast path: slots == sorted-run index, already id-ordered
    return VoxelizedPoints(ids=out_ids, features=mean, mask=seg_valid)


def voxelize_mask(
    points: jnp.ndarray,
    points_mask: jnp.ndarray,
    point_cloud_range,
    voxel_size,
    grid_size: Tuple[int, int, int],
    max_voxels: int | None = None,
) -> jnp.ndarray:
    """Dense boolean occupancy grid of the hard voxelizer's KEPT voxels.

    Sort-free fast path for consumers that only need voxel occupancy (the
    dense LiDAR encoder: its degenerate stem GroupNorm erases the voxel
    features, so only the mask matters — see nn/sparse_enc_dense.py). Equals
    scattering `voxelize(...).ids` into a dense grid, including the fast
    path's overflow rule (drop the largest linear ids beyond `max_voxels`),
    but costs one scatter + one cumsum instead of a 350k-point sort chain.

    Returns: [nx, ny, nz] bool.
    """
    nx, ny, nz = [int(g) for g in grid_size]
    num_cells = nx * ny * nz

    pcr = jnp.asarray(point_cloud_range, points.dtype)
    vs = jnp.asarray(voxel_size, points.dtype)
    coords = jnp.floor((points[:, :3] - pcr[:3]) / vs).astype(jnp.int32)
    in_range = jnp.all(
        (coords >= 0) & (coords < jnp.array([nx, ny, nz], jnp.int32)), axis=-1
    )
    valid = in_range & points_mask
    ids = jnp.where(valid, linearize(coords, grid_size), num_cells)

    occ = jnp.zeros((num_cells,), bool).at[ids].set(True, mode="drop")
    if max_voxels is not None and max_voxels < num_cells:
        # id-order cap: keep the max_voxels smallest occupied ids (identical
        # to voxelize()'s fast path whenever occupancy exceeds the cap).
        # Rank SELECTION, not a full prefix sum: only the one lane-row where
        # the cumulative count crosses the cap needs within-row ranks, so
        # the grid-sized work is two cheap passes (row counts + keep mask)
        # instead of the 86-GFLOP triangular-matmul cumsum this replaced
        # (which was most of the 5.7 ms voxelize stage on v5e).
        L = 1024
        if num_cells % L == 0:
            R = num_cells // L
            rows = occ.reshape(R, L)
            counts = rows.sum(axis=1, dtype=jnp.int32)          # [R]
            csum = jnp.cumsum(counts)                           # [R]
            off = csum - counts                                 # exclusive
            total = csum[-1]
            # first row whose inclusive count reaches the cap
            crossing = (off < max_voxels) & (csum >= max_voxels)
            r_star = jnp.argmax(crossing)
            brow = jax.lax.dynamic_slice(rows, (r_star, 0), (1, L))[0]
            brank = jnp.cumsum(brow.astype(jnp.int32))
            quota = max_voxels - off[r_star]
            keep_b = brow & (brank <= quota)
            ridx = jnp.arange(R, dtype=jnp.int32)[:, None]
            capped = jnp.where(
                ridx < r_star, rows,
                jnp.where(ridx == r_star, rows & keep_b[None, :], False))
            occ = jnp.where(total <= max_voxels, rows, capped).reshape(-1)
        else:
            rank = jnp.cumsum(occ.astype(jnp.int32))
            occ = occ & (rank <= max_voxels)
    return occ.reshape(nx, ny, nz)


def voxelize_oracle(points: np.ndarray, point_cloud_range, voxel_size,
                    grid_size, max_voxels: int, max_points_per_voxel: int = 10,
                    num_features: int | None = None):
    """Pure-numpy oracle with the reference's sequential semantics, for tests."""
    if num_features is None:
        num_features = points.shape[1]
    nx, ny, nz = [int(g) for g in grid_size]
    pcr = np.asarray(point_cloud_range)
    vs = np.asarray(voxel_size)
    voxels = {}
    order = []
    for p in points:
        c = np.floor((p[:3] - pcr[:3]) / vs).astype(np.int64)
        if np.any(c < 0) or c[0] >= nx or c[1] >= ny or c[2] >= nz:
            continue
        lid = (c[0] * ny + c[1]) * nz + c[2]
        if lid not in voxels:
            if len(voxels) >= max_voxels:
                continue
            voxels[lid] = []
            order.append(lid)
        if len(voxels[lid]) < max_points_per_voxel:
            voxels[lid].append(p[:num_features])
    ids = np.array(sorted(voxels.keys()), dtype=np.int64)
    feats = np.stack([np.mean(voxels[i], axis=0) for i in ids]) if len(ids) else \
        np.zeros((0, num_features))
    return ids, feats
