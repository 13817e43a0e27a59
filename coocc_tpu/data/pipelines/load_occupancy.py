"""Occupancy GT loading (SurroundOcc & OpenOccupancy label formats) + BDA.

Capability parity with LoadOccupancy / LoadOccupancy2
(reference: datasets/pipelines/loading.py:18-393):
  * SurroundOcc: sparse [K, 4] (x, y, z, cls) npy -> dense [X, Y, Z] grid,
    class 0 -> 255 ignore (:115-116)
  * OpenOccupancy: sparse voxel [K, 4] (z?, ..., cls) per-scene npy with a
    numba majority-vote densifier -> vectorized numpy sort-reduce here
  * BDA (bird's-eye data augmentation) sampling: flips + rotation + scale
    (voxel_transform, loading.py:450-487)
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def sample_bda(bda_cfg, rng: Optional[np.random.RandomState] = None):
    rng = rng or np.random
    rot = rng.uniform(*bda_cfg.get("rot_lim", (0, 0)))
    scale = rng.uniform(*bda_cfg.get("scale_lim", (1, 1)))
    flip_dx = rng.uniform() < bda_cfg.get("flip_dx_ratio", 0)
    flip_dy = rng.uniform() < bda_cfg.get("flip_dy_ratio", 0)
    flip_dz = rng.uniform() < bda_cfg.get("flip_dz_ratio", 0)
    return rot, scale, flip_dx, flip_dy, flip_dz


def bda_matrix(rotate_deg=0.0, scale=1.0, flip_dx=False, flip_dy=False,
               flip_dz=False) -> np.ndarray:
    """[3, 3] BDA rotation (reference voxel_transform, loading.py:450-487).

    Note the reference composes flip @ rot and never applies `scale` to the
    matrix (scale_lim is (1, 1) in all shipped configs).
    """
    a = np.deg2rad(rotate_deg)
    rot = np.array([[np.cos(a), -np.sin(a), 0],
                    [np.sin(a), np.cos(a), 0],
                    [0, 0, 1]], np.float32)
    flip = np.eye(3, dtype=np.float32)
    if flip_dx:
        flip = flip @ np.diag([-1.0, 1.0, 1.0]).astype(np.float32)
    if flip_dy:
        flip = flip @ np.diag([1.0, -1.0, 1.0]).astype(np.float32)
    if flip_dz:
        flip = flip @ np.diag([1.0, 1.0, -1.0]).astype(np.float32)
    return (flip @ rot).astype(np.float32)


def load_surroundocc_gt(occ_npy_path: str, grid_size,
                        use_semantic: bool = True) -> np.ndarray:
    """SurroundOcc sparse labels -> dense [X, Y, Z]; cls 0 -> 255 ignore."""
    occ = np.load(occ_npy_path).astype(np.float32)
    return densify_surroundocc(occ, grid_size, use_semantic)


def densify_surroundocc(occ: np.ndarray, grid_size,
                        use_semantic: bool = True) -> np.ndarray:
    voxel = np.zeros(tuple(grid_size), np.int64)
    cls = occ[:, 3].copy()
    if use_semantic:
        cls[cls == 0] = 255
    else:
        keep = cls > 0
        occ = occ[keep]
        cls = np.ones(occ.shape[0])
    voxel[occ[:, 0].astype(np.int64), occ[:, 1].astype(np.int64),
          occ[:, 2].astype(np.int64)] = cls.astype(np.int64)
    return voxel


def majority_vote_densify(coords: np.ndarray, labels: np.ndarray,
                          grid_size) -> np.ndarray:
    """Vectorized replacement for the reference's numba nb_process_label
    (loading.py:433-448): per output voxel, the most frequent label with
    smallest-label tie-break.
    """
    X, Y, Z = grid_size
    lid = (coords[:, 0].astype(np.int64) * Y + coords[:, 1]) * Z + coords[:, 2]
    order = np.lexsort((labels, lid))
    lid_s, lab_s = lid[order], labels[order]
    # count (voxel, label) pairs
    key = lid_s * 4096 + lab_s
    uniq, counts = np.unique(key, return_counts=True)
    uvox = uniq // 4096
    ulab = uniq % 4096
    # pick max count per voxel, ties -> smallest label (lexsort order)
    o = np.lexsort((ulab, -counts, uvox))
    uvox_o = uvox[o]
    first = np.ones(len(o), bool)
    first[1:] = uvox_o[1:] != uvox_o[:-1]
    voxel = np.zeros(X * Y * Z, np.int64)
    voxel[uvox_o[first]] = ulab[o][first]
    return voxel.reshape(X, Y, Z)


def world_to_voxel(points: np.ndarray, pc_range, voxel_size) -> np.ndarray:
    pcr = np.asarray(pc_range)
    vs = np.asarray(voxel_size)
    return np.floor((points - pcr[:3]) / vs).astype(np.int64)
