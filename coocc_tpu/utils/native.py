"""ctypes bindings for the native host-preprocessing library.

Auto-builds native/libcoocc_host.so with make on first use; every entry
point has a pure-numpy fallback so the package works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcoocc_host.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.zbuffer_depth.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
        lib.majority_vote.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        lib.voxelize_mean.restype = ctypes.c_int64
        lib.voxelize_mean.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def zbuffer_depth(uvd: np.ndarray, img_h: int, img_w: int) -> np.ndarray:
    """[P, 3] (u, v, d) -> [H, W] depth map, closest positive depth wins."""
    lib = _load()
    if lib is not None:
        uvd = np.ascontiguousarray(uvd, np.float32)
        out = np.zeros((img_h, img_w), np.float32)
        lib.zbuffer_depth(_fptr(uvd), uvd.shape[0], img_h, img_w, _fptr(out))
        return out
    # numpy fallback: sort descending so closest written last
    u = np.round(uvd[:, 0])
    v = np.round(uvd[:, 1])
    d = uvd[:, 2]
    valid = (u >= 0) & (v >= 0) & (u <= img_w - 1) & (v <= img_h - 1) & (d > 0)
    out = np.zeros((img_h, img_w), np.float32)
    order = np.argsort(-d[valid], kind="stable")
    ui = u[valid].astype(np.int64)[order]
    vi = v[valid].astype(np.int64)[order]
    out[vi, ui] = d[valid][order]
    return out


def majority_vote(coords: np.ndarray, labels: np.ndarray,
                  grid_size) -> np.ndarray:
    """Sparse (coords [n,3], labels [n]) -> dense [X, Y, Z] majority grid."""
    X, Y, Z = [int(g) for g in grid_size]
    lib = _load()
    if lib is not None:
        coords = np.ascontiguousarray(coords, np.int64)
        labels = np.ascontiguousarray(labels, np.int64)
        grid = np.zeros(X * Y * Z, np.int64)
        lib.majority_vote(_iptr(coords), _iptr(labels), coords.shape[0],
                          X, Y, Z, _iptr(grid))
        return grid.reshape(X, Y, Z)
    from ..data.pipelines.load_occupancy import majority_vote_densify
    return majority_vote_densify(coords, labels, (X, Y, Z))


def voxelize_mean(points: np.ndarray, pc_range, voxel_size, grid_size,
                  max_points: int = 10, max_voxels: int = 90000):
    """Host-side hard voxelization -> (ids [V], feats [V, F], n_vox)."""
    X, Y, Z = [int(g) for g in grid_size]
    lib = _load()
    if lib is not None:
        pts = np.ascontiguousarray(points, np.float32)
        pcr = np.ascontiguousarray(pc_range, np.float32)
        vs = np.ascontiguousarray(voxel_size, np.float32)
        ids = np.zeros(max_voxels, np.int64)
        feats = np.zeros((max_voxels, pts.shape[1]), np.float32)
        n = lib.voxelize_mean(_fptr(pts), pts.shape[0], pts.shape[1],
                              _fptr(pcr), _fptr(vs), X, Y, Z,
                              max_points, max_voxels, _iptr(ids), _fptr(feats))
        return ids, feats, int(n)
    from ..ops.voxelize import voxelize_oracle
    ids, feats = voxelize_oracle(points, pc_range, voxel_size, grid_size,
                                 max_voxels, max_points)
    out_ids = np.zeros(max_voxels, np.int64)
    out_feats = np.zeros((max_voxels, points.shape[1]), np.float32)
    out_ids[:len(ids)] = ids
    out_feats[:len(ids), :feats.shape[1]] = feats
    return out_ids, out_feats, len(ids)
