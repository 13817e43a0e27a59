#!/usr/bin/env python
"""Quantify the window-KNN blind spot vs the reference's global KNN.

The reference BiFuser_N (coocc/fuser/bifuser_n.py:56-103) runs a GLOBAL
(FPS-cluster-approximated) nearest-neighbour search with dist_thresh=13.3
voxel units and knum=2; our TPU fuser searches an exact sliding window of
(+-rx, +-ry, +-rz) (nn/bifuser.py). A true in-threshold neighbour 5..13
voxels away in x/y is invisible to the default (+-4, +-4, +-7) window.

This tool measures the miss rate on realistic occupancy at the flagship
fuser grid (100x100x8, 1 m voxels): LiDAR-surface-statistics masks (ground
annulus with 1/r density, box shells for vehicles, wall segments, poles,
range-dependent dropout) for the pts modality, LSS frustum-coverage masks
(6-camera ring, dbound 2..58 m, small splat dropout) for the img modality.

A query cell "misses" if the window's k-th recovered neighbour is farther
than the global k-th (or invalid while the global search found one): those
are exactly the cells where our fused features differ from a full-ball
search. Both searches here share offset-enumeration semantics, so the
comparison isolates the window clipping alone.

Output: per-direction miss rates over several scenes for a sweep of window
radii, as JSON. The FuserConfig window_rx/ry/rz defaults are sized from
this measurement (see README "window-KNN blind spot").
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from coocc_tpu.ops.window_knn import make_offsets  # noqa: E402

X, Y, Z = 100, 100, 8          # flagship fuser grid (occ_size // lss_downsample)
VOX = 1.0                      # fuser-grid voxel edge in meters
GROUND_Z = 3                   # ~-1.7 m lidar height over pcr z in [-5, 3]


def set_grid(x: int, y: int, z: int, vox_m: float, z0_m: float = -5.0):
    """Retarget the scene generators to another fuser grid. vox_m is the
    fuser voxel edge in meters (cubic); z0_m the pc_range z floor —
    the openoccupancy config is 128x128x10 @ 0.8 m
    (occ 512x512x40 / lss_downsample 4)."""
    global X, Y, Z, VOX, GROUND_Z
    X, Y, Z, VOX = x, y, z, vox_m
    GROUND_Z = min(Z - 1, max(0, int(round((-1.7 - z0_m) / vox_m))))


def _m(meters: float) -> float:
    """meters -> cells at the current grid."""
    return meters / VOX


def _center():
    return np.array([(X - 1) / 2.0, (Y - 1) / 2.0])


def lidar_scene(rng: np.random.RandomState) -> np.ndarray:
    """Surface-statistics LiDAR occupancy: ground + car shells + walls."""
    occ = np.zeros((X, Y, Z), bool)
    xs, ys = np.meshgrid(np.arange(X), np.arange(Y), indexing="ij")
    r = np.hypot(xs - _center()[0], ys - _center()[1])
    # ground annulus: return density falls off ~1/r, blind <2 m
    # (all scene scales are in METERS, converted by _m() so the same
    # statistics hold at any fuser voxel size)
    p = np.clip(_m(3.0) / np.maximum(r, 1.0), 0, 0.95) * (r > _m(2))
    occ[..., GROUND_Z] = rng.rand(X, Y) < p
    # vehicles: box shells (top + sides) near the ground, ~2-6 m footprint
    margin = max(2, int(_m(10)))
    for _ in range(rng.randint(8, 20)):
        cx, cy = rng.randint(margin, X - margin), rng.randint(margin,
                                                              Y - margin)
        lx = rng.randint(max(1, int(_m(3))), max(2, int(_m(6))))
        ly = rng.randint(max(1, int(_m(2))), max(2, int(_m(4))))
        lz = rng.randint(max(1, int(_m(2))), max(2, int(_m(3))))
        vis = rng.rand() < np.clip(_m(40.0) / max(np.hypot(
            cx - _center()[0], cy - _center()[1]), 1), 0, 1)
        if not vis:
            continue
        occ[cx:cx + lx, cy:cy + ly, GROUND_Z:GROUND_Z + lz] |= True
    # wall / building segments at the periphery, ~30 m long, 3-5 m tall
    wl = max(2, int(_m(30)))
    h0, h1 = max(1, int(_m(3))), max(2, int(_m(5)))
    for _ in range(rng.randint(2, 6)):
        if rng.rand() < 0.5:
            x0 = rng.randint(0, X - wl)
            y0 = rng.randint(0, Y)
            occ[x0:x0 + wl, y0, GROUND_Z:GROUND_Z + rng.randint(h0, h1)] \
                = True
        else:
            x0 = rng.randint(0, X)
            y0 = rng.randint(0, Y - wl)
            occ[x0, y0:y0 + wl, GROUND_Z:GROUND_Z + rng.randint(h0, h1)] \
                = True
    # poles, ~4 m tall
    for _ in range(rng.randint(5, 15)):
        occ[rng.randint(X), rng.randint(Y),
            GROUND_Z:GROUND_Z + max(1, int(_m(4)))] = True
    # range-dependent dropout (occlusion / divergence)
    keep = rng.rand(X, Y, Z) < np.exp(-r / _m(60.0))[..., None]
    return occ & keep


def frustum_scene(rng: np.random.RandomState) -> np.ndarray:
    """LSS splat coverage: 6-camera ring, ~70 deg HFOV, dbound 2..58 m."""
    xs, ys = np.meshgrid(np.arange(X) - _center()[0], np.arange(Y) - _center()[1],
                         indexing="ij")
    r = np.hypot(xs, ys)
    ang = np.arctan2(ys, xs)
    cover = np.zeros((X, Y), bool)
    for c in range(6):
        d = np.angle(np.exp(1j * (ang - c * np.pi / 3)))
        cover |= np.abs(d) < np.deg2rad(35)
    cover &= (r > _m(2)) & (r < _m(58))
    occ = np.broadcast_to(cover[..., None], (X, Y, Z)).copy()
    # splat dropout: cells where no ray deposited
    return occ & (rng.rand(X, Y, Z) > 0.02)


def dilate1(m: np.ndarray) -> np.ndarray:
    """3^3 dilation ~ sparse-encoder receptive growth at the fuser grid."""
    out = m.copy()
    for ax in range(3):
        out |= np.roll(m, 1, ax) | np.roll(m, -1, ax)
    return out


def best_k_dists(key: np.ndarray, offsets: np.ndarray, k: int = 2):
    """Per-cell sorted distances of the k nearest active key cells."""
    d = np.linalg.norm(offsets.astype(np.float64), axis=-1)
    INF = np.float64(np.inf)
    best = np.full((k, X, Y, Z), INF)
    px, py, pz = (int(np.abs(offsets[:, i]).max()) for i in range(3))
    pad = np.pad(key, ((px, px), (py, py), (pz, pz)))
    for o, (dx, dy, dz) in enumerate(offsets):
        win = pad[px + dx:px + dx + X, py + dy:py + dy + Y,
                  pz + dz:pz + dz + Z]
        v = np.where(win, d[o], INF)
        for j in range(k):
            nb = np.minimum(best[j], v)
            v = np.maximum(best[j], v)
            best[j] = nb
    return best


def run(seeds, radii, k=2, dist_thresh=13.3):
    # the full in-threshold ball: 13.3 cells in xy, z capped by the grid
    global_offs = make_offsets(13, 13, min(13, Z - 1), dist_thresh)
    report = {}
    for rx, ry, rz in radii:
        win_offs = make_offsets(rx, ry, rz, dist_thresh)
        rates = {"pts2img": [], "img2pts": []}
        for seed in seeds:
            rng = np.random.RandomState(seed)
            pts = dilate1(lidar_scene(rng))
            img = frustum_scene(rng)
            gi, gp = best_k_dists(img, global_offs, k), None
            wi = best_k_dists(img, win_offs, k)
            # pts-active queries looking for img keys
            q = pts
            miss = ((wi > gi + 1e-9) & np.isfinite(gi)).any(0)
            rates["pts2img"].append(float(miss[q].mean()))
            gp = best_k_dists(pts, global_offs, k)
            wp = best_k_dists(pts, win_offs, k)
            q = img
            miss = ((wp > gp + 1e-9) & np.isfinite(gp)).any(0)
            rates["img2pts"].append(float(miss[q].mean()))
        report[f"({rx},{ry},{rz})"] = {
            d: {"mean": float(np.mean(v)), "max": float(np.max(v))}
            for d, v in rates.items()
        }
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--radii", type=str, default="4,4,7;6,6,7;8,8,7")
    ap.add_argument("--grid", type=str, default=None,
                    help="X,Y,Z,vox_m[,z0_m] fuser grid override; the "
                    "openoccupancy config is 128,128,10,0.8")
    args = ap.parse_args()
    if args.grid:
        g = [float(v) for v in args.grid.split(",")]
        set_grid(int(g[0]), int(g[1]), int(g[2]), g[3],
                 z0_m=(g[4] if len(g) > 4 else -5.0))
    radii = [tuple(int(v) for v in r.split(","))
             for r in args.radii.split(";")]
    rep = run(range(args.seeds), radii)
    print(json.dumps(rep, indent=2))


if __name__ == "__main__":
    main()
