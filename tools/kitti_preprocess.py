#!/usr/bin/env python
"""SemanticKITTI voxel GT preprocessing: labels -> multi-scale dense npys.

Capability parity with the reference preprocessing tools
(projects/mmdet3d_plugin/tools/kitti_process/semantic_kitti_preprocess.py +
io_data.py): unpack voxels/*.{bin,label,invalid}, remap raw labels through
the learning map, mark invalid voxels 255, and write frame_1_1.npy plus
majority-pooled 1_2/1_4/1_8/1_16 scales — vectorized numpy (the reference
loops voxel-by-voxel).

SemanticKITTI voxel volumes are 256x256x32 uint16 labels / packed uint8
occupancy bitmaps.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coocc_tpu.config.semantic_kitti import learning_map_array  # noqa: E402

GRID = (256, 256, 32)


def unpack_bitmap(compressed: np.ndarray) -> np.ndarray:
    """Packed uint8 occupancy -> flat uint8 0/1 (io_data._unpack parity)."""
    return np.unpackbits(compressed).astype(np.uint8)


def read_label(path: str) -> np.ndarray:
    return np.fromfile(path, dtype=np.uint16)


def read_invalid(path: str) -> np.ndarray:
    return unpack_bitmap(np.fromfile(path, dtype=np.uint8))


def majority_pool(grid: np.ndarray, k: int) -> np.ndarray:
    """Majority label pooling over k^3 blocks, vectorized.

    Mirrors the reference's semantics (semantic_kitti_preprocess.py:25-67):
    blocks that are >=95% empty/invalid become 0 (or 255 if invalid
    dominates empties); otherwise the most frequent of the real labels.
    """
    X, Y, Z = grid.shape
    b = grid.reshape(X // k, k, Y // k, k, Z // k, k)
    b = b.transpose(0, 2, 4, 1, 3, 5).reshape(X // k, Y // k, Z // k, k ** 3)

    n0 = (b == 0).sum(-1)
    n255 = (b == 255).sum(-1)
    emptyish = (n0 + n255) > 0.95 * k ** 3

    # counts of real labels (train ids 1..19; 0 and 255 masked from the vote)
    lab = np.where((b > 0) & (b < 255), b, 0).astype(np.int64)
    oh = (lab[..., None] == np.arange(1, 20)[None, None, None, None, :])
    counts = oh.sum(-2)  # [Xs, Ys, Zs, 19]
    winner = counts.argmax(-1) + 1
    has_label = counts.sum(-1) > 0

    out = np.where(emptyish, np.where(n0 >= n255, 0, 255),
                   np.where(has_label, winner, 0))
    return out.astype(np.uint8)


def process_frame(label_path: str, invalid_path: str, out_base: str):
    remap = learning_map_array()
    label = read_label(label_path)
    label = remap[np.clip(label.astype(np.int64), 0, 259)]
    invalid = read_invalid(invalid_path)[:label.size]
    label = np.where(invalid == 1, 255, label).reshape(GRID).astype(np.uint8)
    np.save(f"{out_base}_1_1.npy", label)
    for k, tag in ((2, "1_2"), (4, "1_4"), (8, "1_8"), (16, "1_16")):
        np.save(f"{out_base}_{tag}.npy", majority_pool(label, k))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kitti-root", required=True)
    p.add_argument("--out-root", required=True)
    args = p.parse_args()
    seqs = sorted(glob.glob(os.path.join(
        args.kitti_root, "dataset", "sequences", "*")))
    for seq_dir in seqs:
        seq = os.path.basename(seq_dir)
        out_dir = os.path.join(args.out_root, seq)
        os.makedirs(out_dir, exist_ok=True)
        for lab in sorted(glob.glob(os.path.join(seq_dir, "voxels",
                                                 "*.label"))):
            frame = os.path.basename(lab).split(".")[0]
            inv = lab.replace(".label", ".invalid")
            process_frame(lab, inv, os.path.join(out_dir, frame))
        print(f"sequence {seq} done")


if __name__ == "__main__":
    main()
