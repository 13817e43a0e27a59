"""Prediction savers: visualization dumps + benchmark submission writers.

Capability parity with the reference savers (coocc/apis/utils.py:18-134):
  * save_output_semantic_kitti: SemanticKITTI `.label` submission files
    (uint16 labels through the inverse learning map, sequences/XX/predictions)
  * save_output_nuscenes: per-sample npz dumps (pred/gt voxels) for offline
    visualization
  * save_output_nuscenes_lidarseg: lidarseg `.bin` submission (uint8 labels)
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from ..config.semantic_kitti import KITTI_LEARNING_MAP_INV


def save_output_semantic_kitti(pred_voxels: np.ndarray, out_dir: str,
                               sequence: str, frame_id: str):
    """pred_voxels: [X, Y, Z] int train-ids -> .label uint16 submission."""
    inv = np.zeros(max(KITTI_LEARNING_MAP_INV) + 1, np.uint16)
    for k, v in KITTI_LEARNING_MAP_INV.items():
        inv[k] = v
    labels = inv[pred_voxels.astype(np.int64).reshape(-1)]
    d = os.path.join(out_dir, "sequences", sequence, "predictions")
    os.makedirs(d, exist_ok=True)
    labels.astype(np.uint16).tofile(os.path.join(d, f"{frame_id}.label"))


def save_output_nuscenes(pred_voxels: np.ndarray, out_dir: str,
                         sample_token: str,
                         gt_voxels: Optional[np.ndarray] = None,
                         scene_name: Optional[str] = None):
    """Dump pred (and optionally GT) voxels as npz for visualization."""
    d = os.path.join(out_dir, scene_name) if scene_name else out_dir
    os.makedirs(d, exist_ok=True)
    arrays = {"pred": pred_voxels.astype(np.uint8)}
    if gt_voxels is not None:
        arrays["gt"] = gt_voxels.astype(np.uint8)
    np.savez_compressed(os.path.join(d, f"{sample_token}.npz"), **arrays)


def save_output_nuscenes_lidarseg(point_preds: np.ndarray, out_dir: str,
                                  lidar_token: str):
    """point_preds: [P] train-ids (1..16) -> official .bin uint8 submission."""
    d = os.path.join(out_dir, "lidarseg", "test")
    os.makedirs(d, exist_ok=True)
    point_preds.astype(np.uint8).tofile(
        os.path.join(d, f"{lidar_token}_lidarseg.bin"))


def validate_semkitti_submission(root: str) -> bool:
    """Official-format check (reference: tools/validate_semkitti_submission.py):
    every sequence 11..21 prediction must be uint16 .label with 262144 voxels."""
    ok = True
    for seq in [f"{i}" for i in range(11, 22)]:
        d = os.path.join(root, "sequences", seq, "predictions")
        if not os.path.isdir(d):
            continue
        for f in os.listdir(d):
            labels = np.fromfile(os.path.join(d, f), dtype=np.uint16)
            if labels.size != 256 * 256 * 32:
                ok = False
    return ok


def validate_lidarseg_submission(root: str, num_classes: int = 17) -> bool:
    """Official-format check (reference:
    projects/mmdet3d_plugin/tools/validate_lidarseg_submission.py): every
    lidarseg .bin must be non-empty uint8 with labels in [1, num_classes-1]
    (0 is the ignore/noise class and must not be predicted)."""
    d = os.path.join(root, "lidarseg", "test")
    if not os.path.isdir(d):
        return False
    ok = True
    n_files = 0
    for f in os.listdir(d):
        if not f.endswith("_lidarseg.bin"):
            continue
        n_files += 1
        labels = np.fromfile(os.path.join(d, f), dtype=np.uint8)
        if labels.size == 0 or labels.min() < 1 or labels.max() >= num_classes:
            ok = False
    # an empty directory is not a valid submission (the reference validator
    # checks presence per sample token)
    return ok and n_files > 0
