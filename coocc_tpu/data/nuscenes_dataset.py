"""nuScenes occupancy dataset: infos pkl -> model-ready fixed-shape batches.

Capability parity with CustomNuScenesOccLSSDataset + its pipeline
(reference: datasets/nuscenes_lss_dataset.py:9-207 get_data_info packing,
pipeline order coocc_multi_r50_256x704.py:191-223: load points (+10 sweeps),
load/aug images, LiDAR->depth maps, occupancy GT). TPU adaptation: every
sample is padded to static shapes (points capacity, fixed cams) so jit
compiles once; the loader is a simple prefetching generator (one host feeds
one chip per the reference's samples_per_gpu=1).
"""
from __future__ import annotations

import os
import pickle
from typing import Callable, Dict, Iterable, Optional, Tuple

import numpy as np

from ..config.base import CoOccConfig
from .pipelines.image_loading import load_multi_view_images
from .pipelines.lidar2depth import create_depth_maps
from .pipelines.load_occupancy import (
    bda_matrix, load_surroundocc_gt, sample_bda,
)

DEFAULT_BDA = dict(rot_lim=(0, 0), scale_lim=(1, 1), flip_dx_ratio=0,
                   flip_dy_ratio=0, flip_dz_ratio=0)


def load_points_with_sweeps(info: Dict, sweeps_num: int = 10,
                            rng: Optional[np.random.RandomState] = None,
                            test_mode: bool = False) -> np.ndarray:
    """Keyframe + up to `sweeps_num` motion-compensated sweeps, 5-dim
    (x, y, z, intensity, dt). Reference: mmdet3d LoadPointsFromFile +
    LoadPointsFromMultiSweeps(sweeps_num=10), loading.py:99-220."""
    pts = np.fromfile(info["lidar_path"], dtype=np.float32).reshape(-1, 5)
    pts[:, 4] = 0.0
    clouds = [pts]
    sweeps = info.get("sweeps", [])
    if len(sweeps) > 0:
        if len(sweeps) <= sweeps_num or test_mode:
            choices = np.arange(min(len(sweeps), sweeps_num))
        else:
            rng = rng or np.random
            choices = rng.choice(len(sweeps), sweeps_num, replace=False)
        ts = info["timestamp"] / 1e6
        for i in choices:
            sw = sweeps[i]
            p = np.fromfile(sw["data_path"], dtype=np.float32).reshape(-1, 5)
            p[:, 4] = 0.0
            r = np.asarray(sw["sensor2lidar_rotation"])
            t = np.asarray(sw["sensor2lidar_translation"])
            p[:, :3] = p[:, :3] @ r.T + t
            p[:, 4] = ts - sw["timestamp"] / 1e6
            clouds.append(p)
    return np.concatenate(clouds, axis=0)


def pad_points(points: np.ndarray, capacity: int):
    P = points.shape[0]
    if P >= capacity:
        return points[:capacity], np.ones(capacity, bool)
    out = np.zeros((capacity, points.shape[1]), np.float32)
    out[:P] = points
    mask = np.zeros(capacity, bool)
    mask[:P] = True
    return out, mask


class NuScenesOccDataset:
    """Reads nuscenes_infos_temporal_{train,val}.pkl and produces samples."""

    def __init__(self, cfg: CoOccConfig, data_root: str, ann_file: str,
                 occ_path: str, is_train: bool,
                 bda_aug_conf: Optional[Dict] = None):
        self.cfg = cfg
        self.data_root = data_root
        self.occ_path = occ_path
        self.is_train = is_train
        self.bda_aug_conf = bda_aug_conf or DEFAULT_BDA
        with open(ann_file, "rb") as f:
            data = pickle.load(f)
        infos = data["infos"] if isinstance(data, dict) else data
        self.infos = sorted(infos, key=lambda x: x["timestamp"])

    def __len__(self):
        return len(self.infos)

    def get_sample(self, idx: int,
                   rng: Optional[np.random.RandomState] = None) -> Dict:
        cfg = self.cfg
        info = self.infos[idx]
        rng = rng or np.random.RandomState()
        out: Dict = {}

        # --- camera infos
        cam_infos = {}
        for cam_name, cam in info["cams"].items():
            lidar2cam = cam.get("lidar2cam")
            if lidar2cam is None:
                # build from sensor2lidar rotation/translation if present
                r = np.asarray(cam["sensor2lidar_rotation"])
                t = np.asarray(cam["sensor2lidar_translation"])
                s2l = np.eye(4)
                s2l[:3, :3] = r
                s2l[:3, 3] = t
                lidar2cam = np.linalg.inv(s2l)
            cam_infos[cam_name] = dict(
                data_path=os.path.join(self.data_root, cam["data_path"])
                if not os.path.isabs(cam["data_path"]) else cam["data_path"],
                cam_intrinsic=cam["cam_intrinsic"],
                lidar2cam=lidar2cam,
            )

        if cfg.use_camera:
            imgs = load_multi_view_images(cam_infos, cfg.data, self.is_train,
                                          rng)
            out.update(imgs)

        # --- LiDAR points (+ sweeps)
        points = load_points_with_sweeps(info, rng=rng,
                                         test_mode=not self.is_train)
        if cfg.use_camera:
            H, W = cfg.data.input_size
            raw = np.fromfile(info["lidar_path"],
                              dtype=np.float32).reshape(-1, 5)[:, :3]
            out["gt_depths"] = create_depth_maps(
                raw, out["rots"], out["trans"], out["intrins"],
                out["post_rots"], out["post_trans"], H, W)

        # --- BDA + occupancy GT
        if self.is_train:
            bda = bda_matrix(*sample_bda(self.bda_aug_conf, rng))
        else:
            bda = np.eye(3, dtype=np.float32)
        out["bda"] = bda
        points[:, :3] = points[:, :3] @ bda.T

        token = os.path.basename(info["lidar_path"])
        occ_file = os.path.join(self.occ_path, "samples", f"{token}.npy")
        if os.path.exists(occ_file):
            out["gt_occ"] = load_surroundocc_gt(occ_file, cfg.occ_size)
        else:
            out["gt_occ"] = np.zeros(cfg.occ_size, np.int64)

        if cfg.use_lidar:
            cap = cfg.pts.max_points
            out["points"], out["points_mask"] = pad_points(
                points.astype(np.float32), cap)
        return out


def collate(samples, cfg: CoOccConfig):
    """Stack host samples into a Batch of numpy arrays."""
    from ..models.coocc_ray import Batch
    keys = set()
    for s in samples:
        keys.update(s.keys())
    kw = {}
    for k in keys:
        kw[k] = np.stack([s[k] for s in samples])
    if "gt_occ" in kw:
        kw["gt_occ"] = kw["gt_occ"].astype(np.int32)
    return Batch(**kw)


def build_loaders(cfg: CoOccConfig, data_root: str, ann_file: str,
                  val_ann_file: str, occ_path: str, batch_size: int = 1,
                  seed: int = 0):
    """Returns (train_iter_fn, val_iter_fn, steps_per_epoch)."""
    train_ds = NuScenesOccDataset(cfg, data_root, ann_file, occ_path,
                                  is_train=True)
    val_ds = NuScenesOccDataset(cfg, data_root, val_ann_file, occ_path,
                                is_train=False)
    steps = len(train_ds) // batch_size

    def train_iter():
        rng = np.random.RandomState(seed)
        order = rng.permutation(len(train_ds))
        for i in range(0, len(order) - batch_size + 1, batch_size):
            samples = [train_ds.get_sample(order[i + j], rng)
                       for j in range(batch_size)]
            yield collate(samples, cfg)

    def val_iter():
        for i in range(0, len(val_ds) - batch_size + 1, batch_size):
            samples = [val_ds.get_sample(i + j) for j in range(batch_size)]
            yield collate(samples, cfg)

    return train_iter, val_iter, steps
