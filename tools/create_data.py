#!/usr/bin/env python
"""Dataset info generation (nuScenes infos pkl).

Capability parity with the reference tools/create_data.py:52-120 +
data_converter/nuscenes_converter_new.py: walks the nuScenes tables and
writes nuscenes_infos_temporal_{train,val}.pkl with per-sample lidar path,
sweeps (with sensor2lidar transforms + timestamps), per-camera intrinsics,
poses and lidar2cam matrices — the exact surface
coocc_tpu.data.nuscenes_dataset.get_sample consumes.

Requires the `nuscenes-devkit` package and a raw nuScenes tree; both are
absent in the build sandbox, so this tool is exercised against real data
only. The output schema is documented here and consumed/validated by
tests/test_data_pipeline.py with a synthetic pkl.
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAMS = ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
        "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT"]


def quaternion_rotation(q):
    """[w, x, y, z] quaternion -> 3x3 rotation matrix."""
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def transform_matrix(translation, rotation_q, inverse=False):
    tm = np.eye(4)
    rot = quaternion_rotation(rotation_q)
    if inverse:
        tm[:3, :3] = rot.T
        tm[:3, 3] = -rot.T @ np.asarray(translation)
    else:
        tm[:3, :3] = rot
        tm[:3, 3] = translation
    return tm


def build_nuscenes_infos(data_root: str, version: str, max_sweeps: int = 10):
    from nuscenes.nuscenes import NuScenes  # external, runtime-only

    nusc = NuScenes(version=version, dataroot=data_root, verbose=True)
    from nuscenes.utils import splits
    if "mini" in version:
        train_scenes, val_scenes = splits.mini_train, splits.mini_val
    else:
        train_scenes, val_scenes = splits.train, splits.val

    train_infos, val_infos = [], []
    for sample in nusc.sample:
        scene = nusc.get("scene", sample["scene_token"])["name"]
        lidar_token = sample["data"]["LIDAR_TOP"]
        sd = nusc.get("sample_data", lidar_token)
        cs = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
        pose = nusc.get("ego_pose", sd["ego_pose_token"])

        l2e = transform_matrix(cs["translation"], cs["rotation"])
        e2g = transform_matrix(pose["translation"], pose["rotation"])

        # lidarseg per-point labels (present in v1.0-trainval + lidarseg ext)
        lidarseg_path = None
        try:
            lidarseg_path = nusc.get("lidarseg", lidar_token)["filename"]
        except Exception:
            pass

        info = {
            "token": sample["token"],
            "scene_token": sample["scene_token"],
            "scene_name": scene,
            "lidar_token": lidar_token,
            "lidarseg": lidarseg_path,
            "lidar_path": os.path.join(data_root, sd["filename"]),
            "timestamp": sample["timestamp"],
            "lidar2ego_translation": cs["translation"],
            "lidar2ego_rotation": cs["rotation"],
            "ego2global_translation": pose["translation"],
            "ego2global_rotation": pose["rotation"],
            "sweeps": [],
            "cams": {},
        }

        # previous sweeps with sensor2lidar transforms
        sweep_sd = sd
        for _ in range(max_sweeps):
            if sweep_sd["prev"] == "":
                break
            sweep_sd = nusc.get("sample_data", sweep_sd["prev"])
            scs = nusc.get("calibrated_sensor",
                           sweep_sd["calibrated_sensor_token"])
            spose = nusc.get("ego_pose", sweep_sd["ego_pose_token"])
            s_l2e = transform_matrix(scs["translation"], scs["rotation"])
            s_e2g = transform_matrix(spose["translation"], spose["rotation"])
            # sweep lidar -> keyframe lidar
            s2l = np.linalg.inv(l2e) @ np.linalg.inv(e2g) @ s_e2g @ s_l2e
            info["sweeps"].append({
                "data_path": os.path.join(data_root, sweep_sd["filename"]),
                "timestamp": sweep_sd["timestamp"],
                "sensor2lidar_rotation": s2l[:3, :3],
                "sensor2lidar_translation": s2l[:3, 3],
            })

        for cam in CAMS:
            cam_sd = nusc.get("sample_data", sample["data"][cam])
            ccs = nusc.get("calibrated_sensor",
                           cam_sd["calibrated_sensor_token"])
            cpose = nusc.get("ego_pose", cam_sd["ego_pose_token"])
            c2e = transform_matrix(ccs["translation"], ccs["rotation"])
            ce2g = transform_matrix(cpose["translation"], cpose["rotation"])
            cam2lidar = np.linalg.inv(l2e) @ np.linalg.inv(e2g) @ ce2g @ c2e
            info["cams"][cam] = {
                "data_path": os.path.join(data_root, cam_sd["filename"]),
                "cam_intrinsic": np.asarray(ccs["camera_intrinsic"]),
                "lidar2cam": np.linalg.inv(cam2lidar),
                "sensor2lidar_rotation": cam2lidar[:3, :3],
                "sensor2lidar_translation": cam2lidar[:3, 3],
                "sensor2ego_translation": ccs["translation"],
                "sensor2ego_rotation": ccs["rotation"],
                "ego2global_translation": cpose["translation"],
                "ego2global_rotation": cpose["rotation"],
            }

        (train_infos if scene in train_scenes else val_infos).append(info)
    return train_infos, val_infos


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", default="data/nuscenes")
    p.add_argument("--version", default="v1.0-trainval")
    p.add_argument("--out-dir", default="data")
    p.add_argument("--max-sweeps", type=int, default=10)
    args = p.parse_args()

    train, val = build_nuscenes_infos(args.data_root, args.version,
                                      args.max_sweeps)
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir,
                           "nuscenes_infos_temporal_train.pkl"), "wb") as f:
        pickle.dump({"infos": train, "metadata": {"version": args.version}}, f)
    with open(os.path.join(args.out_dir,
                           "nuscenes_infos_temporal_val.pkl"), "wb") as f:
        pickle.dump({"infos": val, "metadata": {"version": args.version}}, f)
    print(f"wrote {len(train)} train / {len(val)} val infos")


if __name__ == "__main__":
    main()
