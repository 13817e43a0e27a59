#!/usr/bin/env python
"""Rearrange an infos pkl into per-scene temporal sequences for video demos.

Counterpart of the reference's tools/prepare_video_infos.py: group the val
infos by scene, sort by timestamp, and (optionally) densify each keyframe
gap with the intermediate lidar sweeps already recorded in
info["sweeps"] so rendered videos play smoothly (reference
arrange_according_to_scene + insert_sweeps, prepare_video_infos.py:13-69).
Unlike the reference this needs no live nuScenes devkit: create_data
already stamped scene_token/scene_name on every info (tools/create_data.py
:82-85).

Usage:
    python tools/prepare_video_infos.py data/nuscenes_infos_temporal_val.pkl \
        data/nuscenes_infos_video.pkl [--insert-sweeps]
"""
from __future__ import annotations

import argparse
import copy
import pickle
from collections import defaultdict


def arrange_by_scene(infos):
    scenes = defaultdict(list)
    for info in infos:
        scenes[info.get("scene_name", info.get("scene_token", "scene"))]\
            .append(info)
    for name in scenes:
        scenes[name].sort(key=lambda x: x["timestamp"])
    return dict(scenes)


def insert_sweeps(scenes):
    """Between consecutive keyframes, add pseudo-infos for each recorded
    sweep whose timestamp falls inside the gap. Sweeps carry the keyframe's
    cameras/calibration (the reference interpolates poses from the sweep
    records; sweep entries here already hold sensor2lidar transforms)."""
    out = {}
    for name, seq in scenes.items():
        dense = []
        for idx, info in enumerate(seq):
            dense.append(info)
            if idx + 1 >= len(seq):
                continue
            start, end = info["timestamp"], seq[idx + 1]["timestamp"]
            mid = [s for s in info.get("sweeps", [])
                   if start < s.get("timestamp", 0) < end]
            mid.sort(key=lambda s: s["timestamp"])
            for s in mid:
                pseudo = copy.deepcopy(info)
                pseudo["lidar_path"] = s.get("data_path",
                                             info.get("lidar_path"))
                pseudo["timestamp"] = s["timestamp"]
                pseudo["is_sweep"] = True
                pseudo["sweep_sensor2lidar"] = {
                    k: s[k] for k in ("sensor2lidar_rotation",
                                      "sensor2lidar_translation")
                    if k in s}
                dense.append(pseudo)
        dense.sort(key=lambda x: x["timestamp"])
        out[name] = dense
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ann_file", help="input infos pkl")
    p.add_argument("out_file", help="output per-scene pkl")
    p.add_argument("--insert-sweeps", action="store_true",
                   help="densify keyframe gaps with recorded lidar sweeps")
    args = p.parse_args()

    with open(args.ann_file, "rb") as f:
        data = pickle.load(f)
    infos = data["infos"] if isinstance(data, dict) else data
    scenes = arrange_by_scene(infos)
    if args.insert_sweeps:
        scenes = insert_sweeps(scenes)
    n = sum(len(v) for v in scenes.values())
    with open(args.out_file, "wb") as f:
        pickle.dump({"scenes": scenes,
                     "metadata": (data.get("metadata")
                                  if isinstance(data, dict) else None)}, f)
    print(f"wrote {args.out_file}: {len(scenes)} scenes, {n} frames")


if __name__ == "__main__":
    main()
