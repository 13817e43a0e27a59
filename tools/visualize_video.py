#!/usr/bin/env python
"""Per-scene occupancy demo videos from saved predictions.

Counterpart of the reference's visualize/visualize_nusc_video.py CLI:

    # 1) eval with per-scene dumps:
    python tools/test.py coocc_multi_r50_256x704 --save-dir preds/ \
        --save-by-scene
    # 2) render videos:
    python tools/visualize_video.py preds/ videos/ [--scene-name scene-0103]

Each subfolder of pred_dir becomes <save_dir>/<scene>_demo.mp4 (10 fps,
BEV pred|gt side-by-side; GIF fallback when no mp4 codec).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("pred_dir", help="dir of per-scene npz prediction folders")
    p.add_argument("save_dir", help="output dir for videos")
    p.add_argument("--scene-name", default=None,
                   help="render only this scene")
    p.add_argument("--fps", type=int, default=10)
    args = p.parse_args()

    from coocc_tpu.evaluation.video import make_all_scene_videos

    outs = make_all_scene_videos(args.pred_dir, args.save_dir,
                                 fps=args.fps, scene_name=args.scene_name)
    for o in outs:
        print(f"wrote {o}")


if __name__ == "__main__":
    main()
