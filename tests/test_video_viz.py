"""Video visualization workflow tests (reference visualize_nusc_video.py
+ prepare_video_infos.py semantics on synthetic predictions)."""
import os
import pickle
import subprocess
import sys

import numpy as np

from coocc_tpu.evaluation.savers import save_output_nuscenes
from coocc_tpu.evaluation.video import (make_all_scene_videos,
                                        make_scene_video, render_frame)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _dump_scene(root, scene, n, rng, with_gt=True):
    for i in range(n):
        pred = rng.randint(0, 17, (20, 20, 8)).astype(np.int64)
        save_output_nuscenes(
            pred, root, f"tok_{i:03d}",
            gt_voxels=pred if with_gt else None, scene_name=scene)


def test_render_frame_and_video(tmp_path):
    rng = np.random.RandomState(0)
    _dump_scene(str(tmp_path), "scene-0001", 4, rng)
    _dump_scene(str(tmp_path), "scene-0002", 3, rng, with_gt=False)

    f = render_frame(str(tmp_path / "scene-0001" / "tok_000.npz"),
                     upscale=1)
    assert f.dtype == np.uint8 and f.shape == (20, 40, 3)  # pred|gt
    f2 = render_frame(str(tmp_path / "scene-0002" / "tok_000.npz"),
                      upscale=2)
    assert f2.shape == (40, 40, 3)                          # pred only, x2

    out = make_scene_video(str(tmp_path / "scene-0001"),
                           str(tmp_path / "v.mp4"), fps=5)
    assert os.path.exists(out) and os.path.getsize(out) > 0

    outs = make_all_scene_videos(str(tmp_path), str(tmp_path / "videos"))
    assert len(outs) == 2
    assert all(os.path.getsize(o) > 0 for o in outs)


def test_prepare_video_infos(tmp_path):
    infos = []
    for scene in ("scene-b", "scene-a"):
        base_ts = 1000 if scene == "scene-a" else 5000
        for i in range(3):
            infos.append({
                "token": f"{scene}_t{i}",
                "scene_name": scene,
                "timestamp": base_ts + 100 * i,
                "lidar_path": f"{scene}_{i}.bin",
                "sweeps": [
                    {"data_path": f"{scene}_{i}_sw{j}.bin",
                     "timestamp": base_ts + 100 * i + 30 * (j + 1),
                     "sensor2lidar_rotation": np.eye(3),
                     "sensor2lidar_translation": np.zeros(3)}
                    for j in range(2)],
            })
    src = tmp_path / "infos.pkl"
    dst = tmp_path / "video_infos.pkl"
    with open(src, "wb") as f:
        pickle.dump({"infos": infos, "metadata": {"version": "test"}}, f)

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/prepare_video_infos.py"),
         str(src), str(dst), "--insert-sweeps"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    with open(dst, "rb") as f:
        out = pickle.load(f)
    scenes = out["scenes"]
    assert set(scenes) == {"scene-a", "scene-b"}
    for name, seq in scenes.items():
        ts = [x["timestamp"] for x in seq]
        assert ts == sorted(ts)
        # 3 keyframes + 2 gaps x 2 sweeps each = 7 frames; sweeps after the
        # last keyframe fall outside any gap and are dropped
        assert len(seq) == 7
        assert sum(x.get("is_sweep", False) for x in seq) == 4
        assert all(x["scene_name"] == name for x in seq)
