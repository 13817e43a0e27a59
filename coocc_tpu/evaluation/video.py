"""Per-scene occupancy video rendering.

Capability parity with the reference's video workflow
(visualize/visualize_nusc_video.py:17-120 — walks per-scene prediction
folders, renders each sample, concatenates frames into a 10 fps video).
The reference composites mayavi 3D renders with the camera rig; here each
frame is the BEV panel render from evaluation/visualize.py (pred | gt),
written with cv2.VideoWriter like the reference (mp4v instead of MJPG)
with an animated-GIF fallback when no video codec is available.

Input layout matches evaluation/savers.save_output_nuscenes(scene_name=…):
  <pred_dir>/<scene_name>/<sample_token>.npz   (keys: pred [, gt])
sorted lexicographically within a scene — savers name files by sample
index so sort order is temporal order, mirroring the reference's
`sample_files.sort()` (visualize_nusc_video.py:76).
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from .visualize import NUSC_PALETTE, bev_image


def render_frame(npz_path: str, palette: np.ndarray = NUSC_PALETTE,
                 upscale: int = 3) -> np.ndarray:
    """One npz -> [H, W, 3] uint8 frame (pred | gt side-by-side)."""
    data = np.load(npz_path)
    panels = [bev_image(data["pred"], palette)]
    if "gt" in data:
        panels.append(bev_image(data["gt"], palette))
    # BEV images are [X, Y, 3]; display with +x right, +y up
    imgs = [np.transpose(p, (1, 0, 2))[::-1] for p in panels]
    frame = np.concatenate(imgs, axis=1).astype(np.uint8)
    if upscale > 1:
        frame = np.repeat(np.repeat(frame, upscale, 0), upscale, 1)
    return frame


def write_video(frames: List[np.ndarray], out_path: str,
                fps: int = 10) -> str:
    """Write frames to mp4 (cv2); fall back to GIF if cv2 is unusable."""
    assert frames, "no frames to write"
    h, w = frames[0].shape[:2]
    try:
        import cv2
        vw = cv2.VideoWriter(out_path,
                             cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        if not vw.isOpened():
            raise RuntimeError("cv2.VideoWriter failed to open")
        for f in frames:
            vw.write(f[:, :, ::-1])        # RGB -> BGR
        vw.release()
        return out_path
    except Exception:
        from PIL import Image
        gif = os.path.splitext(out_path)[0] + ".gif"
        ims = [Image.fromarray(f) for f in frames]
        ims[0].save(gif, save_all=True, append_images=ims[1:],
                    duration=int(1000 / fps), loop=0)
        return gif


def make_scene_video(scene_dir: str, out_path: Optional[str] = None,
                     fps: int = 10, palette: np.ndarray = NUSC_PALETTE,
                     upscale: int = 3) -> str:
    """Render every npz in one scene folder into a video; returns the
    written path (mp4, or gif on codec fallback)."""
    files = sorted(f for f in os.listdir(scene_dir) if f.endswith(".npz"))
    if not files:
        raise FileNotFoundError(f"no .npz predictions in {scene_dir}")
    frames = [render_frame(os.path.join(scene_dir, f), palette, upscale)
              for f in files]
    out_path = out_path or (scene_dir.rstrip("/") + "_demo.mp4")
    return write_video(frames, out_path, fps=fps)


def make_all_scene_videos(pred_dir: str, save_dir: str, fps: int = 10,
                          scene_name: Optional[str] = None) -> List[str]:
    """Reference main loop (visualize_nusc_video.py:56-120): every
    subfolder of pred_dir is a scene; write <scene>_demo.mp4 each."""
    os.makedirs(save_dir, exist_ok=True)
    # a scene folder is one that actually holds npz predictions (guards
    # against save_dir or asset folders nested under pred_dir)
    scenes = sorted(
        d for d in os.listdir(pred_dir)
        if os.path.isdir(os.path.join(pred_dir, d))
        and any(f.endswith(".npz")
                for f in os.listdir(os.path.join(pred_dir, d))))
    if scene_name is not None:
        assert scene_name in scenes, f"{scene_name} not under {pred_dir}"
        scenes = [scene_name]
    outs = []
    for s in scenes:
        outs.append(make_scene_video(
            os.path.join(pred_dir, s),
            os.path.join(save_dir, f"{s}_demo.mp4"), fps=fps))
    return outs
