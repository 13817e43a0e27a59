"""BEVDet-style alt loading pipelines vs torch transcription oracles.

Covers the last §2.2/§2.7 inventory row (reference loading_bevdet.py,
multi_view.py). Oracles are direct torch/numpy transcriptions of the
reference functions (the golden_refs pattern), run at tiny shapes.
"""
from __future__ import annotations

import colorsys

import numpy as np
import pytest
from PIL import Image

from coocc_tpu.config.base import DataConfig
from coocc_tpu.data.pipelines.loading_bevdet import (
    _bgr2hsv, _hsv2bgr, bev_transform, choose_cams, depth_transform,
    get_ray_direction_with_intrinsics, load_annotations_bevdepth,
    load_multi_view_images_bevdet, mmlab_normalize, multi_view_pipeline,
    photometric_distortion, quat_to_rot, rotation_translation_to_pose,
    sensor2ego_transformation, sensor2lidar_transformation,
)


def _torch_depth_transform(cam_depth, resize, resize_dims, crop, flip,
                           rotate):
    """Transcription of reference loading_bevdet.py:31-76."""
    import torch
    cam_depth = np.array(cam_depth, np.float32, copy=True)
    H, W = resize_dims
    cam_depth[:, :2] = cam_depth[:, :2] * resize
    cam_depth[:, 0] -= crop[0]
    cam_depth[:, 1] -= crop[1]
    if flip:
        cam_depth[:, 0] = resize_dims[1] - cam_depth[:, 0]
    cam_depth[:, 0] -= W / 2.0
    cam_depth[:, 1] -= H / 2.0
    h = rotate / 180 * np.pi
    rot_matrix = [[np.cos(h), np.sin(h)], [-np.sin(h), np.cos(h)]]
    cam_depth[:, :2] = np.matmul(rot_matrix, cam_depth[:, :2].T).T
    cam_depth[:, 0] += W / 2.0
    cam_depth[:, 1] += H / 2.0
    depth_coords = cam_depth[:, :2].astype(np.int16)
    depth_map = np.zeros(resize_dims)
    valid_mask = ((depth_coords[:, 1] < resize_dims[0])
                  & (depth_coords[:, 0] < resize_dims[1])
                  & (depth_coords[:, 1] >= 0)
                  & (depth_coords[:, 0] >= 0))
    depth_map[depth_coords[valid_mask, 1],
              depth_coords[valid_mask, 0]] = cam_depth[valid_mask, 2]
    return torch.Tensor(depth_map).numpy()


@pytest.mark.parametrize("flip,rotate", [(False, 0.0), (True, 5.4),
                                         (False, -3.2)])
def test_depth_transform_matches_reference(flip, rotate):
    rng = np.random.RandomState(0)
    pts = np.stack([rng.uniform(0, 200, 500), rng.uniform(0, 120, 500),
                    rng.uniform(1, 60, 500)], 1).astype(np.float32)
    resize, crop = 0.48, (6, 10, 70, 42)
    ours = depth_transform(pts, resize, (32, 64), crop, flip, rotate)
    ref = _torch_depth_transform(pts, resize, (32, 64), crop, flip, rotate)
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    assert ours.shape == (32, 64)


def test_mmlab_normalize_quirk_and_values():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (8, 10, 3)).astype(np.uint8)
    out = mmlab_normalize(img)
    # to_rgb=True on an RGB input = channel swap then (x - mean) / std
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    expect = (img[..., ::-1].astype(np.float32) - mean) / std
    np.testing.assert_allclose(out, expect, atol=1e-5)
    # custom cfg without swap
    cfg = {"mean": [0.0, 0.0, 0.0], "std": [255.0, 255.0, 255.0],
           "to_rgb": False}
    out2 = mmlab_normalize(img, cfg)
    np.testing.assert_allclose(out2, img.astype(np.float32) / 255.0,
                               atol=1e-6)


def test_hsv_roundtrip_against_colorsys():
    rng = np.random.RandomState(2)
    bgr = rng.uniform(0, 255, (5, 7, 3)).astype(np.float32)
    hsv = _bgr2hsv(bgr)
    # spot-check against colorsys (H in turns -> degrees, V unscaled)
    for y, x in [(0, 0), (2, 3), (4, 6)]:
        b, g, r = (float(v) for v in bgr[y, x])
        hh, ss, vv = colorsys.rgb_to_hsv(r, g, b)
        assert hsv[y, x, 0] == pytest.approx(hh * 360.0, abs=1e-3)
        assert hsv[y, x, 1] == pytest.approx(ss, abs=1e-5)
        assert hsv[y, x, 2] == pytest.approx(vv, abs=1e-4)
    back = _hsv2bgr(hsv)
    np.testing.assert_allclose(back, bgr, atol=1e-3)


def test_photometric_distortion_is_valid_image():
    rng = np.random.RandomState(3)
    img = Image.fromarray(rng.randint(0, 256, (16, 24, 3)).astype(np.uint8))
    for seed in range(4):
        out = photometric_distortion(img, np.random.RandomState(seed))
        arr = np.asarray(out)
        assert arr.shape == (16, 24, 3) and arr.dtype == np.uint8
    # identity-ish path: a seed where no op fires leaves the image within
    # HSV round-trip error of the original
    class NoOpRng:
        def randint(self, n):
            return 0

        def uniform(self, *a):
            return a[0] if a else 0.0

        def permutation(self, n):
            return np.arange(n)
    out = photometric_distortion(img, NoOpRng())
    assert np.abs(np.asarray(out).astype(int)
                  - np.asarray(img).astype(int)).max() <= 1


def _rand_quat(rng):
    q = rng.randn(4)
    return q / np.linalg.norm(q)


def test_quat_to_rot_properties():
    rng = np.random.RandomState(4)
    for _ in range(5):
        q = _rand_quat(rng)
        R = quat_to_rot(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-10)
    # identity quaternion
    np.testing.assert_allclose(quat_to_rot([1, 0, 0, 0]), np.eye(3),
                               atol=1e-12)


def _cam_entry(rng):
    return {
        "sensor2ego_rotation": _rand_quat(rng),
        "sensor2ego_translation": rng.randn(3),
        "ego2global_rotation": _rand_quat(rng),
        "ego2global_translation": rng.randn(3),
    }


def test_sensor2ego_chain_consistency():
    rng = np.random.RandomState(5)
    sweep = {"cams": {"CAM_A": _cam_entry(rng)}}
    key = {"cams": {"CAM_A": _cam_entry(rng)}}
    s2keyego, key2sweep = sensor2ego_transformation(sweep, key, "CAM_A")
    # key2sweep is defined as the inverse of keysensor->sweepsensor's chain:
    # composing sweepsensor->keyego with keyego->keysensor then key2sweep
    # must return to the sweep sensor frame (identity)
    keysensor2keyego = rotation_translation_to_pose(
        key["cams"]["CAM_A"]["sensor2ego_rotation"],
        key["cams"]["CAM_A"]["sensor2ego_translation"])
    chain = key2sweep @ np.linalg.inv(keysensor2keyego) @ s2keyego
    np.testing.assert_allclose(chain, np.eye(4), atol=1e-9)
    # same-frame case: sweep == key -> sweepsensor2keyego == sensor2ego
    s2e, k2s = sensor2ego_transformation(key, key, "CAM_A")
    np.testing.assert_allclose(s2e, keysensor2keyego, atol=1e-9)
    np.testing.assert_allclose(k2s, np.eye(4), atol=1e-9)


def test_sensor2lidar_identity_case():
    rng = np.random.RandomState(6)
    cam = _cam_entry(rng)
    info = {"cams": {"CAM_A": cam}}
    # when lidar ego == cam ego and lidar2ego == identity, the chain
    # collapses to sensor2ego
    sample = {
        "ego2global_rotation": cam["ego2global_rotation"],
        "ego2global_translation": cam["ego2global_translation"],
        "lidar2ego_rotation": [1, 0, 0, 0],
        "lidar2ego_translation": [0, 0, 0],
    }
    got = sensor2lidar_transformation(info, "CAM_A", sample)
    expect = rotation_translation_to_pose(cam["sensor2ego_rotation"],
                                          cam["sensor2ego_translation"])
    np.testing.assert_allclose(got, expect, atol=1e-9)


def test_bev_transform_matches_reference_composition():
    import torch
    for angle, scale, fdx, fdy in [(0, 1, False, False), (30, 1.1, True,
                                                          False),
                                   (-15, 0.9, True, True)]:
        ours = bev_transform(angle, scale, fdx, fdy)
        # reference transcription (loading_bevdet.py:379-393)
        ra = torch.tensor(angle / 180 * np.pi)
        rs, rc = torch.sin(ra), torch.cos(ra)
        rot = torch.Tensor([[rc, -rs, 0], [rs, rc, 0], [0, 0, 1]])
        sc = torch.Tensor([[scale, 0, 0], [0, scale, 0], [0, 0, scale]])
        fl = torch.eye(3)
        if fdx:
            fl = fl @ torch.Tensor([[-1, 0, 0], [0, 1, 0], [0, 0, 1]])
        if fdy:
            fl = fl @ torch.Tensor([[1, 0, 0], [0, -1, 0], [0, 0, 1]])
        ref = (fl @ (sc @ rot)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_load_annotations_bevdepth():
    rng = np.random.RandomState(7)
    pts = rng.randn(100, 5).astype(np.float32)
    conf = {"rot_lim": (-22.5, 22.5), "scale_lim": (0.95, 1.05),
            "flip_dx_ratio": 0.5, "flip_dy_ratio": 0.5}
    out = load_annotations_bevdepth({"points": pts}, conf, is_train=True,
                                    rng=np.random.RandomState(8))
    assert out["bda"].shape == (3, 3)
    # xyz rotated by bda, features untouched
    np.testing.assert_allclose(out["points"][:, :3],
                               pts[:, :3] @ out["bda"].T, atol=1e-5)
    np.testing.assert_allclose(out["points"][:, 3:], pts[:, 3:])
    # eval: identity bda
    out_e = load_annotations_bevdepth({"points": pts}, conf, is_train=False)
    np.testing.assert_allclose(out_e["bda"], np.eye(3), atol=0)


def _synthetic_cam_infos(rng, n=2, H=48, W=96):
    infos = {}
    for i in range(n):
        intrin = np.array([[W * 0.6, 0, W / 2], [0, W * 0.6, H / 2],
                           [0, 0, 1]], np.float32)
        l2c = np.eye(4)
        l2c[:3, :3] = quat_to_rot(_rand_quat(rng))
        l2c[:3, 3] = rng.randn(3)
        infos[f"CAM_{i}"] = {
            "data_path": rng.randint(0, 256, (H, W, 3)).astype(np.uint8),
            "cam_intrinsic": intrin,
            "lidar2cam": l2c,
            "sensor2ego_rotation": _rand_quat(rng),
            "sensor2ego_translation": rng.randn(3),
            "ego2global_rotation": _rand_quat(rng),
            "ego2global_translation": rng.randn(3),
        }
    return infos


def test_load_multi_view_images_bevdet_shapes_and_depth():
    rng = np.random.RandomState(9)
    infos = _synthetic_cam_infos(rng)
    cfg = DataConfig(cams=("CAM_0", "CAM_1"), input_size=(32, 64),
                     src_size=(48, 96))
    dp = {"CAM_0": np.array([[10.0, 20.0, 7.5], [50.0, 30.0, 12.0]],
                            np.float32)}
    out = load_multi_view_images_bevdet(infos, cfg, is_train=False,
                                        rng=rng, depth_points=dp)
    assert out["imgs"].shape == (2, 32, 64, 3)
    assert out["gt_depths"].shape == (2, 32, 64)
    assert out["sensor2sensors"].shape == (2, 4, 4)
    assert out["canvas"].dtype == np.uint8
    # cam without depth points -> all-zero map; cam with -> some nonzero
    assert out["gt_depths"][1].max() == 0.0
    # normalized imgs are zero-mean-ish, NOT [0,1]-scaled
    assert out["imgs"].min() < -0.5 and out["imgs"].max() > 0.5
    # sensor2sensors is the lidar2cam inverse
    np.testing.assert_allclose(
        out["sensor2sensors"][0],
        np.linalg.inv(infos["CAM_0"]["lidar2cam"]).astype(np.float32),
        atol=1e-5)


def test_choose_cams_subsets_only_in_train():
    cfg = DataConfig(cams=("CAM_0", "CAM_1", "CAM_2"))
    assert choose_cams(cfg, False, 2) == ["CAM_0", "CAM_1", "CAM_2"]
    got = choose_cams(cfg, True, 2, np.random.RandomState(0))
    assert len(got) == 2 and set(got) <= {"CAM_0", "CAM_1", "CAM_2"}


def test_multi_view_pipeline_rays():
    rng = np.random.RandomState(10)
    infos = _synthetic_cam_infos(rng, n=1)
    cfg = DataConfig(cams=("CAM_0",), input_size=(16, 24),
                     src_size=(48, 96))
    out = multi_view_pipeline(infos, cfg, is_train=False, rng=rng)
    assert out["raydirs"].shape == (1, 16, 24, 3)
    assert out["lightpos"].shape == (1, 16, 24, 3)
    assert out["c2ws"].shape == (1, 4, 4)
    # every ray origin equals the c2w translation
    np.testing.assert_allclose(out["lightpos"][0, 3, 5],
                               out["c2ws"][0][:3, 3], atol=1e-6)
    # center-pixel camera-frame direction is (~0, ~0, -1) rotated to world
    cam = infos["CAM_0"]
    c2w = rotation_translation_to_pose(
        cam["sensor2ego_rotation"],
        cam["sensor2ego_translation"])
    c2w = rotation_translation_to_pose(
        cam["ego2global_rotation"],
        cam["ego2global_translation"]) @ c2w
    dirs = get_ray_direction_with_intrinsics(16, 24,
                                             cam["cam_intrinsic"])
    expect = dirs @ c2w[:3, :3].T
    np.testing.assert_allclose(out["raydirs"][0], expect, atol=1e-4)
