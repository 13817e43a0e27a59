"""Host data pipeline driven end-to-end with a synthetic nuScenes tree."""
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from coocc_tpu.data.nuscenes_dataset import NuScenesOccDataset, collate
from coocc_tpu.data.pipelines.lidar2depth import create_depth_maps
from coocc_tpu.data.synthetic import camera_ring, tiny_config


@pytest.fixture(scope="module")
def fake_nuscenes(tmp_path_factory):
    root = tmp_path_factory.mktemp("nusc")
    rng = np.random.RandomState(0)
    cams = ["CAM_A", "CAM_B"]
    rots, trans = camera_ring(2, rng)
    infos = []
    os.makedirs(root / "occ" / "samples", exist_ok=True)
    for i in range(3):
        lidar_name = f"sweep_{i}.pcd.bin"
        pts = rng.uniform(-9, 9, (2000, 5)).astype(np.float32)
        pts[:, 2] *= 0.2
        pts.tofile(root / lidar_name)
        cam_infos = {}
        for c in range(2):
            img_path = root / f"img_{i}_{c}.jpg"
            Image.fromarray(
                (rng.rand(90, 160, 3) * 255).astype(np.uint8)).save(img_path)
            intr = np.array([[100.0, 0, 80], [0, 100.0, 45], [0, 0, 1]])
            s2l = np.eye(4)
            s2l[:3, :3] = rots[c]
            s2l[:3, 3] = trans[c]
            cam_infos[cams[c]] = {
                "data_path": str(img_path),
                "cam_intrinsic": intr,
                "lidar2cam": np.linalg.inv(s2l),
            }
        # sparse occupancy gt
        occ = np.stack([
            rng.randint(0, 40, 50), rng.randint(0, 40, 50),
            rng.randint(0, 8, 50), rng.randint(1, 17, 50)], axis=1)
        np.save(root / "occ" / "samples" / f"{lidar_name}.npy", occ)
        infos.append({
            "token": f"tok{i}",
            "lidar_path": str(root / lidar_name),
            "timestamp": 1_000_000 * i,
            "sweeps": [],
            "cams": cam_infos,
        })
    ann = root / "infos_train.pkl"
    with open(ann, "wb") as f:
        pickle.dump({"infos": infos}, f)
    return root, ann


def test_dataset_sample_shapes(fake_nuscenes):
    root, ann = fake_nuscenes
    cfg = tiny_config()
    # match the synthetic tree: 2 cams, input 64x192 -> from 90x160 src
    ds = NuScenesOccDataset(cfg, str(root), str(ann),
                            str(root / "occ"), is_train=True)
    assert len(ds) == 3
    s = ds.get_sample(0, np.random.RandomState(0))
    N = cfg.data.num_cams
    H, W = cfg.data.input_size
    assert s["imgs"].shape == (N, H, W, 3)
    assert s["imgs"].max() <= 1.0
    assert s["rots"].shape == (N, 3, 3)
    assert s["gt_depths"].shape == (N, H, W)
    assert s["gt_occ"].shape == tuple(cfg.occ_size)
    assert s["points"].shape == (cfg.pts.max_points, 5)
    assert s["points_mask"].sum() > 0
    # occupancy classes present
    assert (s["gt_occ"] > 0).any()

    batch = collate([s, ds.get_sample(1)], cfg)
    assert batch.imgs.shape == (2, N, H, W, 3)
    assert batch.gt_occ.dtype == np.int32


def test_depth_maps_consistency(rng):
    """A point projected to a pixel must appear with its camera depth."""
    rots, trans = camera_ring(1, rng)
    intr = np.array([[[100.0, 0, 50], [0, 100.0, 30], [0, 0, 1]]])
    post_rots = np.eye(3)[None]
    post_trans = np.zeros((1, 3))
    # point straight ahead of cam 0 (fwd = +x), 5 m out
    pts = np.array([[5.5, 0.0, 0.0]])
    depth = create_depth_maps(pts, rots, trans, intr, post_rots, post_trans,
                              60, 100)
    nz = np.argwhere(depth[0] > 0)
    assert len(nz) == 1
    v, u = nz[0]
    assert abs(u - 50) <= 1 and abs(v - 30) <= 1
    assert abs(depth[0, v, u] - 5.0) < 1e-4
