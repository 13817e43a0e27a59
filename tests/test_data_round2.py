"""Round-2 data-layer coverage: OpenOccupancy GT, visible masks, lidarseg
points, camera-free lidar geometry, and the prefetching loader."""
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from coocc_tpu.data.loader import PrefetchIterator, shard_indices
from coocc_tpu.data.nuscenes_dataset import NuScenesOccDataset
from coocc_tpu.data.pipelines.load_occupancy import (
    load_openoccupancy_gt, majority_vote_densify, visible_mask_lidar,
)
from coocc_tpu.data.synthetic import camera_ring, tiny_config


def test_openoccupancy_gt(tmp_path):
    grid = (8, 8, 4)
    pc_range = (-4.0, -4.0, -2.0, 4.0, 4.0, 2.0)
    d = tmp_path / "scene_s1" / "occupancy"
    os.makedirs(d)
    # rows are [z, y, x, cls]
    pcd = np.array([
        [0, 1, 2, 5],
        [3, 7, 6, 9],
        [1, 1, 1, 0],   # class 0 -> 255 ignore
    ])
    np.save(d / "tokA.npy", pcd)
    dense = load_openoccupancy_gt(str(tmp_path), "s1", "tokA", grid,
                                  pc_range, np.eye(3))
    assert dense.shape == grid
    assert dense[2, 1, 0] == 5
    assert dense[6, 7, 3] == 9
    assert dense[1, 1, 1] == 255
    assert (dense == 0).sum() == 8 * 8 * 4 - 3

    # x-flip BDA moves voxel x -> grid-1-x (centers are symmetric)
    flip = np.diag([-1.0, 1.0, 1.0]).astype(np.float32)
    dense_f = load_openoccupancy_gt(str(tmp_path), "s1", "tokA", grid,
                                    pc_range, flip)
    assert dense_f[8 - 1 - 2, 1, 0] == 5


def test_majority_vote_tiebreak():
    coords = np.array([[0, 0, 0], [0, 0, 0], [0, 0, 0], [1, 0, 0]])
    labels = np.array([3, 3, 7, 2])
    out = majority_vote_densify(coords, labels, (2, 1, 1))
    assert out[0, 0, 0] == 3  # majority
    assert out[1, 0, 0] == 2


def test_visible_mask_lidar():
    pc_range = (-4.0, -4.0, -2.0, 4.0, 4.0, 2.0)
    pts = np.array([[0.5, 0.5, 0.5], [100.0, 0, 0], [-3.9, -3.9, -1.9]])
    m = visible_mask_lidar(pts, pc_range, (8, 8, 4))
    assert m[4, 4, 2] == 1      # (0.5+4)/1 = 4.5 -> 4
    assert m[0, 0, 0] == 1
    assert m.sum() == 2         # out-of-range point ignored


@pytest.fixture(scope="module")
def fake_nuscenes_r2(tmp_path_factory):
    """Synthetic tree with lidarseg labels + openoccupancy scene layout."""
    root = tmp_path_factory.mktemp("nusc2")
    rng = np.random.RandomState(0)
    cams = ["CAM_A", "CAM_B"]
    rots, trans = camera_ring(2, rng)
    infos = []
    os.makedirs(root / "occ" / "samples", exist_ok=True)
    for i in range(4):
        lidar_name = f"sweep_{i}.pcd.bin"
        pts = rng.uniform(-9, 9, (1500, 5)).astype(np.float32)
        pts[:, 2] *= 0.2
        pts.tofile(root / lidar_name)
        # lidarseg labels (raw 0..31, mapped by learning_map)
        seg = rng.randint(0, 32, 1500).astype(np.uint8)
        seg_path = f"lidarseg_{i}.bin"
        seg.tofile(root / seg_path)
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
        occ = np.stack([
            rng.randint(0, 40, 50), rng.randint(0, 40, 50),
            rng.randint(0, 8, 50), rng.randint(1, 17, 50)], axis=1)
        np.save(root / "occ" / "samples" / f"{lidar_name}.npy", occ)
        # openoccupancy layout: scene_{tok}/occupancy/{lidar_token}.npy
        sd = root / "occ2" / f"scene_sc{i}" / "occupancy"
        os.makedirs(sd)
        pcd = np.stack([
            rng.randint(0, 8, 60), rng.randint(0, 40, 60),
            rng.randint(0, 40, 60), rng.randint(0, 17, 60)], axis=1)
        np.save(sd / f"lt{i}.npy", pcd)
        infos.append({
            "token": f"tok{i}",
            "scene_token": f"sc{i}",
            "lidar_token": f"lt{i}",
            "lidarseg": seg_path,
            "lidar_path": str(root / lidar_name),
            "timestamp": 1_000_000 * i,
            "sweeps": [],
            "cams": cam_infos,
        })
    ann = root / "infos_train.pkl"
    with open(ann, "wb") as f:
        pickle.dump({"infos": infos}, f)
    return root, ann


def test_lidarseg_points_loaded(fake_nuscenes_r2):
    root, ann = fake_nuscenes_r2
    cfg = tiny_config()
    ds = NuScenesOccDataset(cfg, str(root), str(ann), str(root / "occ"),
                            is_train=False)
    s = ds.get_sample(0)
    assert "points_occ" in s
    assert s["points_occ"].shape == (cfg.points_occ_capacity, 4)
    m = s["points_occ_mask"]
    assert m.sum() == 1500
    labels = s["points_occ"][m, 3]
    assert labels.min() >= 0 and labels.max() < cfg.num_classes


def test_openoccupancy_dataset_wiring(fake_nuscenes_r2):
    root, ann = fake_nuscenes_r2
    cfg = tiny_config().replace(gt_format="openoccupancy")
    ds = NuScenesOccDataset(cfg, str(root), str(ann), str(root / "occ2"),
                            is_train=False, cal_visible=True)
    s = ds.get_sample(1)
    assert s["gt_occ"].shape == tuple(cfg.occ_size)
    assert (s["gt_occ"] == 255).any() or (s["gt_occ"] > 0).any()
    assert "visible_mask" in s
    assert s["visible_mask"].shape == tuple(cfg.occ_size)
    assert s["visible_mask"].sum() > 0  # lidar points mark voxels visible


def test_camera_free_lidar_geometry(fake_nuscenes_r2):
    root, ann = fake_nuscenes_r2
    import dataclasses
    cfg = tiny_config(use_camera=False)
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, src_size=(90, 160)))
    ds = NuScenesOccDataset(cfg, str(root), str(ann), str(root / "occ"),
                            is_train=False)
    s = ds.get_sample(0)
    assert "imgs" not in s
    N = cfg.data.num_cams
    H, W = cfg.data.input_size
    assert s["rots"].shape == (N, 3, 3)
    assert s["gt_depths"].shape == (N, H, W)
    assert (s["gt_depths"] > 0).any()


def test_prefetch_iterator_order_and_errors():
    made = []

    def make(i):
        made.append(i)
        return i * 10

    it = PrefetchIterator(make, list(range(7)), num_workers=3, prefetch=2)
    assert list(it) == [i * 10 for i in range(7)]

    def bad(i):
        if i == 3:
            raise ValueError("boom")
        return i

    it = PrefetchIterator(bad, list(range(5)), num_workers=2, prefetch=2)
    with pytest.raises(ValueError):
        list(it)


def test_shard_indices_disjoint():
    a = shard_indices(10, epoch=1, shuffle=True, seed=7, process_index=0,
                      process_count=2)
    b = shard_indices(10, epoch=1, shuffle=True, seed=7, process_index=1,
                      process_count=2)
    assert len(a) == len(b) == 5
    assert set(a) & set(b) == set()
    # same epoch+seed -> same permutation on every host
    c = shard_indices(10, epoch=2, shuffle=True, seed=7, process_index=0,
                      process_count=2)
    assert not np.array_equal(a, c)


def test_occupancy_hists_visible_mask(rng):
    import jax.numpy as jnp
    from coocc_tpu.evaluation.ssc_metrics import occupancy_hists
    B, X, Y, Z, C = 1, 4, 4, 2, 5
    logits = jnp.asarray(rng.randn(B, X, Y, Z, C).astype(np.float32))
    gt = rng.randint(0, C, (B, X, Y, Z)).astype(np.int32)
    vis = (rng.rand(B, X, Y, Z) > 0.5).astype(np.uint8)
    sc_all, ssc_all = occupancy_hists(logits, jnp.asarray(gt), C)
    sc_v, ssc_v = occupancy_hists(logits, jnp.asarray(gt), C,
                                  extra_mask=jnp.asarray(vis))
    assert int(np.asarray(ssc_v).sum()) == int(vis.sum())
    assert int(np.asarray(ssc_all).sum()) == B * X * Y * Z
    assert (np.asarray(ssc_v) <= np.asarray(ssc_all)).all()
