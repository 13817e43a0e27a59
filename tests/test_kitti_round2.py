"""KITTI round-2 coverage: submission round-trip, data_type projection
branch, multi-scale GT preference in the losses."""
import os

import numpy as np
import jax.numpy as jnp

from coocc_tpu.evaluation.savers import (save_output_semantic_kitti,
                                         validate_semkitti_submission)


def test_kitti_submission_roundtrip(tmp_path, rng):
    pred = rng.randint(0, 20, (256, 256, 32))
    save_output_semantic_kitti(pred, str(tmp_path), "11", "000000")
    f = tmp_path / "sequences" / "11" / "predictions" / "000000.label"
    assert f.exists()
    assert validate_semkitti_submission(str(tmp_path))
    labels = np.fromfile(f, dtype=np.uint16)
    assert labels.size == 256 * 256 * 32
    # truncated file must fail validation
    labels[:100].tofile(tmp_path / "sequences" / "11" / "predictions"
                        / "000001.label")
    assert not validate_semkitti_submission(str(tmp_path))


def test_project_points_data_type_branch(rng):
    """'kitti' drops the BDA translation and uses homogeneous 3x4 intrinsics
    (reference utils/coordinate_transform.py:33-51)."""
    from coocc_tpu.nn.occ_head import project_points_on_img
    P, N = 50, 2
    pts = rng.rand(P, 3).astype(np.float32) * 10
    rots = np.stack([np.eye(3, dtype=np.float32)] * N)
    trans = rng.randn(N, 3).astype(np.float32)
    post_rots = np.stack([np.eye(3, dtype=np.float32)] * N)
    post_trans = np.zeros((N, 3), np.float32)

    intr4 = np.zeros((N, 3, 4), np.float32)
    intr4[:, :3, :3] = np.array([[100.0, 0, 50], [0, 100.0, 30], [0, 0, 1]])
    intr4[:, 0, 3] = 7.0  # baseline shift column
    bda4 = np.eye(4, dtype=np.float32)
    bda4[:3, 3] = 99.0  # translation must be DROPPED in the kitti branch

    uv_k, m_k = project_points_on_img(
        jnp.asarray(pts), jnp.asarray(rots), jnp.asarray(trans),
        jnp.asarray(intr4), jnp.asarray(post_rots), jnp.asarray(post_trans),
        jnp.asarray(bda4), pts_range=(0, -25.6, -2, 51.2, 25.6, 4.4),
        img_hw=(370, 1220), occ_whd=(256, 256, 32), data_type="kitti")
    assert np.isfinite(np.asarray(uv_k)).all()

    # identical geometry with the translation zeroed must give the same uv
    bda4z = np.eye(4, dtype=np.float32)
    uv_z, _ = project_points_on_img(
        jnp.asarray(pts), jnp.asarray(rots), jnp.asarray(trans),
        jnp.asarray(intr4), jnp.asarray(post_rots), jnp.asarray(post_trans),
        jnp.asarray(bda4z), pts_range=(0, -25.6, -2, 51.2, 25.6, 4.4),
        img_hw=(370, 1220), occ_whd=(256, 256, 32), data_type="kitti")
    np.testing.assert_allclose(np.asarray(uv_k), np.asarray(uv_z), atol=1e-5)


def test_gt_occ_2_preferred_over_mode_pool(rng):
    """When the batch carries preprocessed half-scale GT (KITTI 1_2 files),
    the coarse loss must consume it directly."""
    from coocc_tpu.data.synthetic import synthetic_batch, tiny_config
    from coocc_tpu.models.losses import compute_losses

    cfg = tiny_config(use_camera=False, use_lidar=True, cascade=False)
    batch = synthetic_batch(cfg, 1)
    X, Y, Z = (s // 2 for s in cfg.occ_size)
    Xc, Yc, Zc = cfg.lss_grid_size
    gt2 = rng.randint(0, cfg.num_classes, (1, Xc, Yc, Zc)).astype(np.int32)
    batch = batch._replace(gt_occ_2=jnp.asarray(gt2))
    outs = {
        "occ": jnp.asarray(
            rng.randn(1, Xc, Yc, Zc, cfg.num_classes).astype(np.float32)),
    }
    cfg_nonorm = cfg.replace(loss_norm=False)
    l_with = compute_losses(outs, batch, cfg_nonorm)
    l_without = compute_losses(outs, batch._replace(gt_occ_2=None),
                               cfg_nonorm)
    # different targets -> different CE values (mode pool vs preprocessed)
    assert float(l_with["loss_voxel_ce_c_0"]) != \
        float(l_without["loss_voxel_ce_c_0"])
