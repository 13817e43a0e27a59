import jax.numpy as jnp
import numpy as np

from coocc_tpu.ops.voxelize import voxelize, voxelize_oracle


def _run(points, max_voxels=64, cap=10, grid=(8, 8, 4)):
    pcr = (-4.0, -4.0, -2.0, 4.0, 4.0, 2.0)
    vs = (1.0, 1.0, 1.0)
    P = points.shape[0]
    pad = 100
    pts = np.zeros((P + pad, points.shape[1]), np.float32)
    pts[:P] = points
    mask = np.zeros(P + pad, bool)
    mask[:P] = True
    out = voxelize(
        jnp.asarray(pts), jnp.asarray(mask), pcr, vs, grid,
        max_voxels=max_voxels, max_points_per_voxel=cap,
        exact_overflow=True,
    )
    ids_ref, feats_ref = voxelize_oracle(
        points, pcr, vs, grid, max_voxels=max_voxels, max_points_per_voxel=cap
    )
    got_mask = np.asarray(out.mask)
    got_ids = np.asarray(out.ids)[got_mask]
    got_feats = np.asarray(out.features)[got_mask]
    return got_ids, got_feats, ids_ref, feats_ref


def test_voxelize_matches_oracle(rng):
    pts = rng.uniform(-5, 5, size=(500, 5)).astype(np.float32)
    ids, feats, ids_ref, feats_ref = _run(pts)
    np.testing.assert_array_equal(ids, ids_ref)
    np.testing.assert_allclose(feats, feats_ref, rtol=1e-5, atol=1e-5)


def test_voxelize_point_cap(rng):
    # 30 points all in one voxel: only first 10 (original order) contribute
    pts = np.zeros((30, 5), np.float32)
    pts[:, :3] = 0.25
    pts[:, 3] = np.arange(30)
    ids, feats, ids_ref, feats_ref = _run(pts)
    assert len(ids) == 1
    np.testing.assert_allclose(feats[0, 3], np.mean(np.arange(10)), atol=1e-5)
    np.testing.assert_allclose(feats, feats_ref, atol=1e-5)


def test_voxelize_out_of_range_dropped(rng):
    pts = np.array([[100.0, 0, 0, 1, 1], [0.5, 0.5, 0.5, 2, 2]], np.float32)
    ids, feats, ids_ref, feats_ref = _run(pts)
    assert len(ids) == 1
    np.testing.assert_array_equal(ids, ids_ref)


def test_voxelize_num_features_slice(rng):
    pts = rng.uniform(-3, 3, size=(50, 5)).astype(np.float32)
    pcr = (-4.0, -4.0, -2.0, 4.0, 4.0, 2.0)
    out = voxelize(
        jnp.asarray(pts), jnp.ones(50, bool), pcr, (1.0, 1.0, 1.0), (8, 8, 4),
        max_voxels=64, num_features=4,
    )
    assert out.features.shape[1] == 4


def test_voxelize_fast_path_no_overflow(rng):
    """exact_overflow=False is identical when voxels fit in the cap."""
    pts = rng.uniform(-3.5, 3.5, size=(300, 5)).astype(np.float32)
    pcr = (-4.0, -4.0, -2.0, 4.0, 4.0, 2.0)
    kw = dict(point_cloud_range=pcr, voxel_size=(1.0, 1.0, 1.0),
              grid_size=(8, 8, 4), max_voxels=256, max_points_per_voxel=10)
    a = voxelize(jnp.asarray(pts), jnp.ones(300, bool), **kw,
                 exact_overflow=True)
    b = voxelize(jnp.asarray(pts), jnp.ones(300, bool), **kw,
                 exact_overflow=False)
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
    np.testing.assert_allclose(np.asarray(a.features),
                               np.asarray(b.features), rtol=1e-6)


def test_voxelize_mask_matches_voxelize(rng):
    """voxelize_mask == dense scatter of voxelize().ids (with and without
    cap overflow)."""
    from coocc_tpu.ops.voxelize import voxelize_mask

    pts = rng.uniform(-3.9, 3.9, size=(400, 5)).astype(np.float32)
    pcr = (-4.0, -4.0, -2.0, 4.0, 4.0, 2.0)
    grid = (8, 8, 4)
    n_cells = 8 * 8 * 4
    mask = np.ones(400, bool)
    mask[350:] = False
    for cap in (256, 40):  # no-overflow and overflow
        out = voxelize(jnp.asarray(pts), jnp.asarray(mask), pcr,
                       (1.0, 1.0, 1.0), grid, max_voxels=cap)
        ref = np.zeros(n_cells, bool)
        ref[np.asarray(out.ids)[np.asarray(out.mask)]] = True
        got = voxelize_mask(jnp.asarray(pts), jnp.asarray(mask), pcr,
                            (1.0, 1.0, 1.0), grid, max_voxels=cap)
        np.testing.assert_array_equal(np.asarray(got).reshape(-1), ref)


def test_voxelize_mask_matmul_rank_path(rng):
    """Grid with num_cells % 1024 == 0 exercises the MXU prefix-sum path."""
    from coocc_tpu.ops.voxelize import voxelize_mask

    pts = rng.uniform(-7.9, 7.9, size=(3000, 5)).astype(np.float32)
    pcr = (-8.0, -8.0, -2.0, 8.0, 8.0, 2.0)
    grid = (16, 16, 4)  # 1024 cells
    mask = np.ones(3000, bool)
    for cap in (2048, 100):
        out = voxelize(jnp.asarray(pts), jnp.asarray(mask), pcr,
                       (1.0, 1.0, 1.0), grid, max_voxels=cap)
        ref = np.zeros(1024, bool)
        ref[np.asarray(out.ids)[np.asarray(out.mask)]] = True
        got = voxelize_mask(jnp.asarray(pts), jnp.asarray(mask), pcr,
                            (1.0, 1.0, 1.0), grid, max_voxels=cap)
        np.testing.assert_array_equal(np.asarray(got).reshape(-1), ref)


def test_voxelize_mask_rank_selection_multirow(rng):
    """Multi-lane-row grids exercise the boundary-row rank selection: caps
    crossing inside row 0, inside a later row, exactly at a row edge,
    exactly at the total, and above the total must all match the dense
    reference rule (keep the max_voxels smallest occupied ids)."""
    from coocc_tpu.ops.voxelize import voxelize_mask

    pts = rng.uniform(-15.9, 15.9, size=(9000, 5)).astype(np.float32)
    pcr = (-16.0, -16.0, -2.0, 16.0, 16.0, 2.0)
    grid = (32, 32, 4)  # 4096 cells = 4 lane-rows
    mask = np.ones(9000, bool)

    # reference coords in float32, matching the op's arithmetic (float64
    # here would bin boundary points into different cells)
    coords = np.floor((pts[:, :3] - np.array(pcr[:3], np.float32)) /
                      np.float32(1.0)).astype(int)
    inb = ((coords >= 0) & (coords < np.array([32, 32, 4]))).all(1)
    coords = coords[inb]
    ids = (coords[:, 0] * 32 + coords[:, 1]) * 4 + coords[:, 2]
    occ_ids = np.unique(ids)
    total = len(occ_ids)
    row0 = int((occ_ids < 1024).sum())

    for cap in (row0 // 2,            # boundary inside row 0
                row0,                 # exactly at a row-population edge
                row0 + 37,            # inside row 1
                total,                # exact fit -> keep all
                total + 100):         # above total -> keep all
        ref = np.zeros(4096, bool)
        ref[occ_ids[:cap]] = True
        got = voxelize_mask(jnp.asarray(pts), jnp.asarray(mask), pcr,
                            (1.0, 1.0, 1.0), grid, max_voxels=cap)
        np.testing.assert_array_equal(np.asarray(got).reshape(-1), ref,
                                      err_msg=f"cap={cap}")
