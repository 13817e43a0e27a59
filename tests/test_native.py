"""Native C++ host kernels vs numpy fallbacks."""
import numpy as np

from coocc_tpu.utils import native


def test_native_lib_builds():
    assert native._load() is not None, "libcoocc_host.so failed to build"


def test_zbuffer_parity(rng):
    uvd = np.stack([
        rng.uniform(-2, 12, 500), rng.uniform(-2, 9, 500),
        rng.uniform(-1, 10, 500)], axis=1).astype(np.float32)
    got = native.zbuffer_depth(uvd, 8, 10)
    # oracle: min positive depth per rounded pixel
    ref = np.zeros((8, 10), np.float32)
    for u, v, d in uvd:
        if d <= 0 or u < 0 or v < 0 or u > 9 or v > 7:
            continue
        ui, vi = int(u + 0.5), int(v + 0.5)
        if ref[vi, ui] == 0 or d < ref[vi, ui]:
            ref[vi, ui] = d
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_majority_vote_parity(rng):
    coords = rng.randint(0, 4, (300, 3)).astype(np.int64)
    labels = rng.randint(1, 6, 300).astype(np.int64)
    got = native.majority_vote(coords, labels, (4, 4, 4))
    # oracle
    from collections import Counter
    ref = np.zeros((4, 4, 4), np.int64)
    buckets = {}
    for (x, y, z), l in zip(coords, labels):
        buckets.setdefault((x, y, z), []).append(l)
    for k, ls in buckets.items():
        c = Counter(ls)
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        ref[k] = best
    np.testing.assert_array_equal(got, ref)


def test_voxelize_mean_matches_oracle(rng):
    pts = rng.uniform(-5, 5, (400, 5)).astype(np.float32)
    ids, feats, n = native.voxelize_mean(
        pts, (-4, -4, -2, 4, 4, 2), (1, 1, 1), (8, 8, 4),
        max_points=10, max_voxels=64)
    from coocc_tpu.ops.voxelize import voxelize_oracle
    ids_ref, feats_ref = voxelize_oracle(
        pts, (-4, -4, -2, 4, 4, 2), (1, 1, 1), (8, 8, 4), 64, 10)
    order = np.argsort(ids[:n])
    np.testing.assert_array_equal(np.sort(ids[:n]), ids_ref)
    np.testing.assert_allclose(feats[:n][order], feats_ref, rtol=1e-5,
                               atol=1e-5)
