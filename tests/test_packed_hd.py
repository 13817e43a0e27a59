"""PackedEncoderHD vs SparseEncoderHD (gather-GEMM) equivalence.

The packed twin consumes the variables initialized by the GATHER module
(same scope tree by construction), so equivalence here certifies both
numerics and checkpoint compatibility in one shot. Shapes exercise the
HD quirks: odd z chain (9 -> 5 -> 3 -> 1), the z-padding-0 third
downsample, and a padded final pack.

Capacity note: the gather path TRUNCATES each downsample's dilated
active set at `capacity` (downsample_sites out_capacity); the packed
twin is dense and keeps every active site — the reference spconv
semantics. Equivalence therefore requires a capacity large enough that
no truncation occurs (1024 here); at truncating capacities the packed
output is a superset, not a mismatch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coocc_tpu.nn.sparse_enc_packed_hd import (
    PackedEncoderHD, _dilate_packed_weight_z, _strided_packed_weight_z,
)
from coocc_tpu.nn.sparse_encoder_hd import SparseEncoderHD
from coocc_tpu.ops.sparse_conv import SparseTensor
from coocc_tpu.ops.voxelize import voxelize

GRID = (16, 16, 9)
PC_RANGE = (-4.0, -4.0, -1.0, 4.0, 4.0, 3.5)
VOX = (0.5, 0.5, 0.5)
CHANNELS = ((4, 4, 8), (8, 8, 16), (16, 16, 32), (32, 32))


def _mods():
    kw = dict(in_channels=4, base_channels=4, output_channels=32,
              sparse_shape_xyz=GRID, encoder_channels=CHANNELS,
              capacity=1024)
    return SparseEncoderHD(**kw), PackedEncoderHD(**kw)


def _sparse_input(seed=0, n=300, B=1):
    rng = np.random.RandomState(seed)
    pts = np.stack([
        rng.uniform(PC_RANGE[0], PC_RANGE[3], (B, n)),
        rng.uniform(PC_RANGE[1], PC_RANGE[4], (B, n)),
        rng.uniform(PC_RANGE[2], PC_RANGE[5], (B, n)),
        rng.rand(B, n),
    ], -1).astype(np.float32)
    mask = rng.rand(B, n) < 0.9

    def vox_one(p, m):
        return voxelize(p, m, PC_RANGE, VOX, GRID, max_voxels=256,
                        max_points_per_voxel=4, num_features=4)

    v = jax.vmap(vox_one)(jnp.asarray(pts), jnp.asarray(mask))
    return SparseTensor(ids=v.ids, features=v.features, mask=v.mask)


def test_strided_weight_z_pad1_matches_existing():
    from coocc_tpu.nn.sparse_enc_packed import (
        _dilate_packed_weight, _strided_packed_weight)
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.standard_normal((27, 3, 5)).astype("f4"))
    for p_in in (2, 4, 8):
        np.testing.assert_allclose(
            _strided_packed_weight_z(w, p_in, p_in // 2, 1),
            _strided_packed_weight(w, p_in, p_in // 2), atol=0)
        np.testing.assert_allclose(
            _dilate_packed_weight_z(p_in, p_in // 2, 1, jnp.float32),
            _dilate_packed_weight(p_in, p_in // 2, jnp.float32), atol=0)


def test_packed_hd_matches_gather_eval():
    gather, packed = _mods()
    sp = _sparse_input()
    v = gather.init(jax.random.PRNGKey(0), sp, train=False)
    ref = gather.apply(v, sp, train=False)
    got = packed.apply(v, sp, train=False)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_packed_hd_matches_gather_empty():
    gather, packed = _mods()
    sp = _sparse_input()
    sp = SparseTensor(ids=sp.ids, features=sp.features,
                      mask=jnp.zeros_like(sp.mask))
    v = gather.init(jax.random.PRNGKey(0), sp, train=False)
    ref = gather.apply(v, sp, train=False)
    got = packed.apply(v, sp, train=False)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_packed_hd_batch2_matches_unbatched():
    gather, packed = _mods()
    sp2 = _sparse_input(seed=3, B=2)
    v = gather.init(jax.random.PRNGKey(0), sp2, train=False)
    got2 = packed.apply(v, sp2, train=False)
    for b in range(2):
        sp1 = SparseTensor(ids=sp2.ids[b:b + 1],
                           features=sp2.features[b:b + 1],
                           mask=sp2.mask[b:b + 1])
        got1 = packed.apply(v, sp1, train=False)
        np.testing.assert_allclose(np.asarray(got2[b]),
                                   np.asarray(got1[0]), atol=1e-5)


def test_packed_hd_train_stats_match_gather():
    gather, packed = _mods()
    sp = _sparse_input(seed=5)
    v = gather.init(jax.random.PRNGKey(0), sp, train=True)
    ref, ref_st = gather.apply(v, sp, train=True,
                               mutable=["batch_stats"])
    got, got_st = packed.apply(v, sp, train=True,
                               mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(ref_st)[0],
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_flatten_with_path(got_st)[0],
                   key=lambda kv: str(kv[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4,
                                   rtol=5e-3, err_msg=str(pa))

