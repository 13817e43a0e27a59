"""PackedLiDAREnc8x must reproduce DenseLiDAREnc8x exactly (same params).

The packed encoder recomputes the dense twin's masked conv3d stack as
z-packed 2D convolutions; with identical parameter trees the outputs must
match to float tolerance, in eval and train mode (including the running
batch-stats updates)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coocc_tpu.nn.sparse_enc_dense import DenseLiDAREnc8x
from coocc_tpu.nn.sparse_enc_packed import PackedLiDAREnc8x

GRID = (32, 32, 8)


def _mk(rng, B=2, occupancy=0.05):
    mask = rng.rand(B, *GRID) < occupancy
    return jnp.asarray(mask)


def _encoders():
    kw = dict(input_channel=4, base_channel=16, out_channel=128,
              sparse_shape_xyz=GRID, capacity=64,
              compute_dtype=jnp.float32)
    return DenseLiDAREnc8x(**kw), PackedLiDAREnc8x(**kw)


def test_packed_matches_dense_eval():
    rng = np.random.RandomState(0)
    mask0 = _mk(rng)
    dense, packed = _encoders()
    vs = packed.init(jax.random.PRNGKey(1), mask0, train=False)
    # perturb params so the comparison is not trivially zero
    vs = jax.tree.map(
        lambda x: x + 0.05 * np.random.RandomState(2).standard_normal(
            x.shape).astype(x.dtype) if x.dtype == jnp.float32 else x, vs)
    out_d = dense.apply(vs, mask0, train=False)
    out_p = packed.apply(vs, mask0, train=False)
    assert out_p.shape == out_d.shape
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d),
                               rtol=2e-4, atol=2e-4)


def test_packed_matches_dense_train_stats():
    rng = np.random.RandomState(3)
    mask0 = _mk(rng)
    dense, packed = _encoders()
    vs = packed.init(jax.random.PRNGKey(4), mask0, train=True)
    out_d, upd_d = dense.apply(vs, mask0, train=True,
                               mutable=["batch_stats"])
    out_p, upd_p = packed.apply(vs, mask0, train=True,
                                mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d),
                               rtol=2e-4, atol=2e-4)
    flat_d = jax.tree_util.tree_leaves_with_path(upd_d["batch_stats"])
    flat_p = dict(jax.tree_util.tree_leaves_with_path(
        upd_p["batch_stats"]))
    assert len(flat_d) > 0
    for path, leaf_d in flat_d:
        leaf_p = flat_p[path]
        np.testing.assert_allclose(np.asarray(leaf_p), np.asarray(leaf_d),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=str(path))


def test_packed_empty_mask_finite():
    mask0 = jnp.zeros((1, *GRID), bool)
    _, packed = _encoders()
    vs = packed.init(jax.random.PRNGKey(0), mask0, train=False)
    out = packed.apply(vs, mask0, train=False)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert float(jnp.abs(out).max()) == 0.0


def test_ztap_matches_ext_eval():
    """The z-batch tap-fused res blocks must equal the packed ext-conv res
    blocks bit-for-tolerance with the same params (any ztap_levels)."""
    rng = np.random.RandomState(3)
    mask0 = _mk(rng, B=1, occupancy=0.1)
    kw = dict(input_channel=4, base_channel=16, out_channel=128,
              sparse_shape_xyz=GRID, capacity=64,
              compute_dtype=jnp.float32)
    ext = PackedLiDAREnc8x(**kw)
    ztap = PackedLiDAREnc8x(ztap_levels=(1, 2, 3), **kw)
    vs = ext.init(jax.random.PRNGKey(4), mask0, train=False)
    vs = jax.tree.map(
        lambda x: x + 0.05 * np.random.RandomState(5).standard_normal(
            x.shape).astype(x.dtype) if x.dtype == jnp.float32 else x, vs)
    out_e = ext.apply(vs, mask0, train=False)
    out_z = ztap.apply(vs, mask0, train=False)
    np.testing.assert_allclose(np.asarray(out_z), np.asarray(out_e),
                               atol=2e-4, rtol=2e-4)


def test_ztap_train_stats_match():
    rng = np.random.RandomState(6)
    mask0 = _mk(rng, B=1, occupancy=0.1)
    kw = dict(input_channel=4, base_channel=16, out_channel=128,
              sparse_shape_xyz=GRID, capacity=64,
              compute_dtype=jnp.float32)
    ext = PackedLiDAREnc8x(**kw)
    ztap = PackedLiDAREnc8x(ztap_levels=(1,), **kw)
    vs = ext.init(jax.random.PRNGKey(7), mask0, train=True)
    _, st_e = ext.apply(vs, mask0, train=True, mutable=["batch_stats"])
    _, st_z = ztap.apply(vs, mask0, train=True, mutable=["batch_stats"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-4),
        st_e, st_z)


def test_packed_strided_matches_lane_major(rng, monkeypatch):
    """The packed stride-2-z stem/downsample path must equal the legacy
    lane-major unrolled form bit-for-tolerance (same params)."""
    import jax
    import jax.numpy as jnp
    from coocc_tpu.nn.sparse_enc_packed import PackedLiDAREnc8x

    shape = (32, 32, 32)  # Z0=32 -> Z1=16, p1=4, bz=4, p_in=8 (packed path)
    mask = jnp.asarray(rng.rand(1, *shape) < 0.05)
    enc = PackedLiDAREnc8x(sparse_shape_xyz=shape, capacity=512)
    v = enc.init(jax.random.PRNGKey(0), mask, train=False)
    # at default init the stem collapse is exactly zero (gn_input bias=0);
    # randomize the params (not the BN running stats) so the strided convs
    # see real data
    leaves, tree = jax.tree.flatten(v["params"])
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    v = {**v, "params": jax.tree.unflatten(tree, [
        jax.random.normal(k, x.shape, jnp.float32) * 0.3
        for k, x in zip(keys, leaves)])}

    monkeypatch.setenv("COOCC_PACKED_STRIDED", "1")
    got = np.asarray(enc.apply(v, mask, train=False))
    monkeypatch.delenv("COOCC_PACKED_STRIDED")
    ref = np.asarray(enc.apply(v, mask, train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    assert np.abs(got).max() > 0


@pytest.mark.parametrize("p_in,p_out,Ci,Co", [
    (4, 2, 32, 64),   # r50 res1 -> res2
    (2, 1, 64, 128),  # r50 res2 -> res3
    (8, 4, 1, 32),    # packed stem (mask input)
])
def test_strided_packed_weight_equivalence(rng, p_in, p_out, Ci, Co):
    """Packed stride-2-z conv == lane-major unrolled strided conv."""
    import jax.numpy as jnp
    from coocc_tpu.nn.sparse_enc_packed import (_conv2d, _conv2d_pb,
                                                _lm_to_pb, _pb_to_lm,
                                                _shift_ext, _strided_weight,
                                                _strided_packed_weight)

    B, bz, X, Y = 1, 3, 8, 8
    Z_in = bz * p_in
    w27 = jnp.asarray(0.1 * rng.randn(27, Ci, Co).astype(np.float32))
    x_pb = jnp.asarray(rng.randn(B, bz, X, Y, p_in * Ci).astype(np.float32))

    got = _conv2d_pb(_shift_ext(x_pb, Ci),
                     _strided_packed_weight(w27, p_in, p_out), 2)

    x_lm = _pb_to_lm(x_pb, Ci)  # [B, X, Y, Z_in*Ci]
    ref_lm = _conv2d(x_lm, _strided_weight(w27, Z_in), 2)
    ref = _lm_to_pb(ref_lm, Z_in // 2, Co, p_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


