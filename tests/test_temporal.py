"""BEVDet4D temporal alignment oracles: identity and pure-translation."""
import jax
import jax.numpy as jnp
import numpy as np

from coocc_tpu.models.temporal import (TemporalBEVConcat,
                                       ego_motion_bev_matrix,
                                       shift_bev_feature)
from coocc_tpu.nn.flosp import flosp


def test_ego_motion_identity():
    r = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
    t = jnp.zeros((2, 3))
    m = ego_motion_bev_matrix(r, t, r, t)
    np.testing.assert_allclose(np.asarray(m),
                               np.broadcast_to(np.eye(3), (2, 3, 3)),
                               atol=1e-6)


def test_shift_identity(rng):
    feat = jnp.asarray(rng.randn(1, 8, 10, 4).astype(np.float32))
    m = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
    out = shift_bev_feature(feat, m, (0.5, 0.5), (-2.0, -2.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(feat), atol=1e-5)


def test_shift_pure_translation(rng):
    """Ego moved +2 cells in x: sampled source = x + 2 (zeros at the edge)."""
    X, Y = 8, 10
    dx = (0.5, 0.5)
    feat = jnp.asarray(rng.randn(1, X, Y, 3).astype(np.float32))
    m = jnp.asarray(np.array([[[1, 0, 2 * dx[0]], [0, 1, 0], [0, 0, 1]]],
                             np.float32))
    out = np.asarray(shift_bev_feature(feat, m, dx, (-2.0, -2.0)))
    np.testing.assert_allclose(out[0, :X - 2], np.asarray(feat)[0, 2:],
                               atol=1e-5)
    assert np.abs(out[0, X - 2:]).max() < 1e-6  # off-grid -> zeros


def test_temporal_concat_shapes(rng):
    curr = jnp.asarray(rng.randn(1, 6, 6, 2, 4).astype(np.float32))
    prev = jnp.asarray(rng.randn(1, 6, 6, 2, 4).astype(np.float32))
    rots = jnp.broadcast_to(jnp.eye(3), (1, 2, 3, 3))
    trans = jnp.zeros((1, 2, 3))
    mod = TemporalBEVConcat()
    v = mod.init(jax.random.PRNGKey(0), curr, prev, rots, trans, rots, trans,
                 (0.5, 0.5), (-1.5, -1.5))
    out = mod.apply(v, curr, prev, rots, trans, rots, trans,
                    (0.5, 0.5), (-1.5, -1.5))
    assert out.shape == (1, 6, 6, 2, 8)
    np.testing.assert_allclose(np.asarray(out[..., :4]), np.asarray(curr))
    np.testing.assert_allclose(np.asarray(out[..., 4:]), np.asarray(prev),
                               atol=1e-5)


def test_flosp_gather():
    H, W, C = 4, 5, 3
    x2d = jnp.asarray(np.arange(H * W * C, dtype=np.float32).reshape(H, W, C))
    pix = jnp.asarray([[0, 0], [4, 3], [9, 1], [2, 2]], jnp.int32)
    fov = jnp.asarray([True, True, True, False])
    out = np.asarray(flosp(x2d, pix, fov, (2, 2, 1)))
    flat = np.asarray(x2d).reshape(-1, C)
    np.testing.assert_array_equal(out.reshape(-1, C)[0], flat[0])
    np.testing.assert_array_equal(out.reshape(-1, C)[1], flat[3 * W + 4])
    assert (out.reshape(-1, C)[2] == 0).all()  # pix_x=9 off-image
    assert (out.reshape(-1, C)[3] == 0).all()  # fov-masked
