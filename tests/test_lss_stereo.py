"""Stereo LSS variant: shapes, finiteness, and warp geometry sanity."""
import numpy as np
import jax
import jax.numpy as jnp

from coocc_tpu.nn.lss_stereo import (LSSBEVStereo, depth_sampling_k_list,
                                     homo_warp)


def test_k_list_symmetric():
    k = depth_sampling_k_list(3, 3)
    assert k.shape == (3,)
    np.testing.assert_allclose(k[1], 0.0, atol=1e-6)
    np.testing.assert_allclose(k[0], -k[2], atol=1e-5)


def test_homo_warp_identity(rng):
    """Identity rig + equal intrinsics must resample the feature onto
    itself (pixel centers line up for any hypothesis depth)."""
    H, W, C = 6, 8, 4
    feat = rng.randn(H, W, C).astype(np.float32)
    intrin = np.array([[50.0, 0, W * 4 / 2], [0, 50.0, H * 4 / 2],
                       [0, 0, 1]], np.float32)
    depth = np.full((2, H, W), 10.0, np.float32)
    out = homo_warp(jnp.asarray(feat), jnp.asarray(depth),
                    jnp.asarray(intrin), jnp.asarray(intrin),
                    jnp.eye(3), jnp.zeros(3), stereo_downsample=4)
    assert out.shape == (2, H, W, C)
    np.testing.assert_allclose(np.asarray(out[0]), feat, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out[1]), feat, atol=1e-3)


def test_stereo_module_forward(rng):
    BN, fH, fW, C = 2, 4, 6, 32
    sH, sW, Cs = 16, 24, 16
    D = 16
    mod = LSSBEVStereo(mid_channels=16, context_channels=8,
                       depth_channels=D, dbound=(2.0, 10.0, 0.5),
                       range_list=((2, 4), (4, 6), (6, 8), (8, 10)),
                       em_iteration=1, num_groups=4)
    key_feat = jnp.asarray(rng.randn(BN, fH, fW, C).astype(np.float32))
    key_st = jnp.asarray(rng.randn(BN, sH, sW, Cs).astype(np.float32))
    swp_st = jnp.asarray(rng.randn(BN, sH, sW, Cs).astype(np.float32))
    mlp_in = jnp.asarray(rng.randn(BN, 27).astype(np.float32))
    intrin = jnp.broadcast_to(
        jnp.asarray([[50.0, 0, 48], [0, 50.0, 32], [0, 0, 1.0]]),
        (BN, 3, 3))
    rot = jnp.broadcast_to(jnp.eye(3), (BN, 3, 3))
    tran = jnp.zeros((BN, 3))
    variables = mod.init(jax.random.PRNGKey(0), key_feat, swp_st, key_st,
                         mlp_in, intrin, intrin, rot, tran, train=False)
    ctx, depth = mod.apply(variables, key_feat, swp_st, key_st, mlp_in,
                           intrin, intrin, rot, tran, train=False)
    assert ctx.shape == (BN, fH, fW, 8)
    assert depth.shape == (BN, fH, fW, D)
    assert bool(jnp.isfinite(depth).all())
    np.testing.assert_allclose(np.asarray(depth.sum(-1)), 1.0, atol=1e-4)
