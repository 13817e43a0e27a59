"""z-batch-resident layout twins: identical params, identical outputs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coocc_tpu.nn.fpn3d import FPN3D
from coocc_tpu.nn.occ_head import OccHead
from coocc_tpu.nn.resnet3d import CustomResNet3D


def test_resnet3d_zb_matches(rng):
    x = jnp.asarray(rng.randn(2, 12, 12, 8, 16).astype(np.float32))
    enc = CustomResNet3D(depth=18, block_inplanes=(16, 32, 64, 128),
                         block_strides=(1, 2, 2, 2))
    v = enc.init(jax.random.PRNGKey(0), x, train=False)
    ref = enc.apply(v, x, train=False)
    got = enc.apply(v, x, train=False, zb=True)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)
    # zb_out returns [B, Z, X, Y, C]
    got_zb = enc.apply(v, x, train=False, zb=True, zb_out=True)
    for r, g in zip(ref, got_zb):
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(g, (0, 2, 3, 1, 4))), np.asarray(r),
            rtol=1e-5, atol=1e-5)


def test_fpn3d_zb_matches(rng):
    chans = (16, 32, 64, 128)
    mids, mids_zb = [], []
    for i, c in enumerate(chans):
        s = 2 ** i
        m = rng.randn(1, 16 // s, 12 // s, max(8 // s, 1), c).astype(
            np.float32)
        mids.append(jnp.asarray(m))
        mids_zb.append(jnp.transpose(jnp.asarray(m), (0, 3, 1, 2, 4)))
    neck = FPN3D(in_channels=chans, out_channels=24)
    v = neck.init(jax.random.PRNGKey(0), mids, train=False)
    ref = neck.apply(v, mids, train=False)
    got = neck.apply(v, mids_zb, train=False, zb=True)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(g, (0, 2, 3, 1, 4))), np.asarray(r),
            rtol=1e-4, atol=1e-4)


def test_occ_head_coarse_zb_matches(rng):
    from coocc_tpu.config import get_config
    import dataclasses

    cfg = dataclasses.replace(
        get_config("coocc_multi_r50_256x704").occ_head,
        cascade_ratio=1, in_channels=(24, 24, 24, 24))
    feats = []
    for i in range(4):
        s = 2 ** i
        feats.append(jnp.asarray(rng.randn(
            1, 16 // s, 12 // s, max(8 // s, 1), 24).astype(np.float32)))
    feats_zb = [jnp.transpose(f, (0, 3, 1, 2, 4)) for f in feats]
    head = OccHead(cfg=cfg)
    v = head.init(jax.random.PRNGKey(0), list(feats), train=False)
    ref = head.apply(v, list(feats), train=False)["occ"]
    got = head.apply(v, list(feats_zb), train=False, zb=True)["occ"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
