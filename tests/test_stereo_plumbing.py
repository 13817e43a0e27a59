"""End-to-end plumbing of the BEVStereo temporal-stereo depth path.

The module itself (nn/lss_stereo.py) is golden/shape-tested in
tests/test_lss_stereo.py; these tests cover the WIRING the reference never
shipped (capability envelope): config knob -> Batch fields -> shared-backbone
stereo features -> LSSBEVStereo inside the view transformer -> splat, plus
the dataset-side key->prev transform math.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coocc_tpu.config import get_config
from coocc_tpu.data.synthetic import synthetic_batch, tiny_config
from coocc_tpu.models.coocc_ray import CoOccRay
from coocc_tpu.utils.init_utils import jit_init


def test_stereo_config_registered():
    cfg = get_config("coocc_multi_r50_256x704_stereo")
    assert cfg.lss.stereo
    # everything else matches the flagship
    base = get_config("coocc_multi_r50_256x704")
    assert cfg.occ_size == base.occ_size
    assert cfg.lss.numC_Trans == base.lss.numC_Trans


def test_stereo_forward_tiny():
    cfg = tiny_config(stereo=True, cascade=False)
    batch = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(x),
        synthetic_batch(cfg, batch_size=1),
        is_leaf=lambda x: x is None)
    assert batch.imgs_prev is not None
    assert batch.k2s_rots.shape == batch.rots.shape

    model = CoOccRay(cfg=cfg)
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                         train=False)
    # the stereo depth net replaces the mono DepthNet under the same scope
    params = variables["params"]["img_view_transformer"]["depth_net"]
    assert "sim_fc0" in params  # cost-volume similarity head exists
    outs = jax.jit(lambda v, b: model.apply(v, b, train=False))(
        variables, batch)
    occ = outs["occ"][0]
    assert np.isfinite(np.asarray(occ).astype(np.float32)).all()


def test_stereo_prev_transform_math():
    """_add_stereo_prev k2s math: a pure ego translation between frames maps
    key-camera points to prev-camera coords shifted by that translation
    expressed in the camera frame."""
    from coocc_tpu.data.nuscenes_dataset import _quat_rot

    rng = np.random.RandomState(0)
    # random cam orientation, identity ego rotations, ego step (1, 2, 0)
    A = np.linalg.qr(rng.randn(3, 3))[0]

    def cam2global(ego_t):
        s2l = np.eye(4)
        s2l[:3, :3] = A
        s2l[:3, 3] = (0.5, 0.1, 0.2)
        e2g = np.eye(4)
        e2g[:3, 3] = ego_t
        return e2g @ s2l  # lidar2ego = I

    key = cam2global((1.0, 2.0, 0.0))
    prev = cam2global((0.0, 0.0, 0.0))
    T = np.linalg.inv(prev) @ key
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(T[:3, 3], A.T @ np.array([1.0, 2.0, 0.0]),
                               atol=1e-12)
    # quaternion helper sanity: w=1 -> identity; 90deg about z
    np.testing.assert_allclose(_quat_rot([1, 0, 0, 0]), np.eye(3), atol=1e-12)
    s = np.sqrt(0.5)
    Rz90 = _quat_rot([s, 0, 0, s])
    np.testing.assert_allclose(Rz90 @ np.array([1, 0, 0]), [0, 1, 0],
                               atol=1e-12)
