"""End-to-end model smoke tests at miniature shapes (CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coocc_tpu.data.synthetic import synthetic_batch, tiny_config
from coocc_tpu.models.coocc_ray import CoOccRay
from coocc_tpu.models.losses import compute_losses


@pytest.fixture(scope="module")
def fusion_setup():
    cfg = tiny_config(use_camera=True, use_lidar=True)
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, 1))
    model = CoOccRay(cfg=cfg)
    from coocc_tpu.utils.init_utils import jit_init
    variables = jit_init(
        model,
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True, fine_rng=jax.random.PRNGKey(2))
    return cfg, batch, model, variables


def test_fusion_forward_eval(fusion_setup):
    cfg, batch, model, variables = fusion_setup
    outs = model.apply(variables, batch, train=False)
    X, Y, Z = cfg.lss_grid_size
    assert outs["occ"].shape == (1, X, Y, Z, cfg.num_classes)
    assert bool(jnp.isfinite(outs["occ"]).all())
    assert "fine_logits" in outs
    assert outs["fine_logits"].shape[-1] == cfg.num_classes
    assert bool(jnp.isfinite(outs["fine_logits"]).all())


def test_fusion_train_losses(fusion_setup):
    cfg, batch, model, variables = fusion_setup
    outs, _ = model.apply(
        variables, batch, train=True,
        fine_rng=jax.random.PRNGKey(2),
        rngs={"dropout": jax.random.PRNGKey(3)},
        mutable=["batch_stats"])
    losses = compute_losses(outs, batch, cfg)
    expected = {"loss_depth", "loss_voxel_ce_c_0", "loss_voxel_lovasz_c_0",
                "loss_voxel_ce_fine", "loss_depth_render", "loss_rgb"}
    assert expected.issubset(losses.keys()), sorted(losses)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    # the loss-norm trick makes normalized losses ~1
    assert abs(float(losses["loss_voxel_ce_c_0"]) - 1.0) < 1e-3


def test_lidar_only_forward():
    cfg = tiny_config(use_camera=False, use_lidar=True, cascade=False)
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, 1))
    model = CoOccRay(cfg=cfg)
    from coocc_tpu.utils.init_utils import jit_init
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                         train=False)
    outs = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    X, Y, Z = cfg.lss_grid_size
    assert outs["occ"].shape == (1, X, Y, Z, cfg.num_classes)
    assert bool(jnp.isfinite(outs["occ"]).all())


def test_lidar_only_render_loss():
    """The lidar-only model renders depth from gt_depths geometry and
    produces a depth-only render loss (reference coocc_ray_lidar.py:456-515:
    frustum from the camera-free calib tuple, sigma-only compositing, MSE
    vs binned lidar depth; no rgb loss without images)."""
    cfg = tiny_config(use_camera=False, use_lidar=True, cascade=False)
    assert cfg.render.use_rendering
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, 1))
    assert batch.imgs is None and batch.rots is not None
    model = CoOccRay(cfg=cfg)
    from coocc_tpu.utils.init_utils import jit_init
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                         train=True)
    outs, _ = model.apply(variables, batch, train=True,
                          mutable=["batch_stats"])
    assert "render_depth" in outs and "render_rgb" not in outs
    losses = compute_losses(outs, batch, cfg)
    assert "loss_depth_render" in losses
    assert "loss_rgb" not in losses
    assert bool(jnp.isfinite(losses["loss_depth_render"]))


def test_camera_only_forward():
    cfg = tiny_config(use_camera=True, use_lidar=False)
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, 1))
    model = CoOccRay(cfg=cfg)
    from coocc_tpu.utils.init_utils import jit_init
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                         train=False)
    outs = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert bool(jnp.isfinite(outs["occ"]).all())
