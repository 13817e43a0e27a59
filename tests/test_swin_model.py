"""End-to-end model smoke with the Swin backbone selected via config."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from coocc_tpu.config.base import ImageBackboneConfig, ImageNeckConfig
from coocc_tpu.data.synthetic import synthetic_batch, tiny_config
from coocc_tpu.models.coocc_ray import CoOccRay


def test_coocc_ray_swin_backbone():
    cfg = tiny_config(use_camera=True, use_lidar=True)
    cfg = dataclasses.replace(
        cfg,
        img_backbone=ImageBackboneConfig(
            type="SwinTransformer", embed_dims=16,
            swin_depths=(1, 1, 1, 1), swin_num_heads=(1, 2, 4, 4),
            window_size=4),
        img_neck=dataclasses.replace(
            cfg.img_neck, in_channels=(16, 32, 64, 128)),
    )
    model = CoOccRay(cfg=cfg)
    batch = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(x),
        synthetic_batch(cfg, batch_size=1), is_leaf=lambda x: x is None)
    v = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    assert "img_backbone" in v["params"]
    assert "patch_embed" in v["params"]["img_backbone"]
    out = model.apply(v, batch, train=False)["occ"]
    assert np.isfinite(np.asarray(out, np.float32)).all()
