"""End-to-end test-rendering eval path (reference: coocc_ray.py:562-637 +
utils/save_rendered_img.py:10-82): with cfg.render.test_rendering=True the
eval step must expose render_rgb/render_depth, evaluate() must report
PSNR/SSIM in the summary, and the side-by-side dumps must land on disk."""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from coocc_tpu.data.synthetic import synthetic_batch, tiny_config
from coocc_tpu.models.coocc_ray import CoOccRay
from coocc_tpu.train.loop import evaluate
from coocc_tpu.utils.init_utils import jit_init


def _render_cfg():
    cfg = tiny_config()
    return dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, use_rendering=True,
                                        test_rendering=True))


def test_render_eval_end_to_end(tmp_path):
    cfg = _render_cfg()
    model = CoOccRay(cfg=cfg)
    batch = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(x),
        synthetic_batch(cfg, batch_size=1, seed=3),
        is_leaf=lambda x: x is None)
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                         train=False)

    render_dir = str(tmp_path / "renders")
    metrics = evaluate(model, variables, cfg, [batch], max_steps=1,
                       render_dir=render_dir)
    assert "render_PSNR" in metrics and "render_SSIM" in metrics
    assert np.isfinite(metrics["render_PSNR"])
    assert -1.0 <= metrics["render_SSIM"] <= 1.0
    dumps = os.listdir(render_dir)
    assert len(dumps) == cfg.data.num_cams, dumps

    # the summary table gains the PSNR row (reference prints psnr_total at
    # the end of test, coocc_ray.py:630-637)
    from coocc_tpu.config.nuscenes import NUSC_CLASS_NAMES
    from coocc_tpu.evaluation.formatting import format_ssc_table
    lines = format_ssc_table(metrics, NUSC_CLASS_NAMES)
    assert any("PSNR" in ln for ln in lines)


def test_eval_without_rendering_has_no_psnr():
    cfg = tiny_config()  # test_rendering defaults False
    model = CoOccRay(cfg=cfg)
    batch = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(x),
        synthetic_batch(cfg, batch_size=1, seed=3),
        is_leaf=lambda x: x is None)
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                         train=False)
    metrics = evaluate(model, variables, cfg, [batch], max_steps=1)
    assert "render_PSNR" not in metrics
