"""Training loss assembly for COOCC_Ray / COOCC_Ray_L.

Capability parity with the reference's loss wiring:
  * depth BCE on the DepthNet distribution (coocc_ray.py:339-340)
  * OccHead coarse voxel losses CE+sem_scal+geo_scal+lovasz on mode-pooled GT
    (occ_head.py:267-292, tag c_0) and fine point losses at sampled coords
    (occ_head.py:294-312, tag fine)
  * the loss-normalization trick loss/detach(loss) (coocc_ray.py:353-356)
  * rendering losses: rgb MSE vs the input image and depth MSE vs binned
    LiDAR depth (coocc_ray.py:419-433)
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.base import CoOccConfig
from ..config.nuscenes import class_weights as nusc_class_weights
from ..losses.depth import bce_depth_loss, kld_depth_loss
from ..losses.gt_pool import mode_pool_gt
from ..losses.lovasz import lovasz_softmax
from ..losses.ssc import ce_ssc_loss, geo_scal_loss, sem_scal_loss


def voxel_losses(logits, target, cfg: CoOccConfig, tag: str) -> Dict:
    """CE + sem_scal + geo_scal + lovasz at the logits' resolution."""
    h = cfg.occ_head
    weights = nusc_class_weights(h.out_channel) if h.balance_cls_weight \
        else np.full((h.out_channel,), 1.0 / h.out_channel, np.float32)
    out = {}
    out[f"loss_voxel_ce_{tag}"] = h.loss_voxel_ce_weight * ce_ssc_loss(
        logits, target, weights, ignore_index=255)
    out[f"loss_voxel_sem_scal_{tag}"] = h.loss_voxel_sem_scal_weight * \
        sem_scal_loss(logits, target, ignore_index=255)
    out[f"loss_voxel_geo_scal_{tag}"] = h.loss_voxel_geo_scal_weight * \
        geo_scal_loss(logits, target, ignore_index=255,
                      non_empty_idx=h.empty_idx)
    out[f"loss_voxel_lovasz_{tag}"] = h.loss_voxel_lovasz_weight * \
        lovasz_softmax(jax.nn.softmax(logits, axis=-1), target,
                       ignore_index=255)
    return out


def point_losses(fine_logits, fine_coords, fine_valid, target, cfg, tag="fine"):
    """Fine-cascade losses at sampled coordinates.

    fine_logits: [B, P, C]; fine_coords: [B, P, 3]; target: [B, X, Y, Z].
    Invalid slots get target 255 (ignored) — the reference never has them
    (dynamic shapes); padding must not contribute.
    """
    B, P, C = fine_logits.shape

    def gather_gt(t, coords, valid):
        g = t[coords[:, 0], coords[:, 1], coords[:, 2]]
        return jnp.where(valid, g, 255)

    gt = jax.vmap(gather_gt)(target, fine_coords, fine_valid)
    out = {}
    h = cfg.occ_head
    out[f"loss_voxel_ce_{tag}"] = h.loss_voxel_ce_weight * ce_ssc_loss(
        fine_logits, gt, None, ignore_index=255)
    out[f"loss_voxel_sem_scal_{tag}"] = h.loss_voxel_sem_scal_weight * \
        sem_scal_loss(fine_logits, gt, ignore_index=255)
    out[f"loss_voxel_geo_scal_{tag}"] = h.loss_voxel_geo_scal_weight * \
        geo_scal_loss(fine_logits, gt, ignore_index=255,
                      non_empty_idx=h.empty_idx)
    out[f"loss_voxel_lovasz_{tag}"] = h.loss_voxel_lovasz_weight * \
        lovasz_softmax(jax.nn.softmax(fine_logits, axis=-1), gt,
                       ignore_index=255)
    return out


def render_losses(outs, batch, cfg: CoOccConfig) -> Dict:
    losses = {}
    D = cfg.grid.num_depth_bins
    dbound = cfg.grid.dbound
    depths = outs["render_depth"]  # [B, N, H, W]
    gt_depth = batch.gt_depths
    gt_bins = (gt_depth - (dbound[0] - dbound[2] / 2.0)) / dbound[2]
    gt_bins = jnp.clip(gt_bins, 0, D)
    fg = gt_bins > 0
    err = ((depths / D) - (gt_bins / D)) ** 2 * fg
    losses["loss_depth_render"] = err.sum() / jnp.maximum(fg.sum(), 1.0)
    if outs.get("render_rgb") is not None and batch.imgs is not None:
        losses["loss_rgb"] = jnp.mean((outs["render_rgb"] - batch.imgs) ** 2)
    return losses


def compute_losses(outs, batch, cfg: CoOccConfig) -> Dict[str, jnp.ndarray]:
    losses: Dict[str, jnp.ndarray] = {}

    if outs.get("depth_prob") is not None and batch.gt_depths is not None:
        # bce|kld dispatch mirrors get_depth_loss
        # (ViewTransformerLSSVoxel.py:89-100, constant_std=0.5 at :30)
        depth_fn = {"bce": bce_depth_loss, "kld": kld_depth_loss}[
            cfg.lss.loss_depth_type]
        losses["loss_depth"] = cfg.lss.loss_depth_weight * depth_fn(
            outs["depth_prob"], batch.gt_depths, cfg.lss.downsample,
            cfg.grid.dbound)

    logits = outs["occ"]  # [B, Xc, Yc, Zc, C]
    if batch.gt_occ_2 is not None \
            and batch.gt_occ_2.shape[1] == logits.shape[1]:
        # preprocessed multi-scale GT (SemanticKITTI 1_2 files) — skip the
        # on-the-fly mode pool
        target_c = batch.gt_occ_2
    else:
        ratio = batch.gt_occ.shape[1] // logits.shape[1]
        target_c = mode_pool_gt(batch.gt_occ, ratio, cfg.occ_head.out_channel)
    losses.update(voxel_losses(logits, target_c, cfg, tag="c_0"))

    if "fine_logits" in outs:
        losses.update(point_losses(
            outs["fine_logits"], outs["fine_coords"], outs["fine_valid"],
            batch.gt_occ, cfg))

    # reference normalizes BEFORE adding the rendering losses
    # (coocc_ray.py:353-356 then :358-433)
    if cfg.loss_norm:
        losses = {
            k: (v / (jax.lax.stop_gradient(v) + 1e-9)
                if k.startswith("loss") else v)
            for k, v in losses.items()
        }

    if "render_depth" in outs:
        losses.update(render_losses(outs, batch, cfg))
    return losses
