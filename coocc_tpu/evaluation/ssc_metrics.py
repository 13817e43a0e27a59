"""SSC/SC metrics as psum-able confusion matrices.

Capability parity with the reference metric stack:
  * per-batch fast_hist confusion matrices computed in simple_test
    (reference: coocc_ray.py:726-730 fast_hist, :539-554 SC/SSC accumulation,
    :659-666 trilinear logit upsampling to GT resolution before argmax)
  * SSCMetrics aggregation (utils/ssc_metric.py:14-169): completion
    precision/recall/IoU from the binary hist, per-class IoU and the mean
    over classes 1..C-1 from the semantic hist.

TPU-native distributed reduction: the hists are plain [C, C] int arrays —
jax.lax.psum replaces torchmetrics' dist sync and the reference's
dist.all_reduce (apis/test.py:242-243).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interpolate import resize_trilinear_chlast


def fast_hist(pred: jnp.ndarray, label: jnp.ndarray, num_classes: int,
              valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Confusion matrix hist[label, pred], masked by `valid`."""
    p = pred.reshape(-1)
    l = label.reshape(-1)
    idx = l * num_classes + p
    if valid is not None:
        v = valid.reshape(-1)
        idx = jnp.where(v, idx, num_classes * num_classes)
    hist = jnp.zeros(num_classes * num_classes + 1, jnp.int32)
    hist = hist.at[idx].add(1)
    return hist[:-1].reshape(num_classes, num_classes)


def occupancy_hists(logits: jnp.ndarray, gt_occ: jnp.ndarray,
                    num_classes: int, empty_idx: int = 0,
                    extra_mask: Optional[jnp.ndarray] = None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Coarse logits [B, Xc, Yc, Zc, C] + GT [B, X, Y, Z] -> (SC[2,2], SSC[C,C]).

    Logits are trilinearly upsampled to the GT grid before argmax
    (reference: coocc_ray.py:659-666). extra_mask ANDs an additional voxel
    validity (the OpenOccupancy camera/lidar visible mask, reference
    coocc_ray_lidar.py:700-707 hist_occ)."""
    B, X, Y, Z = gt_occ.shape
    if logits.shape[1:4] != (X, Y, Z):
        logits = resize_trilinear_chlast(logits, (X, Y, Z),
                                         align_corners=False)
    pred = jnp.argmax(logits, axis=-1)
    valid = gt_occ != 255
    if extra_mask is not None:
        valid = valid & (extra_mask != 0)
    sc = fast_hist((pred != empty_idx).astype(jnp.int32),
                   (gt_occ != empty_idx).astype(jnp.int32), 2, valid)
    gt_clip = jnp.where(valid, gt_occ, 0)
    ssc = fast_hist(pred, gt_clip, num_classes, valid)
    return sc, ssc


def scatter_fine_into_pred(fine_logits, fine_coords,
                           fine_valid, final_size, empty_idx=0):
    """Densify the cascade's fine logits into a full-resolution class grid.

    Mirrors simple_test's pred_f assembly (coocc_ray.py:545-554): start from
    an all-empty one-hot-ish grid and write fine logits at fine coords.
    Returns [B, X, Y, Z] class predictions.
    """
    B, P, C = fine_logits.shape
    X, Y, Z = final_size

    def one(fl, fc, fv):
        grid = jnp.zeros((X, Y, Z, C), fl.dtype)
        grid = grid.at[..., empty_idx].set(1.0)
        lid = (fc[:, 0] * Y + fc[:, 1]) * Z + fc[:, 2]
        lid = jnp.where(fv, lid, X * Y * Z)
        flat = grid.reshape(-1, C)
        flat = jnp.concatenate([flat, jnp.zeros((1, C), fl.dtype)], 0)
        flat = flat.at[lid].set(fl)
        return flat[:-1].reshape(X, Y, Z, C)

    return jax.vmap(one)(fine_logits, fine_coords, fine_valid)


def ssc_summary(sc_hist: np.ndarray, ssc_hist: np.ndarray) -> Dict[str, float]:
    """Final metric table (reference: ssc_metric.py:87-102, formating.py)."""
    sc = np.asarray(sc_hist, np.float64)
    tp = sc[1, 1]
    fp = sc[0, 1]
    fn = sc[1, 0]
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    iou = tp / max(tp + fp + fn, 1)

    h = np.asarray(ssc_hist, np.float64)
    tp_c = np.diag(h)
    denom = h.sum(1) + h.sum(0) - tp_c
    with np.errstate(divide="ignore", invalid="ignore"):
        iou_ssc = np.where(denom > 0, tp_c / denom, np.nan)
    miou = np.nanmean(iou_ssc[1:])  # classes 1..C-1 (exclude free)
    return {
        "SC_Precision": float(precision),
        "SC_Recall": float(recall),
        "SC_IoU": float(iou),
        "SSC_mIoU": float(miou),
        "SSC_IoU_per_class": iou_ssc.tolist(),
    }


def lidarseg_hist(point_logits, point_labels, valid, num_classes=17):
    """lidarseg readout hist over classes 1..16 (reference fast_hist_crop,
    utils/metric_util.py:1-22; argmax over classes 1.. like coocc_ray.py:557)."""
    pred = jnp.argmax(point_logits[..., 1:], axis=-1) + 1
    return fast_hist(pred, point_labels, num_classes, valid)
