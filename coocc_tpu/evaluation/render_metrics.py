"""Rendering diagnostics: PSNR / SSIM and rendered-image dumps.

Capability parity with utils/save_rendered_img.py:10-82 (compute_psnr, image
side-by-side dumps) used by the test_rendering path (coocc_ray.py:630-637).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def compute_psnr(pred: np.ndarray, target: np.ndarray,
                 mask: Optional[np.ndarray] = None) -> float:
    """Images in [0, 1]; PSNR in dB."""
    pred = np.asarray(pred, np.float64)
    target = np.asarray(target, np.float64)
    if mask is not None:
        diff = ((pred - target) ** 2)[mask.astype(bool)]
    else:
        diff = (pred - target) ** 2
    mse = float(diff.mean())
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(1.0 / mse))


def compute_ssim(pred: np.ndarray, target: np.ndarray) -> float:
    """Global (single-window) SSIM over [0,1] images — diagnostic-grade."""
    pred = np.asarray(pred, np.float64)
    target = np.asarray(target, np.float64)
    mu_x, mu_y = pred.mean(), target.mean()
    var_x, var_y = pred.var(), target.var()
    cov = ((pred - mu_x) * (target - mu_y)).mean()
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    return float(((2 * mu_x * mu_y + c1) * (2 * cov + c2))
                 / ((mu_x ** 2 + mu_y ** 2 + c1) * (var_x + var_y + c2)))


def save_rendered_img(rgb: np.ndarray, gt_rgb: np.ndarray,
                      depth: np.ndarray, out_path: str) -> float:
    """Side-by-side [render | gt | normalized depth] dump; returns PSNR.

    Mirrors the reference's per-view image dumps (coocc_ray.py:630-637).
    """
    from PIL import Image

    d = depth
    d = (d - d.min()) / (d.max() - d.min() + 1e-8)
    panel = np.concatenate(
        [rgb, gt_rgb, np.repeat(d[..., None], 3, axis=-1)], axis=1)
    panel = np.clip(panel, 0, 1)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    Image.fromarray((panel * 255).astype(np.uint8)).save(out_path)
    return compute_psnr(rgb, gt_rgb)
