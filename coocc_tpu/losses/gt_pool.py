"""Mode-pooling GT downsampler for multi-scale voxel losses.

Capability parity with OccHead.loss_voxel's inline GT reshaping
(reference: occ_head.py:270-281): each ratio^3 block of the full-resolution
GT becomes one coarse label by majority vote over NONZERO labels, where
  * an all-empty block stays 0 (free);
  * a nonzero label needs count >= 2 to win (the reference replaces zeros by
    unique negatives, so any count-1 winner loses torch.mode's smallest-value
    tie-break to a negative and maps to 255/ignore);
  * ties between nonzero labels resolve to the SMALLER label (torch.mode).
Vectorized as an 18-bin count (labels 1..16(+extras) and 255) per block.
"""
from __future__ import annotations

import jax.numpy as jnp


def mode_pool_gt(target, ratio: int, num_classes: int):
    """target: int [B, X, Y, Z] (labels 0..C-1 and 255) -> [B, X/r, Y/r, Z/r]."""
    if ratio == 1:
        return target
    B, X, Y, Z = target.shape
    x = target.reshape(B, X // ratio, ratio, Y // ratio, ratio,
                       Z // ratio, ratio)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6).reshape(
        B, X // ratio, Y // ratio, Z // ratio, ratio ** 3)

    nbins = num_classes + 1  # bins: 0 unused for vote, 1..C-1 labels, C = 255
    lab = jnp.where(x == 255, num_classes, x).astype(jnp.int32)
    counts = (lab[..., None] == jnp.arange(nbins)).sum(axis=-2)  # [..., nbins]
    counts = counts.at[..., 0].set(0)  # zeros never win the vote

    # winner = smallest label among max-count nonzero labels
    maxc = counts.max(axis=-1)
    is_max = counts == maxc[..., None]
    winner = jnp.argmax(is_max, axis=-1)  # first (smallest) max bin

    empty_block = (x == 0).all(axis=-1)
    out = jnp.where(empty_block, 0,
                    jnp.where(maxc >= 2, winner, num_classes))
    out = jnp.where(out == num_classes, 255, out)
    return out.astype(target.dtype)
