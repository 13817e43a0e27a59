"""Lovasz-softmax loss, static-shape formulation.

Capability parity with the reference (coocc/dense_heads/lovasz_softmax.py,
per_image=False, classes='present', ignore=255). The torch version drops
ignored voxels by boolean indexing; here ignored voxels keep their slots but
get zero error, which sorts them to the tail where their contribution to the
dot(errors_sorted, lovasz_grad) is exactly zero — identical loss value with
static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _lovasz_grad(gt_sorted):
    """Gradient of the Lovasz extension w.r.t. sorted errors (1D)."""
    p = gt_sorted.shape[0]
    gts = gt_sorted.sum()
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    jaccard = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
    return jaccard


def lovasz_softmax(probs, target, ignore_index=255, classes="present"):
    """probs: [..., C] softmax probabilities; target: int [...]; -> scalar."""
    C = probs.shape[-1]
    p = probs.reshape(-1, C)
    t = target.reshape(-1)
    valid = (t != ignore_index)
    t_safe = jnp.where(valid, t, 0).astype(jnp.int32)

    def class_loss(c):
        fg = ((t_safe == c) & valid).astype(p.dtype)
        errors = jnp.abs(fg - p[:, c])
        # ignored voxels: zero error -> sorted last, zero contribution. Note
        # their (1 - gt) would otherwise inflate the union beyond that point,
        # but no error mass lives there.
        errors = errors * valid
        # ONE stable multi-operand sort carries fg through the same
        # permutation — replaces argsort + two gathers (and their backward
        # scatters), the dominant cost of this loss on TPU (39 ms fwd+bwd
        # at the flagship's [17, 80k] coarse grid before this rewrite).
        # Stable ascending sort on -errors == the old stable argsort
        # descending, so numerics are bit-identical.
        neg_sorted, fg_sorted = jax.lax.sort((-errors, fg), num_keys=1)
        errors_sorted = -neg_sorted
        grad = _lovasz_grad(fg_sorted)
        loss_c = jnp.dot(errors_sorted, grad)
        present = fg.sum() > 0
        return loss_c, present

    losses, presents = jax.vmap(class_loss)(jnp.arange(C))
    if classes == "present":
        return (losses * presents).sum() / jnp.maximum(presents.sum(), 1.0)
    return losses.mean()
