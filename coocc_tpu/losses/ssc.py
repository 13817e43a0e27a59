"""Semantic scene completion losses (MonoScene family), static-shape jnp.

Capability parity with the reference losses
(projects/mmdet3d_plugin/utils/semkitti.py:65-149: geo_scal_loss,
sem_scal_loss, CE_ssc_loss). All handle ignore_index=255 with masks instead
of boolean indexing (XLA needs static shapes).

Logits layout: channels-last [..., C]; targets int [...]; 255 = ignore.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _bce(p, target):
    """F.binary_cross_entropy on probabilities (torch clamps log at -100)."""
    p = jnp.clip(p, 1e-12, 1.0 - 1e-12)
    return -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def ce_ssc_loss(logits, target, class_weights=None, ignore_index=255):
    """Weighted CE, mean over non-ignored (torch CrossEntropyLoss semantics:
    sum(w_y * ce) / sum(w_y))."""
    C = logits.shape[-1]
    valid = target != ignore_index
    tgt = jnp.where(valid, target, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    if class_weights is None:
        w = jnp.ones((C,), logits.dtype)
    else:
        w = jnp.asarray(class_weights, logits.dtype)
    wv = w[tgt] * valid
    return (ce * wv).sum() / jnp.maximum(wv.sum(), 1e-12)


def geo_scal_loss(logits, target, ignore_index=255, non_empty_idx=0):
    """Scene-level geometric affinity: BCE on precision/recall/specificity
    of the binary occupied-vs-empty prediction."""
    probs = jax.nn.softmax(logits, axis=-1)
    empty_probs = probs[..., non_empty_idx]
    nonempty_probs = 1.0 - empty_probs

    mask = (target != ignore_index)
    nonempty_target = ((target != non_empty_idx) & mask).astype(logits.dtype)
    m = mask.astype(logits.dtype)
    nonempty_probs = nonempty_probs * m
    empty_probs = empty_probs * m

    eps = 1e-5
    intersection = (nonempty_target * nonempty_probs).sum()
    precision = intersection / (nonempty_probs.sum() + eps)
    recall = intersection / (nonempty_target.sum() + eps)
    neg = (m - nonempty_target)
    spec = (neg * empty_probs).sum() / (neg.sum() + eps)
    return (_bce(precision, 1.0) + _bce(recall, 1.0) + _bce(spec, 1.0))


def sem_scal_loss(logits, target, ignore_index=255):
    """Per-class precision/recall/specificity BCE, averaged over classes
    present in the target (reference: semkitti.py:95-135)."""
    C = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    mask = (target != ignore_index)
    m = mask.astype(logits.dtype)

    tgt = jnp.where(mask, target, C).astype(jnp.int32)  # C bin = ignored
    onehot = jax.nn.one_hot(tgt, C, dtype=logits.dtype)  # [..., C], 0 if ignored

    p = probs * m[..., None]
    ct = onehot  # completion target per class

    sum_p = p.reshape(-1, C).sum(0)
    sum_ct = ct.reshape(-1, C).sum(0)
    nominator = (p * ct).reshape(-1, C).sum(0)
    sum_not_ct = (m[..., None] * (1 - ct)).reshape(-1, C).sum(0)
    sum_spec = ((1 - p) * (1 - ct) * m[..., None]).reshape(-1, C).sum(0)

    present = sum_ct > 0
    loss_prec = jnp.where(sum_p > 0,
                          _bce(nominator / jnp.maximum(sum_p, 1e-12), 1.0), 0.0)
    loss_rec = jnp.where(sum_ct > 0,
                         _bce(nominator / jnp.maximum(sum_ct, 1e-12), 1.0), 0.0)
    loss_spec = jnp.where(sum_not_ct > 0,
                          _bce(sum_spec / jnp.maximum(sum_not_ct, 1e-12), 1.0),
                          0.0)
    per_class = (loss_prec + loss_rec + loss_spec) * present
    return per_class.sum() / jnp.maximum(present.sum(), 1.0)
