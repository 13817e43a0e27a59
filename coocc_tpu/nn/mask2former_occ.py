"""Mask2Former occupancy head (capability-envelope component).

Capability parity with the reference's registered-but-unused mask2former
package (reference: coocc/mask2former/mask2former_nusc_occ.py:24-745 +
base/maskformer_head.py, positional_encodings/positional_encoding.py:12-110,
assigners/mask_hungarian_assigner.py, losses/dice_loss.py): learnable
queries decode per-query class scores and 3D mask embeddings against a
multi-scale voxel feature pyramid via masked cross-attention; the final
occupancy volume is softmax(cls)[..:-1] x sigmoid(mask) (format_results,
:691-696).

TPU-first structure: channels-last [B, X, Y, Z, C]; the decoder runs all
Q=100 queries as one batched MHA (einsum attention with an additive mask);
the attention mask is max-pooled (pooling_attn_mask=True path, :457-460)
with an exact reduce_window because all level sizes are integer ratios.
Hungarian matching for the training loss runs on host (numpy) like the
reference's scipy assigner — the loss fn is therefore not jittable and is
meant for the aux-head training path.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sine_positional_encoding_3d(shape: Tuple[int, int, int], num_feats: int,
                                temperature: float = 10000.0,
                                normalize: bool = True,
                                scale: float = 2 * math.pi) -> jnp.ndarray:
    """[X, Y, Z, 3*num_feats] sine/cosine position embedding.

    Matches SinePositionalEncoding3D (reference positional_encoding.py:
    58-108) on an all-valid mask: cumsum of ones along each axis,
    normalized to [0, scale], interleaved sin/cos per axis, concatenated
    (x | y | z) along channels.
    """
    X, Y, Z = shape
    eps = 1e-6

    def axis_embed(n):
        e = jnp.arange(1, n + 1, dtype=jnp.float32)
        if normalize:
            e = e / (n + eps) * scale
        return e

    dim_t = temperature ** (
        2.0 * (jnp.arange(num_feats, dtype=jnp.float32) // 2) / num_feats)

    def pos(e):
        p = e[:, None] / dim_t
        # even channels sin, odd channels cos (works for odd num_feats too)
        even = jnp.arange(num_feats) % 2 == 0
        return jnp.where(even[None], jnp.sin(p), jnp.cos(p))

    px = jnp.broadcast_to(pos(axis_embed(X))[:, None, None, :],
                          (X, Y, Z, num_feats))
    py = jnp.broadcast_to(pos(axis_embed(Y))[None, :, None, :],
                          (X, Y, Z, num_feats))
    pz = jnp.broadcast_to(pos(axis_embed(Z))[None, None, :, :],
                          (X, Y, Z, num_feats))
    return jnp.concatenate([px, py, pz], axis=-1)


class _MHA(nn.Module):
    """Multi-head attention with torch-style additive key masking."""
    embed_dims: int
    num_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, q, k, v, attn_mask=None):
        """q: [B, Q, C]; k, v: [B, S, C]; attn_mask: [B, Q, S] bool
        (True = BLOCKED, torch convention). Returns [B, Q, C]."""
        C, H = self.embed_dims, self.num_heads
        hd = C // H
        qh = nn.Dense(C, dtype=self.dtype, name="q")(q)
        kh = nn.Dense(C, dtype=self.dtype, name="k")(k)
        vh = nn.Dense(C, dtype=self.dtype, name="v")(v)

        def split(x):
            return x.reshape(x.shape[0], -1, H, hd).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhqd,bhsd->bhqs", split(qh) * hd ** -0.5,
                            split(kh))
        if attn_mask is not None:
            logits = jnp.where(attn_mask[:, None], -1e9, logits)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqs,bhsd->bhqd", attn.astype(vh.dtype), split(vh))
        out = out.transpose(0, 2, 1, 3).reshape(q.shape[0], -1, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class _FFN(nn.Module):
    embed_dims: int
    feedforward_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.feedforward_channels, dtype=self.dtype,
                     name="fc1")(x)
        y = nn.relu(y)
        y = nn.Dense(self.embed_dims, dtype=self.dtype, name="fc2")(y)
        return x + y


def _maxpool_to(mask_pred, target):
    """[B, Q, X, Y, Z] -> [B, Q, x, y, z] max-pool (integer ratios)."""
    B, Q, X, Y, Z = mask_pred.shape
    rx, ry, rz = X // target[0], Y // target[1], Z // target[2]
    m = mask_pred.reshape(B, Q, target[0], rx, target[1], ry, target[2], rz)
    return m.max(axis=(3, 5, 7))


class Mask2FormerOccHead(nn.Module):
    """Query-based occupancy head over a voxel feature pyramid."""
    feat_channels: int = 128
    num_classes: int = 17          # occupancy classes incl. free (cls 0)
    num_queries: int = 100
    num_heads: int = 8
    num_decoder_layers: int = 9
    num_feat_levels: int = 3
    feedforward_channels: int = 1024
    pooling_attn_mask: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, voxel_feats: Sequence[jnp.ndarray],
                 train: bool = False):
        """voxel_feats: finest-first list of [B, X, Y, Z, C].

        Returns dict: cls_preds [L+1, B, Q, num_classes+1], mask_preds
        list of [B, Q, X0, Y0, Z0] per decoder stage, occ [B, X0, Y0, Z0,
        num_classes] composed probabilities of the last stage.
        """
        C = self.feat_channels
        mask_features = voxel_feats[0]
        memories = list(voxel_feats[1:self.num_feat_levels + 1][::-1])
        assert len(memories) == self.num_feat_levels, \
            "need num_feat_levels+1 pyramid levels (finest + memories)"
        B = mask_features.shape[0]

        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (self.num_feat_levels, C))
        query_feat = self.param("query_feat", nn.initializers.normal(1.0),
                                (self.num_queries, C))
        query_embed = self.param("query_embed", nn.initializers.normal(1.0),
                                 (self.num_queries, C))

        inputs, poses, sizes = [], [], []
        for i, mem in enumerate(memories):
            Xi, Yi, Zi = mem.shape[1:4]
            if mem.shape[-1] != C:
                mem = nn.Dense(C, dtype=self.dtype,
                               name=f"input_proj{i}")(mem)
            flat = mem.reshape(B, Xi * Yi * Zi, C)
            inputs.append(flat + level_embed[i][None, None].astype(flat.dtype))
            pe = sine_positional_encoding_3d((Xi, Yi, Zi), C // 3)
            pe = jnp.pad(pe, ((0, 0),) * 3 + ((0, C - pe.shape[-1]),))
            poses.append(pe.reshape(1, Xi * Yi * Zi, C).astype(flat.dtype))
            sizes.append((Xi, Yi, Zi))

        post_norm = nn.LayerNorm(dtype=self.dtype, name="post_norm")
        cls_embed = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                             name="cls_embed")
        mask_mlp = [nn.Dense(C, dtype=self.dtype, name=f"mask_embed{i}")
                    for i in range(3)]

        def forward_head(qf, target_size):
            d = post_norm(qf)
            cls_pred = cls_embed(d)
            me = d
            for i, fc in enumerate(mask_mlp):
                me = fc(me)
                if i < 2:
                    me = nn.relu(me)
            mask_pred = jnp.einsum("bqc,bxyzc->bqxyz", me, mask_features)
            pooled = _maxpool_to(mask_pred.astype(jnp.float32), target_size)
            attn = jax.lax.stop_gradient(
                jax.nn.sigmoid(pooled) < 0.5)  # True = blocked
            attn = attn.reshape(B, self.num_queries, -1)
            # un-block fully-blocked queries (reference :704-705)
            all_blocked = attn.all(axis=-1, keepdims=True)
            return cls_pred, mask_pred, attn & ~all_blocked

        q = jnp.broadcast_to(query_feat[None], (B,) + query_feat.shape)
        qe = jnp.broadcast_to(query_embed[None], (B,) + query_embed.shape)
        q = q.astype(mask_features.dtype)
        qe = qe.astype(mask_features.dtype)

        cls_preds, mask_preds = [], []
        cls_pred, mask_pred, attn_mask = forward_head(q, sizes[0])
        cls_preds.append(cls_pred)
        mask_preds.append(mask_pred)

        for i in range(self.num_decoder_layers):
            lvl = i % self.num_feat_levels
            # cross-attn (masked) -> norm -> self-attn -> norm -> ffn -> norm
            y = _MHA(C, self.num_heads, dtype=self.dtype,
                     name=f"layer{i}_cross")(
                q + qe, inputs[lvl] + poses[lvl], inputs[lvl], attn_mask)
            q = nn.LayerNorm(dtype=self.dtype, name=f"layer{i}_norm0")(q + y)
            y = _MHA(C, self.num_heads, dtype=self.dtype,
                     name=f"layer{i}_self")(q + qe, q + qe, q)
            q = nn.LayerNorm(dtype=self.dtype, name=f"layer{i}_norm1")(q + y)
            q = nn.LayerNorm(dtype=self.dtype, name=f"layer{i}_norm2")(
                _FFN(C, self.feedforward_channels, dtype=self.dtype,
                     name=f"layer{i}_ffn")(q))
            cls_pred, mask_pred, attn_mask = forward_head(
                q, sizes[(i + 1) % self.num_feat_levels])
            cls_preds.append(cls_pred)
            mask_preds.append(mask_pred)

        occ = format_results(cls_preds[-1], mask_preds[-1])
        return {"cls_preds": cls_preds, "mask_preds": mask_preds, "occ": occ}


def format_panoptic_results(cls_pred, mask_pred, thing_indices):
    """Panoptic composition (reference mask2former_nusc_panoptic_occ.py:
    749-784): each voxel takes its argmax query's class; stuff classes get
    label*1000, thing voxels get label*1000 + a per-query instance id.

    Host-side eval formatting (numpy). Returns (semantic [B, X, Y, Z],
    panoptic [B, X, Y, Z]) int64 arrays.
    """
    cls_np = np.asarray(cls_pred, np.float32)
    mask_np = np.asarray(mask_pred, np.float32)
    B = cls_np.shape[0]
    sem_out, pan_out = [], []
    for b in range(B):
        probs = np.exp(cls_np[b] - cls_np[b].max(-1, keepdims=True))
        probs = (probs / probs.sum(-1, keepdims=True))[..., :-1]
        labels = probs.argmax(-1)                      # [Q]
        vox_q = mask_np[b].argmax(0)                   # [X, Y, Z]
        sem = labels[vox_q]
        pan = np.zeros_like(sem, np.int64)
        instance_id = 1
        for label_id in np.unique(sem):
            label_mask = sem == label_id
            if int(label_id) not in thing_indices:
                pan[label_mask] = int(label_id) * 1000
                continue
            for q in np.unique(vox_q[label_mask]):
                pan[vox_q == q] = int(label_id) * 1000 + instance_id
                instance_id += 1
        sem_out.append(sem.astype(np.int64))
        pan_out.append(pan)
    return np.stack(sem_out), np.stack(pan_out)


def format_results(cls_pred, mask_pred):
    """softmax(cls)[..., :-1] x sigmoid(mask) -> [B, X, Y, Z, num_classes]
    (reference mask2former_nusc_occ.py:691-696)."""
    cls_prob = jax.nn.softmax(cls_pred.astype(jnp.float32), -1)[..., :-1]
    mask_prob = jax.nn.sigmoid(mask_pred.astype(jnp.float32))
    return jnp.einsum("bqc,bqxyz->bxyzc", cls_prob, mask_prob)


# ---------------------------------------------------------------------------
# training loss: host-side Hungarian matching + dice/CE (reference
# assigners/mask_hungarian_assigner.py + losses/dice_loss.py + loss_single)
# ---------------------------------------------------------------------------

def forward_lidarseg(cls_pred, mask_pred, points, *, pc_range,
                     padding_mode="border", point_labels=None,
                     num_classes=17):
    """Per-point class probabilities by trilinear sampling of the composed
    occupancy volume (reference mask2former_nusc_occ.py:505-542).

    Args:
      cls_pred:  [B, Q, num_classes+1] logits (last decoder layer).
      mask_pred: [B, Q, X, Y, Z] logits.
      points:    list of [Ni, >=3] arrays, xyz in world metres.
      pc_range:  (xmin, ymin, zmin, xmax, ymax, zmax).
      point_labels: optional list of [Ni] int labels; when given, returns
        a {'point_mean_iou': float} dict like the reference training path.

    Returns concat softmax probs [sum(Ni), num_classes] (eval path) or the
    mean-IoU dict (training path), matching the reference's split.
    """
    vol = format_results(cls_pred, mask_pred)        # [B, X, Y, Z, C]
    lo = jnp.asarray(pc_range[:3], jnp.float32)
    span = jnp.asarray(pc_range[3:], jnp.float32) - lo

    from coocc_tpu.ops.grid_sample import grid_sample_3d
    logits = []
    for b, pts in enumerate(points):
        p = (jnp.asarray(pts)[:, :3].astype(jnp.float32) - lo) / span * 2 - 1
        # vol[b] is [X, Y, Z, C]: grid x-coord indexes the innermost (Z)
        # axis, so feed (z, y, x) — the reference's [..., [2, 1, 0]] swap.
        grid = p[:, ::-1]
        logits.append(grid_sample_3d(vol[b], grid, align_corners=True,
                                     padding_mode=padding_mode))
    point_logits = jnp.concatenate(logits, 0)        # [N, C]

    if point_labels is not None:
        # reference :528-540 — lidarseg mIoU over classes 1..16
        pred = np.asarray(jnp.argmax(point_logits[:, 1:], -1)) + 1
        gt = np.concatenate([np.asarray(l) for l in point_labels]).astype(
            np.int64)
        k = (gt >= 0) & (gt < num_classes)
        hist = np.bincount(num_classes * gt[k] + pred[k],
                           minlength=num_classes ** 2
                           ).reshape(num_classes, num_classes)
        hist = hist[1:, 1:]
        denom = hist.sum(1) + hist.sum(0) - np.diag(hist)
        iu = np.where(denom > 0, np.diag(hist) / np.maximum(denom, 1),
                      np.nan)
        return {"point_mean_iou": float(np.nanmean(iu))}
    return jax.nn.softmax(point_logits, -1)


def mask2former_occ_loss_all_layers(cls_preds, mask_preds, gt_occ, *,
                                    num_classes, ignore_index=255,
                                    bg_weight=0.1):
    """Deep supervision over every decoder stage (reference
    mask2former_nusc_occ.py:275-322): the last layer's losses keep the
    plain names, earlier stages get ``d{i}.``-prefixed aux entries, and
    ``loss_total`` sums everything (the reference's optimizer sums the
    dict values)."""
    out = {}
    total = 0.0
    n_stage = len(cls_preds)
    for i in range(n_stage):
        li = mask2former_occ_loss(cls_preds[i], mask_preds[i], gt_occ,
                                  num_classes=num_classes,
                                  ignore_index=ignore_index,
                                  bg_weight=bg_weight)
        prefix = "" if i == n_stage - 1 else f"d{i}."
        for k, v in li.items():
            out[prefix + k] = v
            total = total + v
    out["loss_total"] = total
    return out


def _dice(p, g, eps=1e-3):
    num = 2.0 * (p * g).sum(-1)
    den = p.sum(-1) + g.sum(-1)
    return 1.0 - (num + eps) / (den + eps)


def mask2former_occ_loss(cls_pred, mask_pred, gt_occ, *, num_classes,
                         ignore_index=255, bg_weight=0.1):
    """Per-stage loss with Hungarian matching (NOT jittable: host matching).

    Args:
      cls_pred:  [B, Q, num_classes+1] logits.
      mask_pred: [B, Q, X, Y, Z] logits.
      gt_occ:    [B, X, Y, Z] int labels (255 = ignore).

    Returns dict(loss_cls, loss_mask, loss_dice) scalars.
    """
    from scipy.optimize import linear_sum_assignment

    B, Q = cls_pred.shape[:2]
    cls_np = np.asarray(cls_pred, np.float32)
    mask_np = np.asarray(mask_pred, np.float32)
    gt_np = np.asarray(gt_occ)

    total_cls, total_mask, total_dice, n_match = 0.0, 0.0, 0.0, 0
    for b in range(B):
        valid = gt_np[b] != ignore_index
        labels = np.unique(gt_np[b][valid])
        G = len(labels)
        gt_masks = np.stack([(gt_np[b] == c) & valid for c in labels]) \
            if G else np.zeros((0,) + gt_np[b].shape, bool)

        tgt_cls = np.full((Q,), num_classes, np.int64)  # background
        if G:
            p = 1.0 / (1.0 + np.exp(-mask_np[b].reshape(Q, -1)))
            g = gt_masks.reshape(G, -1).astype(np.float32)
            cls_prob = np.exp(cls_np[b] - cls_np[b].max(-1, keepdims=True))
            cls_prob = cls_prob / cls_prob.sum(-1, keepdims=True)
            cost_cls = -cls_prob[:, labels]                       # [Q, G]
            inter = p @ g.T
            cost_dice = 1.0 - (2 * inter + 1e-3) / (
                p.sum(-1)[:, None] + g.sum(-1)[None] + 1e-3)
            # sigmoid BCE cost, averaged over valid voxels
            logit = mask_np[b].reshape(Q, -1)
            bce_pos = np.logaddexp(0, -logit) @ g.T
            bce_neg = np.logaddexp(0, logit) @ (
                valid.reshape(-1)[None].astype(np.float32) - g).T
            cost_mask = (bce_pos + bce_neg) / max(valid.sum(), 1)
            cost = cost_cls * 1.0 + cost_mask * 1.0 + cost_dice * 1.0
            qi, gi = linear_sum_assignment(cost)
            tgt_cls[qi] = labels[gi]

            mp = jnp.asarray(mask_np[b][qi].reshape(len(qi), -1))
            gm = jnp.asarray(g[gi])
            vm = jnp.asarray(valid.reshape(-1).astype(np.float32))
            pr = jax.nn.sigmoid(mp)
            total_dice += _dice(pr * vm, gm).sum()
            bce = jnp.maximum(mp, 0) - mp * gm + jnp.log1p(
                jnp.exp(-jnp.abs(mp)))
            total_mask += (bce * vm).sum() / jnp.maximum(vm.sum(), 1.0)
            n_match += len(qi)

        w = np.ones((num_classes + 1,), np.float32)
        w[num_classes] = bg_weight
        logp = jax.nn.log_softmax(jnp.asarray(cls_np[b]), -1)
        wt = jnp.asarray(w[tgt_cls])
        total_cls += -(logp[jnp.arange(Q), jnp.asarray(tgt_cls)] * wt
                       ).sum() / wt.sum()

    n = max(n_match, 1)
    return {"loss_cls": total_cls / B,
            "loss_mask": total_mask / B,
            "loss_dice": total_dice / n}
