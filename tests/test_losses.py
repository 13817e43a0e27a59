"""Loss numerics vs torch / dynamic-shape oracles."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from coocc_tpu.losses.ssc import ce_ssc_loss, geo_scal_loss, sem_scal_loss
from coocc_tpu.losses.lovasz import lovasz_softmax
from coocc_tpu.losses.gt_pool import mode_pool_gt
from coocc_tpu.losses.depth import bce_depth_loss, downsample_gt_depth


def _data(rng, C=5, n=200):
    logits = rng.randn(n, C).astype(np.float32)
    target = rng.randint(0, C, n)
    target[rng.rand(n) < 0.1] = 255
    return logits, target


def test_ce_parity(rng):
    logits, target = _data(rng)
    w = rng.rand(5).astype(np.float32) + 0.5
    ref = F.cross_entropy(torch.from_numpy(logits),
                          torch.from_numpy(target).long(),
                          weight=torch.from_numpy(w),
                          ignore_index=255).item()
    got = float(ce_ssc_loss(jnp.asarray(logits), jnp.asarray(target), w))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def _torch_geo_scal(pred, target, non_empty_idx=0):
    pred = F.softmax(pred, dim=1)
    empty_probs = pred[:, non_empty_idx]
    nonempty_probs = 1 - empty_probs
    mask = target != 255
    nonempty_target = (target != non_empty_idx)[mask].float()
    nonempty_probs = nonempty_probs[mask]
    empty_probs = empty_probs[mask]
    eps = 1e-5
    inter = (nonempty_target * nonempty_probs).sum()
    precision = inter / (nonempty_probs.sum() + eps)
    recall = inter / (nonempty_target.sum() + eps)
    spec = ((1 - nonempty_target) * empty_probs).sum() / \
        ((1 - nonempty_target).sum() + eps)
    return (F.binary_cross_entropy(precision, torch.ones_like(precision))
            + F.binary_cross_entropy(recall, torch.ones_like(recall))
            + F.binary_cross_entropy(spec, torch.ones_like(spec))).item()


def test_geo_scal_parity(rng):
    logits, target = _data(rng)
    ref = _torch_geo_scal(torch.from_numpy(logits),
                          torch.from_numpy(target).long())
    got = float(geo_scal_loss(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def _torch_sem_scal(pred, ssc_target):
    # restatement of reference semkitti.py:95-135
    pred = F.softmax(pred, dim=1)
    loss, count = 0, 0
    mask = ssc_target != 255
    for i in range(pred.shape[1]):
        p = pred[:, i][mask]
        target = ssc_target[mask]
        ct = (target == i).float()
        if ct.sum() > 0:
            count += 1.0
            nom = (p * ct).sum()
            lc = 0
            if p.sum() > 0:
                lc = lc + F.binary_cross_entropy(
                    nom / p.sum(), torch.ones(()))
            if ct.sum() > 0:
                lc = lc + F.binary_cross_entropy(
                    nom / ct.sum(), torch.ones(()))
            if (1 - ct).sum() > 0:
                spec = ((1 - p) * (1 - ct)).sum() / (1 - ct).sum()
                lc = lc + F.binary_cross_entropy(spec, torch.ones(()))
            loss = loss + lc
    return (loss / count).item()


def test_sem_scal_parity(rng):
    logits, target = _data(rng)
    ref = _torch_sem_scal(torch.from_numpy(logits),
                          torch.from_numpy(target).long())
    got = float(sem_scal_loss(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def _lovasz_oracle(probs, labels, ignore=255):
    """Dynamic-shape numpy restatement of lovasz_softmax (per_image=False,
    classes='present')."""
    valid = labels != ignore
    probs = probs[valid]
    labels = labels[valid]
    C = probs.shape[1]
    losses = []
    for c in range(C):
        fg = (labels == c).astype(np.float64)
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - probs[:, c])
        order = np.argsort(-errors)
        fg_sorted = fg[order]
        gts = fg_sorted.sum()
        inter = gts - np.cumsum(fg_sorted)
        union = gts + np.cumsum(1 - fg_sorted)
        jac = 1 - inter / union
        jac[1:] = jac[1:] - jac[:-1]
        losses.append(np.dot(errors[order], jac))
    return float(np.mean(losses))


def test_lovasz_parity(rng):
    logits, target = _data(rng, C=4, n=300)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    ref = _lovasz_oracle(probs.astype(np.float64), target)
    got = float(lovasz_softmax(jnp.asarray(probs), jnp.asarray(target)))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def _torch_mode_pool(target, ratio):
    t = torch.from_numpy(target).long()
    B, H, W, D = 1, *t.shape
    t = t[None]
    tv = t.reshape(B, H // ratio, ratio, W // ratio, ratio, D // ratio, ratio)
    tv = tv.permute(0, 1, 3, 5, 2, 4, 6).reshape(
        B, H // ratio, W // ratio, D // ratio, ratio ** 3)
    empty_mask = tv.sum(-1) == 0
    tv = tv.to(torch.int64)
    occ_space = tv[~empty_mask]
    occ_space[occ_space == 0] = -torch.arange(
        len(occ_space[occ_space == 0])) - 1
    tv[~empty_mask] = occ_space
    tv = torch.mode(tv, dim=-1)[0]
    tv[tv < 0] = 255
    return tv[0].numpy()


def test_mode_pool_parity(rng):
    target = rng.randint(0, 6, (8, 8, 4))
    target[rng.rand(8, 8, 4) < 0.5] = 0
    target[rng.rand(8, 8, 4) < 0.05] = 255
    ref = _torch_mode_pool(target, 2)
    got = np.asarray(mode_pool_gt(jnp.asarray(target[None]), 2,
                                  num_classes=6))[0]
    np.testing.assert_array_equal(got, ref)


def test_depth_loss_matches_torch(rng):
    B, N, H, W, D, ds = 1, 2, 16, 16, 8, 4
    gt = rng.uniform(0, 6, (B, N, H, W)).astype(np.float32)
    gt *= (rng.rand(B, N, H, W) > 0.4)
    prob = rng.rand(B, N, H // ds, W // ds, D).astype(np.float32)
    prob /= prob.sum(-1, keepdims=True)
    dbound = (1.0, 5.0, 0.5)

    # torch restatement (ViewTransformerLSSVoxel.py:31-71)
    g = torch.from_numpy(gt).view(B * N, H // ds, ds, W // ds, ds, 1)
    g = g.permute(0, 1, 3, 5, 2, 4).reshape(-1, ds * ds)
    g = torch.where(g == 0.0, 1e5 * torch.ones_like(g), g)
    g = g.min(dim=-1).values
    g = (g - (dbound[0] - dbound[2] / 2)) / dbound[2]
    g = torch.where((g < D + 1) & (g >= 0.0), g, torch.zeros_like(g))
    onehot = F.one_hot(g.long().view(-1), num_classes=D + 1)[:, 1:].float()
    preds = torch.from_numpy(prob).reshape(-1, D)
    fg = onehot.max(1).values > 0
    ref = (F.binary_cross_entropy(preds[fg], onehot[fg], reduction="none")
           .sum() / max(1.0, fg.sum())).item()

    got = float(bce_depth_loss(jnp.asarray(prob), jnp.asarray(gt), ds, dbound))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_kld_depth_loss_matches_torch(rng):
    """Oracle: torch transcription of get_klv_depth_loss +
    generate_guassian_depth_target (ViewTransformerLSSVoxel.py:73-87,
    utils/gaussian.py:92-135, constant_std branch)."""
    from coocc_tpu.losses.depth import kld_depth_loss

    B, N, H, W, ds = 1, 2, 16, 16, 4
    d0, d1, step = 1.0, 5.0, 0.5
    D = int((d1 - d0) / step)  # 8
    std = 0.5
    gt = rng.uniform(0, 6, (B, N, H, W)).astype(np.float32)
    gt *= (rng.rand(B, N, H, W) > 0.4)
    prob = rng.rand(B, N, H // ds, W // ds, D).astype(np.float32)
    prob /= prob.sum(-1, keepdims=True)

    # ---- torch oracle ----
    depth = torch.from_numpy(gt).flatten(0, 1)
    Bn, tH, tW = depth.shape
    h, w = tH // ds, tW // ds
    unfold = F.unfold(depth.unsqueeze(1), ds, dilation=1, padding=0,
                      stride=ds).view(Bn, -1, h, w).permute(0, 2, 3, 1)
    unfold = unfold.contiguous()
    valid = unfold != 0
    std_var = torch.ones((Bn, h, w)) * std
    unfold = unfold.clone()
    unfold[~valid] = 1e10
    min_depth = unfold.min(dim=-1).values
    min_depth = torch.where(min_depth == 1e10,
                            torch.zeros_like(min_depth), min_depth)
    xs = torch.arange(d0 - step / 2, d1, step)
    dist = torch.distributions.Normal(min_depth / step, std_var / step)
    cdfs = torch.stack([dist.cdf(i) for i in xs], dim=-1)
    labels = cdfs[..., 1:] - cdfs[..., :-1]

    vals = min_depth.view(-1)
    fg = (vals >= d0) & (vals <= d1 - step)
    labels_fg = labels.view(-1, D)[fg]
    preds_fg = torch.from_numpy(prob).reshape(-1, D)[fg]
    ref = F.kl_div(torch.log(preds_fg + 1e-4), labels_fg,
                   reduction="batchmean", log_target=False).item()

    got = float(kld_depth_loss(jnp.asarray(prob), jnp.asarray(gt), ds,
                               (d0, d1, step), constant_std=std))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_kld_dispatch_in_compute_losses(rng):
    """cfg.lss.loss_depth_type='kld' actually switches the loss branch."""
    import dataclasses
    from coocc_tpu.data.synthetic import tiny_config, synthetic_batch
    from coocc_tpu.models.losses import compute_losses

    cfg = dataclasses.replace(tiny_config(), loss_norm=False)
    cfgk = dataclasses.replace(
        cfg, lss=dataclasses.replace(cfg.lss, loss_depth_type="kld"))
    batch = synthetic_batch(cfg, batch_size=1, seed=0)
    D = cfg.grid.num_depth_bins
    B, N, H, W = batch.gt_depths.shape
    ds = cfg.lss.downsample
    prob = rng.rand(B, N, H // ds, W // ds, D).astype(np.float32)
    prob /= prob.sum(-1, keepdims=True)
    Xc = cfg.occ_size[0] // 2
    outs = {
        "depth_prob": jnp.asarray(prob),
        "occ": jnp.asarray(
            rng.randn(B, Xc, cfg.occ_size[1] // 2, cfg.occ_size[2] // 2,
                      cfg.occ_head.out_channel).astype(np.float32)),
    }
    l_bce = compute_losses(outs, batch, cfg)
    l_kld = compute_losses(outs, batch, cfgk)
    assert float(l_bce["loss_depth"]) != float(l_kld["loss_depth"])
