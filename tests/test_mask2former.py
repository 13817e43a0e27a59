"""Mask2Former occupancy head: forward shapes, composition, matching loss."""
import jax
import jax.numpy as jnp
import numpy as np

from coocc_tpu.nn.mask2former_occ import (Mask2FormerOccHead, format_results,
                                          mask2former_occ_loss,
                                          sine_positional_encoding_3d)


def test_sine_pe_shape_and_range():
    pe = np.asarray(sine_positional_encoding_3d((4, 6, 2), 8))
    assert pe.shape == (4, 6, 2, 24)
    assert np.abs(pe).max() <= 1.0 + 1e-6
    # x-channel varies along x, constant along y/z
    assert np.abs(pe[0, 0, 0, :8] - pe[0, 5, 1, :8]).max() < 1e-6
    assert np.abs(pe[0, 0, 0, :8] - pe[3, 0, 0, :8]).max() > 1e-3


def _pyramid(rng, B=1, C=32):
    shapes = [(16, 16, 8), (8, 8, 4), (4, 4, 2), (2, 2, 1)]
    return [jnp.asarray(rng.randn(B, *s, C).astype(np.float32))
            for s in shapes]


def test_head_forward(rng):
    feats = _pyramid(rng)
    head = Mask2FormerOccHead(feat_channels=32, num_classes=5,
                              num_queries=8, num_heads=4,
                              num_decoder_layers=3, feedforward_channels=64)
    v = jax.jit(head.init, static_argnames="train")(
        jax.random.PRNGKey(0), feats, train=False)
    out = jax.jit(lambda v, f: head.apply(v, f, train=False))(v, feats)
    assert len(out["cls_preds"]) == 4 and len(out["mask_preds"]) == 4
    assert out["cls_preds"][-1].shape == (1, 8, 6)
    assert out["mask_preds"][-1].shape == (1, 8, 16, 16, 8)
    assert out["occ"].shape == (1, 16, 16, 8, 5)
    assert np.isfinite(np.asarray(out["occ"])).all()


def test_format_results_composition(rng):
    cls = jnp.asarray(rng.randn(1, 4, 3).astype(np.float32))
    mask = jnp.asarray(rng.randn(1, 4, 2, 2, 2).astype(np.float32))
    occ = np.asarray(format_results(cls, mask))
    ref = np.einsum(
        "bqc,bqxyz->bxyzc",
        np.asarray(jax.nn.softmax(cls, -1))[..., :-1],
        1.0 / (1.0 + np.exp(-np.asarray(mask))))
    np.testing.assert_allclose(occ, ref, rtol=1e-5, atol=1e-6)


def test_loss_prefers_correct_prediction(rng):
    """A prediction aligned with GT must cost less than a shuffled one."""
    X = Y = 4
    Z = 2
    gt = np.zeros((1, X, Y, Z), np.int64)
    gt[0, :2] = 1
    gt[0, 2:, 2:] = 2
    Q, NC = 4, 3

    good_mask = np.full((1, Q, X, Y, Z), -8.0, np.float32)
    good_mask[0, 0][gt[0] == 1] = 8.0
    good_mask[0, 1][gt[0] == 2] = 8.0
    good_mask[0, 2][gt[0] == 0] = 8.0
    good_cls = np.full((1, Q, NC + 1), -5.0, np.float32)
    good_cls[0, 0, 1] = 5.0
    good_cls[0, 1, 2] = 5.0
    good_cls[0, 2, 0] = 5.0
    good_cls[0, 3, NC] = 5.0

    bad_mask = -good_mask
    l_good = mask2former_occ_loss(jnp.asarray(good_cls),
                                  jnp.asarray(good_mask),
                                  jnp.asarray(gt), num_classes=NC)
    l_bad = mask2former_occ_loss(jnp.asarray(good_cls),
                                 jnp.asarray(bad_mask),
                                 jnp.asarray(gt), num_classes=NC)
    tot_good = sum(float(v) for v in l_good.values())
    tot_bad = sum(float(v) for v in l_bad.values())
    assert np.isfinite(tot_good) and np.isfinite(tot_bad)
    assert tot_good < tot_bad


def test_format_panoptic_results(rng):
    from coocc_tpu.nn.mask2former_occ import format_panoptic_results
    Q, NC = 3, 4
    cls = np.full((1, Q, NC + 1), -5.0, np.float32)
    cls[0, 0, 1] = 5.0   # thing class 1
    cls[0, 1, 1] = 5.0   # second instance of class 1
    cls[0, 2, 2] = 5.0   # stuff class 2
    mask = np.full((1, Q, 2, 2, 1), -5.0, np.float32)
    mask[0, 0, 0] = 5.0       # query 0 owns row x=0
    mask[0, 1, 1, 0] = 5.0    # query 1 owns (1, 0)
    mask[0, 2, 1, 1] = 5.0    # query 2 owns (1, 1)
    sem, pan = format_panoptic_results(jnp.asarray(cls), jnp.asarray(mask),
                                       thing_indices=(1,))
    assert sem.shape == (1, 2, 2, 1) and pan.shape == (1, 2, 2, 1)
    np.testing.assert_array_equal(sem[0, :, :, 0], [[1, 1], [1, 2]])
    assert pan[0, 1, 1, 0] == 2000          # stuff: label*1000
    thing_ids = {int(pan[0, 0, 0, 0]), int(pan[0, 1, 0, 0])}
    assert all(1000 < i < 2000 for i in thing_ids) and len(thing_ids) == 2


def test_forward_lidarseg_matches_torch_grid_sample():
    """Point sampling parity vs torch's 5-D grid_sample with the reference's
    coordinate swap (mask2former_nusc_occ.py:505-526)."""
    import torch
    import torch.nn.functional as F
    from coocc_tpu.nn.mask2former_occ import forward_lidarseg, format_results

    rng = np.random.RandomState(0)
    B, Q, X, Y, Z, NC = 1, 4, 5, 6, 7, 3
    cls = rng.randn(B, Q, NC + 1).astype(np.float32)
    mask = rng.randn(B, Q, X, Y, Z).astype(np.float32)
    pc_range = (-10.0, -8.0, -2.0, 10.0, 8.0, 4.0)
    pts = rng.uniform(-11, 11, size=(50, 4)).astype(np.float32)

    probs = np.asarray(forward_lidarseg(
        jnp.asarray(cls), jnp.asarray(mask), [pts], pc_range=pc_range))
    assert probs.shape == (50, NC)

    # torch oracle: format volume [B, C, X, Y, Z], grid (z, y, x) swap
    vol = np.asarray(format_results(jnp.asarray(cls), jnp.asarray(mask)))
    tvol = torch.from_numpy(vol).permute(0, 4, 1, 2, 3)
    lo = np.asarray(pc_range[:3], np.float32)
    span = np.asarray(pc_range[3:], np.float32) - lo
    g = (pts[:, :3] - lo) / span * 2 - 1
    tg = torch.from_numpy(g[:, ::-1].copy()).view(1, 1, 1, -1, 3)
    ref = F.grid_sample(tvol, tg, mode="bilinear", padding_mode="border",
                        align_corners=True)[0, :, 0, 0].T
    ref = torch.softmax(ref, dim=1).numpy()
    np.testing.assert_allclose(probs, ref, rtol=1e-5, atol=1e-5)

    # training path: labels -> scalar mIoU dict
    labels = rng.randint(0, NC, size=(50,))
    out = forward_lidarseg(jnp.asarray(cls), jnp.asarray(mask), [pts],
                           pc_range=pc_range, point_labels=[labels],
                           num_classes=NC)
    assert set(out) == {"point_mean_iou"} and np.isfinite(
        out["point_mean_iou"])


def test_all_layer_loss_aggregation():
    from coocc_tpu.nn.mask2former_occ import (mask2former_occ_loss,
                                              mask2former_occ_loss_all_layers)
    rng = np.random.RandomState(1)
    B, Q, X, Y, Z, NC = 1, 5, 4, 4, 2, 3
    stages = [(rng.randn(B, Q, NC + 1).astype(np.float32),
               rng.randn(B, Q, X, Y, Z).astype(np.float32))
              for _ in range(3)]
    gt = rng.randint(0, NC, size=(B, X, Y, Z)).astype(np.int64)
    gt[0, 0, 0, 0] = 255
    out = mask2former_occ_loss_all_layers(
        [c for c, _ in stages], [m for _, m in stages], gt, num_classes=NC)
    # last stage keeps plain names, earlier stages are d{i}.-prefixed
    assert {"loss_cls", "loss_mask", "loss_dice", "loss_total"} <= set(out)
    assert "d0.loss_cls" in out and "d1.loss_dice" in out
    last = mask2former_occ_loss(stages[-1][0], stages[-1][1], gt,
                                num_classes=NC)
    for k, v in last.items():
        np.testing.assert_allclose(float(out[k]), float(v), rtol=1e-6)
    total = sum(float(v) for k, v in out.items() if k != "loss_total")
    np.testing.assert_allclose(float(out["loss_total"]), total, rtol=1e-5)
