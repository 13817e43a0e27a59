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
