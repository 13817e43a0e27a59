"""Metrics: confusion-matrix math, summary tables, lidarseg readout."""
import numpy as np
import jax
import jax.numpy as jnp

from coocc_tpu.evaluation.ssc_metrics import (
    fast_hist, lidarseg_hist, occupancy_hists, scatter_fine_into_pred,
    ssc_summary,
)
from coocc_tpu.evaluation.formatting import cm_to_ious, format_ssc_table
from coocc_tpu.nn.occ_head import forward_lidarseg


def test_fast_hist_matches_bincount(rng):
    pred = rng.randint(0, 5, 1000)
    gt = rng.randint(0, 5, 1000)
    valid = rng.rand(1000) > 0.1
    got = np.asarray(fast_hist(jnp.asarray(pred), jnp.asarray(gt), 5,
                               jnp.asarray(valid)))
    ref = np.bincount(5 * gt[valid] + pred[valid], minlength=25).reshape(5, 5)
    np.testing.assert_array_equal(got, ref)


def test_ssc_summary_perfect_prediction(rng):
    gt = rng.randint(0, 4, (1, 8, 8, 4)).astype(np.int32)
    logits = jax.nn.one_hot(gt, 4) * 10.0
    sc, ssc = occupancy_hists(jnp.asarray(logits), jnp.asarray(gt), 4)
    s = ssc_summary(np.asarray(sc), np.asarray(ssc))
    assert s["SC_IoU"] == 1.0
    assert s["SSC_mIoU"] == 1.0
    lines = format_ssc_table(s, ["free", "a", "b", "c"])
    assert any("mIoU" in ln for ln in lines)


def test_occupancy_hists_upsamples_coarse(rng):
    gt = np.zeros((1, 8, 8, 4), np.int32)
    logits = rng.randn(1, 4, 4, 2, 3).astype(np.float32)  # half-res coarse
    sc, ssc = occupancy_hists(jnp.asarray(logits), jnp.asarray(gt), 3)
    assert int(np.asarray(ssc).sum()) == 8 * 8 * 4


def test_forward_lidarseg_reads_correct_cell():
    # single distinct-class voxel in a uniform background: a point at its
    # center must read that class (trilinear mixing can't outweigh it)
    X, Y, Z, C = 8, 8, 4, 5
    gt = np.zeros((X, Y, Z), np.int64)
    gt[2, 3, 1] = 3
    gt[5, 4, 2] = 4
    logits = np.asarray(jax.nn.one_hot(gt, C)) * 100.0
    pcr = (-4.0, -4.0, -2.0, 4.0, 4.0, 2.0)
    xs = np.linspace(-4, 4, X, endpoint=False) + 0.5
    ys = np.linspace(-4, 4, Y, endpoint=False) + 0.5
    zs = np.linspace(-2, 2, Z, endpoint=False) + 0.5
    pts = np.array([[xs[2], ys[3], zs[1], 0],
                    [xs[5], ys[4], zs[2], 0]], np.float32)[None]
    mask = np.ones((1, 2), bool)
    out = forward_lidarseg(jnp.asarray(logits)[None], jnp.asarray(pts),
                           jnp.asarray(mask), pcr)
    pred = np.argmax(np.asarray(out)[0], axis=-1)
    assert pred[0] == 3
    assert pred[1] == 4


def test_scatter_fine_into_pred(rng):
    B, P, C = 1, 6, 4
    fl = rng.randn(B, P, C).astype(np.float32)
    fc = np.stack([rng.randint(0, 4, (B, P)), rng.randint(0, 4, (B, P)),
                   rng.randint(0, 2, (B, P))], axis=-1)
    fv = np.ones((B, P), bool)
    grid = scatter_fine_into_pred(jnp.asarray(fl), jnp.asarray(fc),
                                  jnp.asarray(fv), (4, 4, 2))
    g = np.asarray(grid)
    x, y, z = fc[0, 0]
    np.testing.assert_allclose(g[0, x, y, z], fl[0, 0], rtol=1e-6)


def test_lidarseg_hist_excludes_class0(rng):
    logits = rng.randn(1, 50, 17).astype(np.float32)
    labels = rng.randint(1, 17, (1, 50))
    mask = np.ones((1, 50), bool)
    h = np.asarray(lidarseg_hist(jnp.asarray(logits), jnp.asarray(labels),
                                 jnp.asarray(mask), 17))
    assert h[:, 0].sum() == 0  # argmax over classes 1.. never predicts 0
    assert h.sum() == 50
