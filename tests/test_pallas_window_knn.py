"""Pallas VMEM-resident window-KNN == XLA plane reduction (interpret mode).

The kernel (ops/pallas/window_knn.py) replaces the HBM [O, X*Y*Z] shifted
plane tensor of ops/window_knn.py with an on-chip best-2 rank loop; results
must be bit-identical (exact integer reduction, unique ranks).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from coocc_tpu.ops.window_knn import make_offsets, window_knn


@pytest.mark.parametrize("shape,r", [
    ((10, 9, 4), (4, 4, 3)),
    ((20, 20, 8), (4, 4, 7)),   # flagship window radii
])
def test_pallas_window_knn_matches_xla(rng, monkeypatch, shape, r):
    X, Y, Z = shape
    mask = jnp.asarray(rng.rand(X, Y, Z) < 0.3)
    offs = make_offsets(*r, dist_thresh=13.3)

    ref = np.asarray(window_knn(mask, offs, k=2))
    monkeypatch.setenv("COOCC_PALLAS_KNN", "interpret")
    got = np.asarray(window_knn(mask, offs, k=2))
    np.testing.assert_array_equal(got, ref)


def test_pallas_window_knn_empty(monkeypatch):
    monkeypatch.setenv("COOCC_PALLAS_KNN", "interpret")
    mask = jnp.zeros((6, 5, 4), bool)
    offs = make_offsets(2, 2, 2, dist_thresh=13.3)
    got = np.asarray(window_knn(mask, offs, k=2))
    assert (got == -1).all()
