"""window_knn vs brute-force nearest-active-cell oracle."""
import numpy as np
import jax.numpy as jnp

from coocc_tpu.ops.window_knn import make_offsets, window_knn


def brute_force_knn(mask, k, dist_thresh):
    X, Y, Z = mask.shape
    actives = np.argwhere(mask)
    out = np.full((X, Y, Z, k), -1, np.int64)
    for x in range(X):
        for y in range(Y):
            for z in range(Z):
                if len(actives) == 0:
                    continue
                d = np.linalg.norm(actives - np.array([x, y, z]), axis=1)
                order = np.argsort(d, kind="stable")
                got = 0
                for o in order:
                    if d[o] >= dist_thresh:
                        break
                    c = actives[o]
                    out[x, y, z, got] = (c[0] * Y + c[1]) * Z + c[2]
                    got += 1
                    if got == k:
                        break
    return out


def test_window_knn_exact_when_covered(rng):
    X, Y, Z = 10, 9, 4
    mask = rng.rand(X, Y, Z) < 0.35  # dense enough that 2NN is within radius
    offs = make_offsets(4, 4, 3, dist_thresh=13.3)
    got = np.asarray(window_knn(jnp.asarray(mask), offs, k=2))
    ref = brute_force_knn(mask, 2, dist_thresh=13.3)

    # compare by distance (ties can pick different equidistant cells)
    def dist_of(idx, x, y, z):
        if idx < 0:
            return np.inf
        cx, cy, cz = idx // (Y * Z), (idx // Z) % Y, idx % Z
        return np.linalg.norm([cx - x, cy - y, cz - z])

    mismatches = 0
    for x in range(X):
        for y in range(Y):
            for z in range(Z):
                for s in range(2):
                    dg = dist_of(got[x, y, z, s], x, y, z)
                    dr = dist_of(ref[x, y, z, s], x, y, z)
                    if dr <= 4.0:  # inside the window radius -> must be exact
                        assert abs(dg - dr) < 1e-6, (x, y, z, s, dg, dr)
                    else:
                        mismatches += 1
    # out-of-window cases should be rare at this density
    assert mismatches < 0.02 * X * Y * Z * 2


def test_window_knn_empty_keys():
    mask = np.zeros((4, 4, 2), bool)
    offs = make_offsets(2, 2, 1, dist_thresh=13.3)
    got = np.asarray(window_knn(jnp.asarray(mask), offs, k=2))
    assert (got == -1).all()
