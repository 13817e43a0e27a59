"""Pallas tiled 2-NN kernel vs numpy brute force (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from coocc_tpu.ops.pallas.knn import knn2


def brute(queries, keys, qmask, kmask, thresh):
    Q = queries.shape[0]
    idx = np.full((Q, 2), -1, np.int32)
    valid_keys = np.where(kmask)[0]
    for q in range(Q):
        if not qmask[q]:
            continue
        d = np.linalg.norm(keys[valid_keys] - queries[q], axis=1)
        order = np.argsort(d, kind="stable")
        got = 0
        for o in order[:2]:
            if d[o] < thresh:
                idx[q, got] = valid_keys[o]
                got += 1
    return idx


def test_knn2_matches_bruteforce(rng):
    Q, K = 300, 700
    queries = rng.uniform(0, 50, (Q, 3)).astype(np.float32)
    keys = rng.uniform(0, 50, (K, 3)).astype(np.float32)
    qmask = rng.rand(Q) > 0.1
    kmask = rng.rand(K) > 0.1
    idx, dist = knn2(jnp.asarray(queries), jnp.asarray(keys),
                     jnp.asarray(qmask), jnp.asarray(kmask),
                     dist_thresh=13.3, interpret=True)
    idx = np.asarray(idx)
    ref = brute(queries, keys, qmask, kmask, 13.3)

    # compare by distance (equidistant ties may differ)
    def d_of(q, i):
        return np.inf if i < 0 else np.linalg.norm(keys[i] - queries[q])

    for q in range(Q):
        for s in range(2):
            np.testing.assert_allclose(d_of(q, idx[q, s]), d_of(q, ref[q, s]),
                                       rtol=1e-4, atol=1e-4)


def test_knn2_empty_keys(rng):
    queries = rng.uniform(0, 10, (50, 3)).astype(np.float32)
    keys = np.zeros((40, 3), np.float32)
    idx, _ = knn2(jnp.asarray(queries), jnp.asarray(keys),
                  jnp.ones(50, bool), jnp.zeros(40, bool), interpret=True)
    assert (np.asarray(idx) == -1).all()
