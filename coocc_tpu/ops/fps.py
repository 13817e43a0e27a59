"""Furthest-point sampling + ball query + gather (TPU-native point ops).

Capability parity with the reference's CUDA point ops the GSFusion fuser is
built on (reference: mmdetection3d/mmdet3d/ops/furthest_point_sample/src/*.cu
wrapped at furthest_point_sample/furthest_point_sample.py; ball_query/src/
ball_query_cuda.cu; gather_points/src/*.cu; used by BiFuser_N.fps_NN_fast,
coocc/fuser/bifuser_n.py:38-125).

The shipped TPU fuser computes the exact grid-window KNN instead
(ops/window_knn.py — SURVEY §7 decision 5), but these ops reproduce the
reference's FPS-cluster approximation for capability parity and for any
downstream use (e.g. point-cloud subsampling): all static-shape, scan-based,
mask-aware.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def furthest_point_sample(points: jnp.ndarray, mask: jnp.ndarray,
                          num_samples: int) -> jnp.ndarray:
    """Iterative FPS over a padded point set.

    Args:
      points: [P, 3] float coordinates.
      mask:   [P] bool validity (padding rows are never selected).
      num_samples: static number of samples S.

    Returns: [S] int32 indices into `points` (the CUDA op's semantics: the
      first selected point is index 0 — reference
      furthest_point_sample_cuda seeds with point 0; invalid-only inputs
      yield index 0 repeated).
    """
    P = points.shape[0]
    big = jnp.float32(1e10)
    first = jnp.argmax(mask)  # first valid point (CUDA seeds slot 0)

    def body(carry, _):
        min_d2, last = carry
        diff = points - points[last]
        d2 = jnp.sum(diff * diff, axis=-1)
        min_d2 = jnp.minimum(min_d2, d2)
        scored = jnp.where(mask, min_d2, -1.0)
        nxt = jnp.argmax(scored).astype(jnp.int32)
        return (min_d2, nxt), last

    (_, _), idx = jax.lax.scan(
        body, (jnp.full((P,), big), first.astype(jnp.int32)), None,
        length=num_samples)
    return idx.astype(jnp.int32)


def ball_query(centers: jnp.ndarray, points: jnp.ndarray, mask: jnp.ndarray,
               radius: float, num_samples: int) -> jnp.ndarray:
    """Fixed-radius neighbour gather (reference ball_query semantics).

    For each center, up to `num_samples` indices of points within `radius`;
    slots beyond the found count repeat the FIRST found index (the CUDA
    kernel's fill rule, ball_query_cuda.cu); centers with no neighbour get
    index 0.

    centers: [Q, 3]; points: [P, 3]; mask: [P] bool. Returns [Q, S] int32.
    """
    d2 = jnp.sum(
        (centers[:, None, :] - points[None, :, :]) ** 2, axis=-1)  # [Q, P]
    inside = (d2 < radius * radius) & mask[None, :]
    P = points.shape[0]
    order = jnp.where(inside, jnp.arange(P, dtype=jnp.int32)[None, :], P)
    # first `num_samples` hits in point order = smallest indices
    k = min(num_samples, P)
    hits = -jax.lax.top_k(-order, k)[0]  # ascending [Q, k]
    if k < num_samples:
        hits = jnp.pad(hits, ((0, 0), (0, num_samples - k)),
                       constant_values=P)
    valid = hits < P
    first = jnp.where(valid[:, 0], hits[:, 0], 0)
    return jnp.where(valid, hits, first[:, None]).astype(jnp.int32)


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """[P, C] features gathered at [...] int indices (reference gather_points)."""
    return points[idx]
