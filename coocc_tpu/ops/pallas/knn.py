"""Pallas TPU kernel: tiled brute-force 2-nearest-neighbor search.

The exact GSFusion KNN (BASELINE north star: "GSFusion's KNN camera-feature
lookup becomes a Pallas tiled top-k gather"): for each padded query point,
the indices of its 2 nearest valid key points under L2, with a distance
threshold. Complements coocc_tpu.ops.window_knn (exact only within its
window) — this kernel is exact over the full key set.

Tiling: grid = (query_tiles, key_tiles); the running best-2 per query lives
in VMEM scratch carried across the key-tile axis (the minor grid dimension,
iterated sequentially on TPU); distances use the |q-k|^2 expansion with the
cross term on the MXU. Interpret mode makes the same kernel testable on CPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QT = 256   # query tile
KT = 512   # key tile
BIG = 1e30


def _knn2_kernel(q_ref, k_ref, qmask_ref, kmask_ref, out_idx_ref,
                 out_dist_ref, best_d_ref, best_i_ref, *, dist_thresh):
    kt = pl.program_id(1)
    n_kt = pl.num_programs(1)

    @pl.when(kt == 0)
    def _():
        best_d_ref[:] = jnp.full_like(best_d_ref, BIG)
        best_i_ref[:] = jnp.full_like(best_i_ref, -1)

    q = q_ref[:]                       # [QT, 3]
    k = k_ref[:]                       # [KT, 3]
    kmask = kmask_ref[:]               # [KT]

    # squared distances [QT, KT] with the cross term on the MXU
    qq = jnp.sum(q * q, axis=1, keepdims=True)           # [QT, 1]
    kk = jnp.sum(k * k, axis=1, keepdims=True).T          # [1, KT]
    cross = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # [QT, KT]
    d2 = qq + kk - 2.0 * cross
    d2 = jnp.where(kmask[None, :], d2, BIG)

    key_base = kt * KT
    col_ids = key_base + jax.lax.broadcasted_iota(jnp.int32, (QT, KT), 1)

    # tile-local top-2
    m1 = jnp.min(d2, axis=1)                              # [QT]
    a1 = jnp.argmin(d2, axis=1).astype(jnp.int32)
    d2b = jnp.where(col_ids == (key_base + a1)[:, None], BIG, d2)
    m2 = jnp.min(d2b, axis=1)
    a2 = jnp.argmin(d2b, axis=1).astype(jnp.int32)
    i1 = key_base + a1
    i2 = key_base + a2

    # merge (m1, m2) with the carried best-2 — sort 4 candidates
    bd1 = best_d_ref[:, 0]
    bd2 = best_d_ref[:, 1]
    bi1 = best_i_ref[:, 0]
    bi2 = best_i_ref[:, 1]

    # candidate lists are each internally sorted: (bd1<=bd2), (m1<=m2)
    # new first = min(bd1, m1)
    take_new1 = m1 < bd1
    nd1 = jnp.where(take_new1, m1, bd1)
    ni1 = jnp.where(take_new1, i1, bi1)
    # new second = min(max(bd1, m1), min(bd2, m2))
    other1 = jnp.where(take_new1, bd1, m1)
    oidx1 = jnp.where(take_new1, bi1, i1)
    cand2d = jnp.minimum(m2, bd2)
    cand2i = jnp.where(m2 < bd2, i2, bi2)
    use_other1 = other1 < cand2d
    nd2 = jnp.where(use_other1, other1, cand2d)
    ni2 = jnp.where(use_other1, oidx1, cand2i)

    best_d_ref[:, 0] = nd1
    best_d_ref[:, 1] = nd2
    best_i_ref[:, 0] = ni1
    best_i_ref[:, 1] = ni2

    @pl.when(kt == n_kt - 1)
    def _():
        qmask = qmask_ref[:]
        d = best_d_ref[:]
        i = best_i_ref[:]
        valid = (d < dist_thresh * dist_thresh) & qmask[:, None]
        out_idx_ref[:] = jnp.where(valid, i, -1)
        out_dist_ref[:] = jnp.sqrt(jnp.maximum(d, 0.0))


def knn2(queries, keys, query_mask, key_mask, dist_thresh=13.3,
         interpret=False):
    """Exact 2-NN: queries [Q, 3], keys [K, 3] (padded, masked).

    Returns (idx [Q, 2] int32 with -1 invalid, dist [Q, 2] f32).
    Q and K are padded up to tile multiples internally.
    """
    Q, K = queries.shape[0], keys.shape[0]
    Qp = -(-Q // QT) * QT
    Kp = -(-K // KT) * KT
    qp = jnp.pad(queries.astype(jnp.float32), ((0, Qp - Q), (0, 0)))
    kp = jnp.pad(keys.astype(jnp.float32), ((0, Kp - K), (0, 0)))
    qm = jnp.pad(query_mask, (0, Qp - Q))
    km = jnp.pad(key_mask, (0, Kp - K))

    grid = (Qp // QT, Kp // KT)
    out_idx, out_dist = pl.pallas_call(
        partial(_knn2_kernel, dist_thresh=dist_thresh),
        grid=grid,
        in_specs=[
            pl.BlockSpec((QT, 3), lambda qi, ki: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, 3), lambda qi, ki: (ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QT,), lambda qi, ki: (qi,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KT,), lambda qi, ki: (ki,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((QT, 2), lambda qi, ki: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QT, 2), lambda qi, ki: (qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Qp, 2), jnp.int32),
            jax.ShapeDtypeStruct((Qp, 2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((QT, 2), jnp.float32),
            pltpu.VMEM((QT, 2), jnp.int32),
        ],
        interpret=interpret,
    )(qp, kp, qm, km)
    return out_idx[:Q], out_dist[:Q]
