"""Pallas TPU kernel: VMEM-resident best-2 window rank reduction (GSFusion).

The XLA window_knn (ops/window_knn.py) materializes all (2rx+1)(2ry+1)(2rz+1)
shifted activity planes in HBM — ~[1215, X*Y*Z] i16 at the flagship grid,
hundreds of MB of traffic per modality for what is arithmetically a ~0.5 ms
VPU job. This kernel keeps everything on-chip:

  * the padded key mask is laid out [Zp*Xp rows, Yp lanes] and pre-shifted
    into 2ry+1 lane-rotated copies (built host-side in XLA, a few MB);
  * the kernel loops over the O distance-sorted offsets; each (dx, dy, dz)
    is ONE contiguous dynamic-sublane slice of the ROT[dy] copy — rows
    s = (z+dz+rz)*Xp + (x+dx+rx) for the whole core (z, x) range are a
    single run of Z*Xp rows because x+dx+rx < Xp always holds;
  * per offset: v = where(active, rank_o, BIG); b2 = min(b2, max(b1, v));
    b1 = min(b1, v) — running exact best-2 over unique ranks, any order.

Output: best1/best2 distance-ranks per cell ([Z*Xp, lanes] i32, garbage in
the pad rows/lanes); the rank->neighbour-id conversion stays in XLA
(ops/window_knn.py). Numerics identical to the XLA reduction.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(dyj_ref, soff_ref, rank_ref, rot_ref, b1_ref, b2_ref,
            *, O, ZX, BIG):
    b1_ref[:] = jnp.full(b1_ref.shape, BIG, jnp.int32)
    b2_ref[:] = jnp.full(b2_ref.shape, BIG, jnp.int32)

    def body(o, _):
        j = dyj_ref[o]
        s0 = soff_ref[o]
        r = rank_ref[o]
        win = rot_ref[j, pl.ds(s0, ZX), :]
        v = jnp.where(win != 0, r, BIG)
        b1 = b1_ref[:]
        b2 = b2_ref[:]
        b2_ref[:] = jnp.minimum(b2, jnp.maximum(b1, v))
        b1_ref[:] = jnp.minimum(b1, v)
        return 0

    jax.lax.fori_loop(0, O, body, 0)


@partial(jax.jit, static_argnames=("rx", "ry", "rz", "interpret"))
def _best2_ranks(key_mask: jnp.ndarray, offsets: jnp.ndarray, *, rx: int,
                 ry: int, rz: int, interpret: bool = False):
    """key_mask [X, Y, Z] bool, offsets [O, 3] i32 (distance-sorted) ->
    (best1, best2) [X, Y, Z] i32 distance-ranks (O where none active)."""
    X, Y, Z = key_mask.shape
    O = offsets.shape[0]
    Xp = X + 2 * rx
    Yp = Y + 2 * ry
    Zp = Z + 2 * rz

    # [Z, X, Y] z-major, padded; lanes = y
    m = jnp.transpose(key_mask, (2, 0, 1)).astype(jnp.int8)
    m = jnp.pad(m, ((rz, rz), (rx, rx), (ry, ry)))
    lanes = -(-Yp // 128) * 128
    # ROT[j][s, y] = padded[s, y + j] for j in [0, 2ry]
    m2 = jnp.pad(m.reshape(Zp * Xp, Yp), ((0, 0), (0, lanes + 2 * ry - Yp)))
    rot = jnp.stack([m2[:, j:j + lanes] for j in range(2 * ry + 1)])

    dyj = (offsets[:, 1] + ry).astype(jnp.int32)
    soff = ((offsets[:, 2] + rz) * Xp + offsets[:, 0] + rx).astype(jnp.int32)
    rank = jnp.arange(O, dtype=jnp.int32)
    ZX = Z * Xp

    b1, b2 = pl.pallas_call(
        partial(_kernel, O=O, ZX=ZX, BIG=O),
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((ZX, lanes), jnp.int32)] * 2,
        interpret=interpret,
    )(dyj, soff, rank, rot)

    def core(b):
        return jnp.transpose(b.reshape(Z, Xp, lanes)[:, :X, :Y], (1, 2, 0))

    return core(b1), core(b2)


def window_knn_best2(key_mask, offsets: np.ndarray, *, interpret=False):
    """Drop-in provider of the (best1, best2) ranks for ops.window_knn.

    key_mask: [X, Y, Z] bool; offsets: [O, 3] int numpy (make_offsets).
    Returns (best1, best2) [X, Y, Z] i32 with O = "no active in window".
    """
    rx, ry, rz = [int(np.abs(offsets[:, i]).max()) for i in range(3)]
    return _best2_ranks(key_mask, jnp.asarray(offsets, jnp.int32),
                        rx=rx, ry=ry, rz=rz, interpret=interpret)
