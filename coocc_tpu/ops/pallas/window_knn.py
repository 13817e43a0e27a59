"""Pallas TPU kernel: VMEM-resident best-2 window rank reduction (GSFusion).

The XLA window_knn (ops/window_knn.py) materializes all (2rx+1)(2ry+1)(2rz+1)
shifted activity planes in HBM — ~[1215, X*Y*Z] i16 at the flagship grid,
hundreds of MB of traffic per modality for what is arithmetically a ~0.5 ms
VPU job. This kernel keeps the reduction on-chip.

Layout (the round-2 version dynamically sliced sublanes and failed Mosaic's
"index multiple of 8" rule; this one has NO dynamic slicing at all):

  * host (XLA) builds (2rx+1)*(2ry+1) pre-shifted copies of the key mask,
    one per (dx, dy): rows = padded z (2rz+1+Z-1 rows), lanes = flattened
    core (x, y). A (dx, dy, dz) window plane is then a STATIC row slice
    [dz+rz : dz+rz+Z] of copy (dx, dy) — x/y shifts were baked in by XLA
    where shifted slices are free;
  * the kernel runs one grid step per copy; the Pallas pipeline DMAs the
    next copy while the current one reduces (double-buffered automatically);
  * per step: an unrolled loop over the 2rz+1 z-offsets updates the running
    exact best-2 distance-ranks (b2 = min(b2, max(b1, v)); b1 = min(b1, v)
    — order-free over unique ranks), carried in VMEM scratch across steps.

Output: best1/best2 distance-ranks per cell ([Z, lanes] i32, garbage in the
pad lanes); the rank->neighbour-id conversion stays in XLA
(ops/window_knn.py). Numerics identical to the XLA reduction.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(rank_ref, rot_ref, out1_ref, out2_ref, b1_ref, b2_ref,
            *, Z, n_dz, BIG):
    j = pl.program_id(0)
    n_j = pl.num_programs(0)

    @pl.when(j == 0)
    def _():
        b1_ref[:] = jnp.full(b1_ref.shape, BIG, jnp.int32)
        b2_ref[:] = jnp.full(b2_ref.shape, BIG, jnp.int32)

    for dz in range(n_dz):  # static unroll: all slices static
        r = rank_ref[j * n_dz + dz]
        win = rot_ref[0, dz:dz + Z, :]
        # explicit i8 -> i32 upcast: Mosaic rejects the relayout of an i1
        # mask born in the packed (32,128) i8 tiling against i32 operands
        v = jnp.where(win.astype(jnp.int32) != 0, r, BIG)
        b1 = b1_ref[:]
        b2 = b2_ref[:]
        b2_ref[:] = jnp.minimum(b2, jnp.maximum(b1, v))
        b1_ref[:] = jnp.minimum(b1, v)

    @pl.when(j == n_j - 1)
    def _():
        out1_ref[:] = b1_ref[:]
        out2_ref[:] = b2_ref[:]


@partial(jax.jit, static_argnames=("rx", "ry", "rz", "O", "interpret"))
def _best2_ranks(key_mask: jnp.ndarray, ranks: jnp.ndarray, *, rx: int,
                 ry: int, rz: int, O: int, interpret: bool = False):
    """key_mask [X, Y, Z] bool, ranks [(2rx+1)(2ry+1)(2rz+1)] i32 rank table
    (O = clipped) -> (best1, best2) [X, Y, Z] i32 distance-ranks (O where
    none active)."""
    X, Y, Z = key_mask.shape
    n_dz = 2 * rz + 1
    n_xy = (2 * rx + 1) * (2 * ry + 1)
    Zrows = Z + 2 * rz            # rows needed per copy
    Rp = -(-Zrows // 32) * 32     # i8 native sublane tile is 32
    lanes = -(-(X * Y) // 128) * 128

    # ONE transpose to z-major, then each (dx, dy) copy is a strided slice
    # + pad; int8 keeps the copy tensor (the kernel's whole HBM traffic)
    # 4x smaller than i32
    m = jnp.pad(key_mask.astype(jnp.int8),
                ((rx, rx), (ry, ry), (rz, rz)))
    mz = jnp.transpose(m, (2, 0, 1))          # [Zrows, Xp, Yp]
    copies = []
    for a in range(2 * rx + 1):
        for b in range(2 * ry + 1):
            sh = mz[:, a:a + X, b:b + Y].reshape(Zrows, X * Y)
            copies.append(jnp.pad(sh, ((0, Rp - Zrows),
                                       (0, lanes - X * Y))))
    rot = jnp.stack(copies)  # [n_xy, Rp, lanes] i8

    b1, b2 = pl.pallas_call(
        partial(_kernel, Z=Z, n_dz=n_dz, BIG=O),
        grid=(n_xy,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Rp, lanes), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((Z, lanes), jnp.int32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((Z, lanes), jnp.int32),
            pltpu.VMEM((Z, lanes), jnp.int32),
        ],
        interpret=interpret,
    )(ranks, rot)

    def core(b):
        return jnp.transpose(b[:, :X * Y].reshape(Z, X, Y), (1, 2, 0))

    return core(b1), core(b2)


def window_knn_best2(key_mask, offsets: np.ndarray, *, interpret=False):
    """Drop-in provider of the (best1, best2) ranks for ops.window_knn.

    key_mask: [X, Y, Z] bool; offsets: [O, 3] int numpy (make_offsets).
    Returns (best1, best2) [X, Y, Z] i32 with O = "no active in window".
    """
    rx, ry, rz = [int(np.abs(offsets[:, i]).max()) for i in range(3)]
    O = offsets.shape[0]
    # rank table [(2rx+1)(2ry+1), 2rz+1]: distance-rank of each (dx, dy,
    # dz); O for window cells clipped by dist_thresh (no offset row)
    table = np.full(((2 * rx + 1) * (2 * ry + 1), 2 * rz + 1), O, np.int32)
    for o, (dx, dy, dz) in enumerate(np.asarray(offsets)):
        table[(dx + rx) * (2 * ry + 1) + (dy + ry), dz + rz] = o
    return _best2_ranks(key_mask, jnp.asarray(table.reshape(-1)),
                        rx=rx, ry=ry, rz=rz, O=O, interpret=interpret)
