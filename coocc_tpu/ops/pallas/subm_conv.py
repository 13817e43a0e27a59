"""Pallas TPU kernel: fused packed-SubM 3x3 conv with cross-pack carries.

The packed LiDAR encoder (nn/sparse_enc_packed.py) computes each SubM 3x3x3
sparse-conv twin as a 2D conv over [B*bz, X, Y, p*C] whose input is EXTENDED
with two cross-pack carry lane groups (the z-neighbors living in adjacent
pack rows). Building that 192-lane extended tensor in XLA costs a ~3.7 ms /
492 MB concat per conv at the r50 res1 shapes — more than the conv itself
(1.8 ms at MXU peak for the 128 core lanes).

This kernel keeps the concat out of HBM: the host side only prepares a thin
carry array (pack-shifted slices, boundary-zeroed, lane-padded to a 128
multiple); the kernel DMAs the core slab + carry slab per (pack, x-tile,
y-tile), assembles the im2col matrix in VMEM ([9*pC core | 9*Cc carry]
column layout, every group 128-lane aligned), and runs one
[tx*ty, K] @ [K, pCo] MXU dot. DMAs are double-buffered across the
sequential TPU grid. Numerics match the XLA path exactly: bf16 operands,
fp32 accumulation, bf16 output.

Mosaic constraints honored (learned the hard way): EVERY lane-dim slice —
HBM DMA source, VMEM scratch window, im2col column write — must be a
multiple of 128 lanes at a multiple-of-128 offset. The 2C=64-lane carry
group therefore rides in a 128-lane padded slab (zero weight rows eat the
pad), and y-tile starts stay multiples of 8 for the (8, 128) sublane
tiling. The padding costs K = 9*(pC+128) = 2304 vs the true 1728 at C=32;
the XLA conv pays the same tile-rounding on its 192-lane input, so the
kernel's win is the avoided HBM concat, not MACs.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tiles(X: int, Y: int, ext: int) -> tuple:
    """(tx, ty): ty a multiple of 8, im2col under ~6 MB, minimal padding."""
    budget = 6_000_000 // (9 * ext * 2)

    def waste(t, S):
        return -(-S // t) * t - S

    ty = min((t for t in (40, 32, 24, 16, 8)
              if t <= budget), key=lambda t: (waste(t, Y), -t), default=8)
    tx_max = max(1, budget // ty)
    tx = min((t for t in (50, 40, 32, 25, 20, 16, 10, 8, 5, 4, 2, 1)
              if t <= tx_max), key=lambda t: (waste(t, X), -t), default=1)
    return tx, ty


def _kernel(x_hbm, car_hbm, w_ref, out_ref, core, carry, im2col, sems,
            *, nx, ny, tx, ty, pC, Cc):
    t = pl.program_id(0)
    n_t = pl.num_programs(0)

    def offsets(tt):
        g = tt // (nx * ny)
        r = tt % (nx * ny)
        return g, (r // ny) * tx, (r % ny) * ty

    def dmas(tt, slot):
        g, x0, y0 = offsets(tt)
        cp = pltpu.make_async_copy(
            x_hbm.at[g, pl.ds(x0, tx + 2), pl.ds(y0, ty + 8), :],
            core.at[slot], sems.at[slot, 0])
        cc = pltpu.make_async_copy(
            car_hbm.at[g, pl.ds(x0, tx + 2), pl.ds(y0, ty + 8), :],
            carry.at[slot], sems.at[slot, 1])
        return cp, cc

    def start(tt, slot):
        cp, cc = dmas(tt, slot)
        cp.start()
        cc.start()

    @pl.when(t == 0)
    def _():
        start(0, 0)

    @pl.when(t + 1 < n_t)
    def _():
        start(t + 1, (t + 1) % 2)

    slot = t % 2
    cp, cc = dmas(t, slot)
    cp.wait()
    cc.wait()

    kpad = im2col.shape[-1]
    base2 = 9 * pC
    for dx in range(3):
        for dy in range(3):
            k = dx * 3 + dy
            im2col[:, :, k * pC:(k + 1) * pC] = \
                core[slot, dx:dx + tx, dy:dy + ty, :]
            im2col[:, :, base2 + k * Cc:base2 + (k + 1) * Cc] = \
                carry[slot, dx:dx + tx, dy:dy + ty, :]

    acc = jnp.dot(im2col[:].reshape(tx * ty, kpad), w_ref[:],
                  preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(tx, ty, -1).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("bz", "C", "interpret"))
def subm_ext_conv(x_pb: jnp.ndarray, w_ext: jnp.ndarray, *, bz: int,
                  C: int, interpret: bool = False) -> jnp.ndarray:
    """Fused SubM ext conv: [B, bz, X, Y, pC] -> [B, bz, X, Y, pCo].

    x_pb:  packed activations, pC = p*C core lanes (pC must be a multiple
           of 128 — true at every encoder level: 4*32, 2*64, 1*128).
    w_ext: [3, 3, pC + 2C, pCo] extended weight (_subm_ext_weight, lane
           order [p*C core | C up-carry | C dn-carry]).
    Equals conv2d(shift_ext(x_pb), w_ext) -> astype(x.dtype), exactly.
    """
    B, bz_, X, Y, pC = x_pb.shape
    assert bz_ == bz
    assert pC % 128 == 0, pC
    ext = pC + 2 * C
    C2 = 2 * C
    Cc = -(-C2 // 128) * 128  # carry slab lanes, 128-aligned
    pCo = w_ext.shape[-1]
    assert w_ext.shape == (3, 3, ext, pCo), (w_ext.shape, ext, pCo)
    tx, ty = _pick_tiles(X, Y, pC + Cc)
    nx, ny = -(-X // tx), -(-Y // ty)
    G = B * bz

    # core: zero-pad spatial (+1 halo) out to the padded tile grid
    xg = x_pb.reshape(G, X, Y, pC).astype(jnp.bfloat16)
    xp = jnp.pad(xg, ((0, 0), (1, nx * tx + 1 - X), (1, ny * ty + 7 - Y),
                      (0, 0)))
    # carries: thin pack-shifted array (boundary packs zeroed), lanes
    # [up C | dn C | zero pad to Cc] so every DMA/write is 128-aligned
    up = jnp.pad(x_pb[:, 1:, ..., :C],
                 ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
    dn = jnp.pad(x_pb[:, :-1, ..., pC - C:],
                 ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
    car = jnp.concatenate([up, dn], -1).reshape(G, X, Y, C2)
    car = jnp.pad(car.astype(jnp.bfloat16),
                  ((0, 0), (1, nx * tx + 1 - X), (1, ny * ty + 7 - Y),
                   (0, Cc - C2)))

    # weight rows reordered to the kernel's column layout: 9 core groups
    # of pC rows, then 9 carry groups of Cc rows (real C2 + zero pad)
    kpad = 9 * pC + 9 * Cc
    w_core = w_ext[:, :, :pC, :].reshape(9 * pC, pCo)
    w_car = w_ext[:, :, pC:, :].reshape(3, 3, C2, pCo)
    w_car = jnp.pad(w_car, ((0, 0), (0, 0), (0, Cc - C2), (0, 0)))
    wf = jnp.concatenate([w_core, w_car.reshape(9 * Cc, pCo)],
                         0).astype(jnp.bfloat16)

    out = pl.pallas_call(
        partial(_kernel, nx=nx, ny=ny, tx=tx, ty=ty, pC=pC, Cc=Cc),
        grid=(G * nx * ny,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tx, ty, pCo),
            lambda t: (t, 0, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * nx * ny, tx, ty, pCo),
                                       x_pb.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tx + 2, ty + 8, pC), jnp.bfloat16),
            pltpu.VMEM((2, tx + 2, ty + 8, Cc), jnp.bfloat16),
            pltpu.VMEM((tx, ty, kpad), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(xp, car, wf)

    out = out.reshape(G, nx, ny, tx, ty, pCo)
    out = jnp.transpose(out, (0, 1, 3, 2, 4, 5)).reshape(
        G, nx * tx, ny * ty, pCo)
    return out[:, :X, :Y].reshape(B, bz, X, Y, pCo)
