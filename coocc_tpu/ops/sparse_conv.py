"""TPU-native sparse 3D convolution: gather-GEMM-scatter with static shapes.

Replaces spconv (reference: vendored mmdet3d/ops/spconv CUDA + external
spconv 2.x used by SparseLiDAREnc8x/4x, sparse_lidar_enc.py:10-11) with a
pure-XLA design:

  * A sparse tensor is a fixed-capacity list of sorted linear voxel ids +
    a [A, C] feature matrix + a validity mask (`SparseTensor`).
  * A "rulebook" [A, K^3] maps each (site, kernel-offset) -> input row (or a
    dummy row A), built once per indice_key — the XLA analog of spconv's
    indice-pair build — via a dense cell-id -> row LUT (one scatter + one
    gather; a binary-search variant exists as fallback), reused across
    layers sharing the key.
  * The conv itself is ONE MXU matmul per layer: gather neighbors to
    [A, K^3 * Cin] and multiply by the [K^3 * Cin, Cout] reshaped weight —
    exactly spconv's gather-GEMM-scatter collapsed into a dense GEMM over
    the capacity dimension (padding rows compute zeros and are masked).

Submanifold conv (SubMConv3d) keeps the input active set; regular strided
SparseConv3d dilates it — output sites are the unique covered sites, computed
with a sort-unique under a static capacity.

Weight layout convention: [K, K, K, Cin, Cout] with kernel axes ordered
(kx, ky, kz) and offset = index - center, matching the xyz coordinate order
used throughout this package (the checkpoint converter permutes torch/spconv
layouts into this).
"""
from __future__ import annotations

import itertools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .voxelize import delinearize, linearize


class SparseTensor(NamedTuple):
    """Fixed-capacity sparse voxel tensor (single sample).

    ids:      [A] int32 sorted linear ids; padding = num_cells(grid).
    features: [A, C] float.
    mask:     [A] bool.
    """
    ids: jnp.ndarray
    features: jnp.ndarray
    mask: jnp.ndarray


def num_cells(grid_size) -> int:
    nx, ny, nz = [int(g) for g in grid_size]
    return nx * ny * nz


def _kernel_offsets(kernel_size: int) -> jnp.ndarray:
    """[K^3, 3] xyz offsets, x-major enumeration, offset = idx - center."""
    r = kernel_size // 2
    offs = list(itertools.product(range(-r, r + 1), repeat=3))
    return jnp.array(offs, jnp.int32)


def _as3(v) -> Tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    return tuple(int(x) for x in v)


def conv_output_shape(grid_size, kernel, stride, padding) -> Tuple[int, int, int]:
    k, s, p = _as3(kernel), _as3(stride), _as3(padding)
    return tuple((int(g) + 2 * p[i] - k[i]) // s[i] + 1
                 for i, g in enumerate(grid_size))


def _kernel_taps(kernel) -> jnp.ndarray:
    """[K3, 3] raw tap indices (0..k-1 per axis), x-major enumeration."""
    k = _as3(kernel)
    taps = list(itertools.product(range(k[0]), range(k[1]), range(k[2])))
    return jnp.array(taps, jnp.int32)


# grids with more cells than this use binary search instead of a dense LUT
_LUT_MAX_CELLS = 4_000_000


def make_lut(ids: jnp.ndarray, mask: jnp.ndarray, n_cells: int) -> jnp.ndarray:
    """Dense cell-id -> row lookup table ([n_cells + 1] int32, missing -> A).

    One scatter builds it; every subsequent rulebook lookup is a single
    gather. (A binary-search lookup generated ~50x more code and modeled
    memory traffic on TPU — the dense LUT costs n_cells*4 bytes once per
    level and is reused by all layers sharing the level.)
    """
    A = ids.shape[0]
    lut = jnp.full((n_cells + 1,), A, jnp.int32)
    safe_ids = jnp.where(mask, ids, n_cells)
    return lut.at[safe_ids].set(jnp.arange(A, dtype=jnp.int32), mode="drop")


def lookup(ids: jnp.ndarray, queries: jnp.ndarray,
           queries_valid: jnp.ndarray,
           lut: Optional[jnp.ndarray] = None,
           n_cells: Optional[int] = None,
           mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Find each query id's row among `ids`; invalid/missing -> A.

    With a dense LUT (preferred): one gather. Fallback: binary search over
    the sorted ids.
    """
    A = ids.shape[0]
    if lut is None and n_cells is not None:
        if mask is None:
            mask = ids < n_cells
        lut = make_lut(ids, mask, n_cells)
    if lut is not None:
        nc = lut.shape[0] - 1
        q = jnp.where(queries_valid, queries, nc)
        return lut[jnp.clip(q, 0, nc)]
    pos = jnp.searchsorted(ids, queries, side="left")
    pos_c = jnp.minimum(pos, A - 1)
    found = (ids[pos_c] == queries) & queries_valid & (pos < A)
    return jnp.where(found, pos_c, A).astype(jnp.int32)


def build_subm_rulebook(sp: SparseTensor, grid_size,
                        kernel_size: int = 3) -> jnp.ndarray:
    """[A, K^3] rulebook for submanifold conv (out sites == in sites)."""
    offs = _kernel_offsets(kernel_size)  # [K3, 3]
    coords = delinearize(sp.ids, grid_size)  # [A, 3]
    ncoords = coords[:, None, :] + offs[None, :, :]  # [A, K3, 3]
    ng = jnp.array([int(g) for g in grid_size], jnp.int32)
    inb = jnp.all((ncoords >= 0) & (ncoords < ng), axis=-1)
    nids = linearize(ncoords, grid_size)
    valid = inb & sp.mask[:, None]
    nc = num_cells(grid_size)
    # dense LUT only for small grids: a gather from a large operand costs
    # ~operand_size x (queries/8K) on TPU, so for big grids binary search
    # over the [A] sorted ids is far cheaper
    if nc <= _LUT_MAX_CELLS:
        return lookup(sp.ids, jnp.where(valid, nids, nc), valid,
                      n_cells=nc, mask=sp.mask)
    return lookup(sp.ids, jnp.where(valid, nids, nc), valid)


def downsample_sites(sp: SparseTensor, grid_size, out_grid_size,
                     out_capacity: int, kernel=3, stride=2,
                     padding=1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Active output sites of a strided sparse conv (general k/s/p per axis).

    Output j reads inputs i = j*s + tap - p (tap in [0, k)), so an active
    input i covers outputs j in [ceil((i + p - k + 1)/s), (i + p)//s] —
    ceil(k/s) candidates per axis. Returns sorted unique output ids under
    the static capacity (+ mask). Overflow drops the largest ids.
    """
    k, s, p = _as3(kernel), _as3(stride), _as3(padding)
    ncand = [-(-k[i] // s[i]) for i in range(3)]  # ceil(k/s) per axis

    coords = delinearize(sp.ids, grid_size)  # [A, 3]
    ng_out = jnp.array([int(g) for g in out_grid_size], jnp.int32)

    per_axis = []
    for ax in range(3):
        i = coords[:, ax]
        num = i + p[ax] - k[ax] + 1
        j_lo = -((-num) // s[ax])  # ceil(num / s)
        j_hi = (i + p[ax]) // s[ax]
        cand = j_lo[:, None] + jnp.arange(ncand[ax])[None, :]
        ok = (cand <= j_hi[:, None]) & (cand >= 0) & (cand < ng_out[ax])
        per_axis.append((cand, ok))

    (cx, okx), (cy, oky), (cz, okz) = per_axis
    A = coords.shape[0]
    n0, n1, n2 = ncand
    ccoords = jnp.stack([
        jnp.broadcast_to(cx[:, :, None, None], (A, n0, n1, n2)),
        jnp.broadcast_to(cy[:, None, :, None], (A, n0, n1, n2)),
        jnp.broadcast_to(cz[:, None, None, :], (A, n0, n1, n2)),
    ], axis=-1).reshape(-1, 3)
    ok = (okx[:, :, None, None] & oky[:, None, :, None]
          & okz[:, None, None, :]).reshape(-1)
    valid = ok & jnp.repeat(sp.mask, n0 * n1 * n2)
    sentinel = num_cells(out_grid_size)
    cids = jnp.where(valid, linearize(jnp.clip(ccoords, 0, None),
                                      out_grid_size), sentinel)

    cids_sorted = jnp.sort(cids)
    is_first = jnp.concatenate(
        [jnp.array([True]), cids_sorted[1:] != cids_sorted[:-1]]
    ) & (cids_sorted < sentinel)
    seg = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    seg = jnp.where(cids_sorted < sentinel, seg, out_capacity)
    out_ids = jax.ops.segment_min(
        jnp.where(is_first, cids_sorted, sentinel), seg, out_capacity + 1,
        indices_are_sorted=True,
    )[:out_capacity]
    n_unique = jnp.sum(is_first.astype(jnp.int32))
    out_mask = jnp.arange(out_capacity) < jnp.minimum(n_unique, out_capacity)
    out_ids = jnp.where(out_mask, out_ids, sentinel).astype(jnp.int32)
    return out_ids, out_mask


def build_strided_rulebook(in_sp: SparseTensor, out_ids, out_mask, grid_size,
                           out_grid_size, kernel=3, stride=2,
                           padding=1) -> jnp.ndarray:
    """[A_out, prod(k)] rulebook: input coord = out*s + tap - p per axis."""
    k, s, p = _as3(kernel), _as3(stride), _as3(padding)
    taps = _kernel_taps(k)  # [K3, 3]
    sv = jnp.array(s, jnp.int32)
    pv = jnp.array(p, jnp.int32)
    ocoords = delinearize(out_ids, out_grid_size)
    icoords = ocoords[:, None, :] * sv + taps[None, :, :] - pv
    ng = jnp.array([int(g) for g in grid_size], jnp.int32)
    inb = jnp.all((icoords >= 0) & (icoords < ng), axis=-1)
    iids = linearize(jnp.clip(icoords, 0, None), grid_size)
    valid = inb & out_mask[:, None]
    nc = num_cells(grid_size)
    if nc <= _LUT_MAX_CELLS:
        return lookup(in_sp.ids, jnp.where(valid, iids, nc), valid,
                      n_cells=nc, mask=in_sp.mask)
    return lookup(in_sp.ids, jnp.where(valid, iids, nc), valid)


def apply_conv(features: jnp.ndarray, mask: jnp.ndarray, rulebook: jnp.ndarray,
               weight: jnp.ndarray, out_mask: jnp.ndarray) -> jnp.ndarray:
    """Gather-GEMM: one MXU matmul per layer.

    features: [A_in, Cin]; rulebook: [A_out, K3] (A_in = dummy);
    weight: [K3, Cin, Cout]. Returns [A_out, Cout] (masked).
    """
    A_in, Cin = features.shape
    K3 = rulebook.shape[1]
    feats_pad = jnp.concatenate(
        [features * mask[:, None], jnp.zeros((1, Cin), features.dtype)], axis=0
    )
    gathered = feats_pad[rulebook]  # [A_out, K3, Cin]
    out = jax.lax.dot_general(
        gathered.reshape(-1, K3 * Cin),
        weight.reshape(K3 * Cin, -1),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out * out_mask[:, None]


def subm_conv(sp: SparseTensor, rulebook: jnp.ndarray,
              weight: jnp.ndarray) -> SparseTensor:
    out = apply_conv(sp.features, sp.mask, rulebook, weight, sp.mask)
    return SparseTensor(ids=sp.ids, features=out.astype(sp.features.dtype),
                        mask=sp.mask)


def to_dense(sp: SparseTensor, grid_size) -> jnp.ndarray:
    """Densify to [nx, ny, nz, C] (channels-last, xyz order)."""
    nx, ny, nz = [int(g) for g in grid_size]
    C = sp.features.shape[-1]
    flat = jnp.zeros((nx * ny * nz + 1, C), sp.features.dtype)
    ids = jnp.where(sp.mask, sp.ids, nx * ny * nz)
    flat = flat.at[ids].add(sp.features * sp.mask[:, None])
    return flat[:-1].reshape(nx, ny, nz, C)


def from_dense(x: jnp.ndarray, capacity: int) -> SparseTensor:
    """Dense [nx, ny, nz, C] -> SparseTensor of nonzero sites (sum over C != 0).

    Sites are ranked by linear id; overflow beyond capacity drops largest ids.
    """
    nx, ny, nz, C = x.shape
    flat = x.reshape(-1, C)
    active = jnp.any(flat != 0, axis=-1)
    sentinel = nx * ny * nz
    all_ids = jnp.arange(sentinel, dtype=jnp.int32)
    keyed = jnp.where(active, all_ids, sentinel)
    top = jnp.sort(keyed)[:capacity]
    mask = top < sentinel
    feats = flat[jnp.minimum(top, sentinel - 1)] * mask[:, None]
    return SparseTensor(ids=top.astype(jnp.int32), features=feats, mask=mask)
