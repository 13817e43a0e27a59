"""Sparse conv engine vs a dense-conv numpy oracle.

Oracle strategy (mirrors the reference test pattern of comparing the CUDA op
to a numpy generator, mmdetection3d/tests/.../test_voxelize.py): build a dense
grid from the sparse sites, run a dense 3D conv with numpy, and compare at
the active output sites (SubM: inputs masked to active sites only — identical
math since inactive inputs are zero AND outputs only kept at active sites).
"""
import numpy as np
import jax.numpy as jnp

from coocc_tpu.ops.sparse_conv import (
    SparseTensor, apply_conv, build_strided_rulebook, build_subm_rulebook,
    downsample_sites, from_dense, subm_conv, to_dense,
)
from coocc_tpu.ops.voxelize import delinearize, linearize


def dense_conv3d_oracle(x, w, stride=1, pad=1):
    """x: [X, Y, Z, Cin]; w: [3, 3, 3, Cin, Cout] (offset order x-major)."""
    X, Y, Z, Cin = x.shape
    Cout = w.shape[-1]
    xp = np.pad(x, ((pad, pad), (pad, pad), (pad, pad), (0, 0)))
    oX = (X + 2 * pad - 3) // stride + 1
    oY = (Y + 2 * pad - 3) // stride + 1
    oZ = (Z + 2 * pad - 3) // stride + 1
    out = np.zeros((oX, oY, oZ, Cout), np.float32)
    for i in range(oX):
        for j in range(oY):
            for k in range(oZ):
                patch = xp[i * stride:i * stride + 3,
                           j * stride:j * stride + 3,
                           k * stride:k * stride + 3]
                out[i, j, k] = np.tensordot(patch, w, axes=([0, 1, 2, 3],
                                                            [0, 1, 2, 3]))
    return out


def make_sparse(rng, grid, n_active, C, capacity):
    ncell = grid[0] * grid[1] * grid[2]
    ids = rng.choice(ncell, size=n_active, replace=False)
    ids.sort()
    feats = rng.randn(n_active, C).astype(np.float32)
    pad = capacity - n_active
    sp = SparseTensor(
        ids=jnp.asarray(np.concatenate([ids, np.full(pad, ncell)]).astype(np.int32)),
        features=jnp.asarray(np.concatenate([feats, np.zeros((pad, C), np.float32)])),
        mask=jnp.asarray(np.concatenate([np.ones(n_active, bool), np.zeros(pad, bool)])),
    )
    return sp


def test_subm_conv_matches_masked_dense(rng):
    grid = (6, 5, 4)
    C, Cout = 3, 5
    sp = make_sparse(rng, grid, 20, C, capacity=32)
    w = rng.randn(27, C, Cout).astype(np.float32) * 0.1

    rb = build_subm_rulebook(sp, grid)
    out = subm_conv(sp, rb, jnp.asarray(w))

    dense_in = np.asarray(to_dense(sp, grid))
    dense_out = dense_conv3d_oracle(dense_in, w.reshape(3, 3, 3, C, Cout))
    coords = np.asarray(delinearize(sp.ids, grid))
    for r in range(32):
        if not bool(sp.mask[r]):
            continue
        x, y, z = coords[r]
        np.testing.assert_allclose(
            np.asarray(out.features)[r], dense_out[x, y, z], rtol=1e-4, atol=1e-4
        )


def test_strided_conv_matches_dense(rng):
    grid = (8, 6, 4)
    out_grid = (4, 3, 2)
    C, Cout = 2, 4
    sp = make_sparse(rng, grid, 25, C, capacity=40)
    w = rng.randn(27, C, Cout).astype(np.float32) * 0.1

    out_ids, out_mask = downsample_sites(sp, grid, out_grid, out_capacity=40)
    rb = build_strided_rulebook(sp, out_ids, out_mask, grid, out_grid)
    feats = apply_conv(sp.features, sp.mask, rb, jnp.asarray(w), out_mask)

    dense_in = np.asarray(to_dense(sp, grid))
    dense_out = dense_conv3d_oracle(dense_in, w.reshape(3, 3, 3, C, Cout),
                                    stride=2, pad=1)
    ocoords = np.asarray(delinearize(out_ids, out_grid))
    n = int(np.asarray(out_mask).sum())
    for r in range(n):
        x, y, z = ocoords[r]
        np.testing.assert_allclose(
            np.asarray(feats)[r], dense_out[x, y, z], rtol=1e-4, atol=1e-4
        )
    # every active output site must cover at least one active input
    # and conversely every covered site must be present
    covered = set()
    icoords = np.asarray(delinearize(sp.ids, grid))
    for r in range(40):
        if not bool(sp.mask[r]):
            continue
        i = icoords[r]
        for jx in {i[0] // 2, (i[0] + 1) // 2}:
            for jy in {i[1] // 2, (i[1] + 1) // 2}:
                for jz in {i[2] // 2, (i[2] + 1) // 2}:
                    if 0 <= jx < out_grid[0] and 0 <= jy < out_grid[1] \
                            and 0 <= jz < out_grid[2]:
                        covered.add((jx, jy, jz))
    got = {tuple(ocoords[r]) for r in range(n)}
    assert got == covered


def test_from_dense_roundtrip(rng):
    grid = (5, 4, 3)
    dense = np.zeros(grid + (2,), np.float32)
    dense[1, 2, 0] = [1.0, 2.0]
    dense[4, 3, 2] = [3.0, 4.0]
    sp = from_dense(jnp.asarray(dense), capacity=8)
    back = np.asarray(to_dense(sp, grid))
    np.testing.assert_allclose(back, dense)
