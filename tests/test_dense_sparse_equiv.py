"""Dense-conv3d and gather-GEMM sparse encoders must agree numerically."""
import numpy as np
import jax
import jax.numpy as jnp

from coocc_tpu.ops.sparse_conv import SparseTensor, to_dense
from coocc_tpu.nn.sparse_enc import SparseLiDAREnc8x
from coocc_tpu.nn.sparse_enc_dense import DenseLiDAREnc8x


def make_sp(rng, grid, n_active, C, capacity, B=1):
    ncell = grid[0] * grid[1] * grid[2]
    ids_list, feats_list, mask_list = [], [], []
    for _ in range(B):
        ids = np.sort(rng.choice(ncell, n_active, replace=False))
        feats = rng.randn(n_active, C).astype(np.float32)
        pad = capacity - n_active
        ids_list.append(np.concatenate([ids, np.full(pad, ncell)]))
        feats_list.append(np.concatenate([feats, np.zeros((pad, C))]))
        mask_list.append(np.concatenate([np.ones(n_active, bool),
                                         np.zeros(pad, bool)]))
    return SparseTensor(
        ids=jnp.asarray(np.stack(ids_list).astype(np.int32)),
        features=jnp.asarray(np.stack(feats_list).astype(np.float32)),
        mask=jnp.asarray(np.stack(mask_list)),
    )


def test_dense_equals_gather(rng):
    grid = (32, 32, 16)
    # ample capacity: the gather engine truncates dilated strided-conv
    # sites at its static capacity, while dense (like reference spconv)
    # keeps all covered sites — equality requires no truncation
    sp = make_sp(rng, grid, n_active=250, C=4, capacity=4096)

    kwargs = dict(input_channel=4, base_channel=16, out_channel=32,
                  sparse_shape_xyz=grid, capacity=4096)
    gather_enc = SparseLiDAREnc8x(**kwargs)
    dense_enc = DenseLiDAREnc8x(**kwargs)

    variables = gather_enc.init(jax.random.PRNGKey(0), sp, train=False)
    # randomize ALL params: at default init the stem GroupNorm(16, 16) has
    # one channel per group, so its output is exactly the (zero) bias — a
    # faithful reproduction of the reference's GN(16, base_channel) quirk
    # (sparse_lidar_enc.py:78-80) that would make this test vacuous
    params = variables["params"]
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [0.1 * jax.random.normal(k, l.shape, l.dtype)
              if jnp.issubdtype(l.dtype, jnp.floating) else l
              for k, l in zip(keys, leaves)]
    variables = {"params": jax.tree.unflatten(treedef, leaves),
                 "batch_stats": variables.get("batch_stats", {})}

    out_gather = gather_enc.apply(variables, sp, train=False)
    # same params drive the dense twin (identical names/shapes)
    out_dense = dense_enc.apply(variables, sp, train=False)

    assert out_gather.shape == out_dense.shape
    assert float(jnp.abs(out_gather).sum()) > 0
    np.testing.assert_allclose(np.asarray(out_dense), np.asarray(out_gather),
                               rtol=1e-3, atol=1e-4)
