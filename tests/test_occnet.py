"""Dual-path OccupancyEncoder: forward shapes and BEV-coupling effect."""
import jax
import jax.numpy as jnp
import numpy as np

from coocc_tpu.nn.occnet import DualpathTransformerBlock, OccupancyEncoder


def test_dualpath_block(rng):
    x = jnp.asarray(rng.randn(1, 16, 16, 4, 24).astype(np.float32))
    blk = DualpathTransformerBlock(channels=32, stride=2, shift=True,
                                   head_channels=8)
    v = blk.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = blk.apply(v, x, train=False)
    assert out.shape == (1, 8, 8, 2, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_occupancy_encoder(rng):
    x = jnp.asarray(rng.randn(1, 16, 16, 8, 16).astype(np.float32))
    enc = OccupancyEncoder(block_numbers=(1, 1), block_inplanes=(16, 32),
                           block_strides=(1, 2), out_indices=(0, 1))
    v = jax.jit(enc.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    outs = jax.jit(lambda v, x: enc.apply(v, x, train=False))(v, x)
    assert [o.shape for o in outs] == [(1, 16, 16, 8, 16), (1, 8, 8, 4, 32)]
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)
