"""Conv3d's z-batch decomposition must match XLA's native conv3d exactly."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coocc_tpu.nn.layers import Conv3d


@pytest.mark.parametrize("kernel,stride,padding", [
    ((3, 3, 3), (1, 1, 1), 1),
    ((3, 3, 3), (2, 2, 2), 1),
    ((1, 1, 3), (1, 1, 1), (0, 0, 1)),
    ((3, 3, 2), (1, 1, 2), 0),
])
def test_conv3d_zbatch_matches_native(kernel, stride, padding):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 9, 6, 16)).astype(np.float32))
    mod = Conv3d(features=24, kernel_size=kernel, stride=stride,
                 padding=padding, use_bias=True)
    vs = mod.init(jax.random.PRNGKey(0), x)
    got = mod.apply(vs, x)

    from coocc_tpu.nn.layers import _pad_tuple
    ref_mod = nn.Conv(features=24, kernel_size=kernel, strides=stride,
                      padding=_pad_tuple(padding, 3))
    ref = ref_mod.apply({"params": vs["params"]["conv"]}, x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
