"""f32-accumulated convs are differentiable in bf16 (ops/conv_acc.py).

jax 0.9.0's conv transpose rule rejects preferred_element_type=float32
with bf16 operands, which made every bf16 TRAINING path through the
z-batch Conv3d decomposition and the packed LiDAR encoder a TypeError.
conv_f32acc keeps the forward bit-identical and runs the backward in
standard mixed precision (cotangent cast to the operand dtype).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coocc_tpu.nn.layers import Conv3d
from coocc_tpu.ops.conv_acc import conv2d_f32acc


def test_forward_bit_identical_to_preferred():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 9, 16), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 16, 8), jnp.bfloat16)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    out = conv2d_f32acc(x, w, (1, 1), ((1, 1), (1, 1)))
    assert out.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_bf16_grads_flow():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 6, 6, 8), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 8, 8), jnp.bfloat16)

    def f(x, w):
        return conv2d_f32acc(x, w, (1, 1), ((1, 1), (1, 1))).sum()

    gx, gw = jax.grad(f, argnums=(0, 1))(x, w)
    assert gx.dtype == jnp.bfloat16 and gw.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(gx, np.float32)).all()
    # gradient of sum-of-conv wrt w is the sum of input windows: check
    # the center tap against a numpy reduction
    win = np.asarray(x, np.float32)[0].sum(axis=(0, 1))
    np.testing.assert_allclose(
        np.asarray(gw, np.float32)[1, 1, :, 0], win, rtol=0.05, atol=0.5)


def test_f32_grads_match_plain_ad():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 6, 6, 4), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 4, 4), jnp.float32)

    def f_acc(x, w):
        return (conv2d_f32acc(x, w, (2, 2), ((1, 1), (1, 1))) ** 2).sum()

    def f_plain(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return (y ** 2).sum()

    ga = jax.grad(f_acc, argnums=(0, 1))(x, w)
    gp = jax.grad(f_plain, argnums=(0, 1))(x, w)
    for a, b in zip(ga, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride", [(1, 1, 1), (2, 2, 2)])
def test_conv3d_bf16_trains(stride):
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 6, 7, 4, 8), jnp.bfloat16)
    m = Conv3d(8, (3, 3, 3), stride, 1, dtype=jnp.bfloat16)
    vs = m.init(jax.random.PRNGKey(0), x)

    def loss(vs, x):
        return (m.apply(vs, x).astype(jnp.float32) ** 2).sum()

    g = jax.grad(loss)(vs, x)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l, np.float32)).all() for l in leaves)
    assert any(float(jnp.abs(l.astype(jnp.float32)).sum()) > 0
               for l in leaves)


def test_packed_encoder_bf16_trains():
    from coocc_tpu.nn.sparse_enc_packed import PackedLiDAREnc8x
    mask = jnp.zeros((1, 32, 32, 16), bool).at[0, 3:9, 4:12, 2:10].set(True)
    enc = PackedLiDAREnc8x(sparse_shape_xyz=(32, 32, 16), capacity=512,
                           compute_dtype=jnp.bfloat16)
    vs = enc.init(jax.random.PRNGKey(0), mask, train=True)

    def loss(params):
        out, _ = enc.apply(
            {"params": params, "batch_stats": vs.get("batch_stats", {})},
            mask, train=True, mutable=["batch_stats"])
        return (out.astype(jnp.float32) ** 2).sum()

    g = jax.grad(loss)(vs["params"])
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l, np.float32)).all() for l in leaves)
