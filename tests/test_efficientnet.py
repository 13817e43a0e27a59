"""EfficientNet backbone: scaling-table oracle + forward shapes."""
import jax
import jax.numpy as jnp
import numpy as np

from coocc_tpu.nn.efficientnet import (EfficientNet, _make_divisible,
                                       scaled_layers)


def test_make_divisible():
    assert _make_divisible(16 * 1.0) == 16
    assert _make_divisible(16 * 1.1) == 16   # 17.6 -> 16 (>= 0.9*17.6)
    assert _make_divisible(32 * 1.4) == 48   # b4 stem: 44.8 -> 48
    assert _make_divisible(320 * 2.0) == 640


def test_scaled_layers_b0_matches_table():
    stages = scaled_layers("b0")
    assert [len(s) for s in stages] == [1, 1, 2, 2, 6, 5, 1]
    assert stages[0][0][1] == 32 and stages[-1][0][1] == 1280


def test_scaled_layers_b4_depth():
    stages = scaled_layers("b4")
    # depth factor 1.8: ceil(2*1.8)=4, ceil(6*1.8)=11, ceil(5*1.8)=9
    assert [len(s) for s in stages] == [1, 2, 4, 4, 11, 9, 1]
    # repeated blocks must not re-stride
    assert all(r[3] == 1 for r in stages[2][1:])


def test_efficientnet_forward(rng):
    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    net = EfficientNet(arch="b0", out_indices=(2, 3, 4, 5))
    v = jax.jit(net.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    outs = jax.jit(lambda v, x: net.apply(v, x, train=False))(v, x)
    # strides 4, 8, 16, 32; b0 widths 24, 40, 112, 320
    assert [o.shape for o in outs] == [
        (1, 16, 24, 24), (1, 8, 12, 40), (1, 4, 6, 112), (1, 2, 3, 320)]
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_efficientnet_edge_arch(rng):
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    net = EfficientNet(arch="es", out_indices=(3,))
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    (o,) = net.apply(v, x, train=False)
    assert o.shape == (1, 4, 4, 48)
