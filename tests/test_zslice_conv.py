"""Input-side z-sliced Conv3d tap decomposition is exact.

Conv3d's z-batch forms now slice each z tap's needed planes on the INPUT
side (nn/layers.py:_zslice_tap_conv) instead of convolving the whole
padded stack and discarding (up to 75% wasted MACs for stride-2-z or
Z<=2 grids).  Pin all three forms — native XLA conv3d, the legacy padded
stack (COOCC_ZPAD_STACK=1), and the z-sliced default — against each
other across Z extents, strides, and paddings.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coocc_tpu.nn.layers import Conv3d


def _mk(Z, C=5, feat=4, stride=(1, 1, 1), pad=1, groups=1):
    rng = np.random.RandomState(Z * 7 + stride[2])
    x = jnp.asarray(rng.randn(2, 6, 7, Z, C), jnp.float32)
    m = Conv3d(feat, (3, 3, 3), stride, pad, groups=groups)
    vs = m.init(jax.random.PRNGKey(0), x)
    return m, vs, x


CASES = [
    (8, (1, 1, 1), 1),
    (8, (2, 2, 2), 1),
    (4, (2, 2, 2), 1),
    (2, (1, 1, 1), 1),
    (1, (1, 1, 1), 1),
    (5, (1, 1, 2), 1),
    (8, (1, 1, 1), 0),
    (3, (1, 1, 3), 1),
]


@pytest.mark.parametrize("Z,stride,pad", CASES)
def test_zslice_matches_native_and_stack(Z, stride, pad, monkeypatch):
    m, vs, x = _mk(Z, stride=stride, pad=pad)
    monkeypatch.delenv("COOCC_ZPAD_STACK", raising=False)
    monkeypatch.delenv("COOCC_CONV3D_NATIVE", raising=False)
    out = m.apply(vs, x)
    monkeypatch.setenv("COOCC_ZPAD_STACK", "1")
    legacy = m.apply(vs, x)
    monkeypatch.delenv("COOCC_ZPAD_STACK")
    monkeypatch.setenv("COOCC_CONV3D_NATIVE", "1")
    native = m.apply(vs, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(legacy),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(native),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("Z,stride,pad", CASES)
def test_zslice_zb_resident(Z, stride, pad, monkeypatch):
    m, vs, x = _mk(Z, stride=stride, pad=pad)
    monkeypatch.delenv("COOCC_ZPAD_STACK", raising=False)
    monkeypatch.delenv("COOCC_CONV3D_NATIVE", raising=False)
    ref = m.apply(vs, x)
    out_zb = m.apply(vs, jnp.transpose(x, (0, 3, 1, 2, 4)), zb=True)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(out_zb, (0, 2, 3, 1, 4))),
        np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_zslice_zb_resident_grouped(monkeypatch):
    monkeypatch.delenv("COOCC_ZPAD_STACK", raising=False)
    m, vs, x = _mk(6, C=6, feat=4, groups=2)
    ref = m.apply(vs, x)  # groups>1, zb=False -> native nn.Conv
    out_zb = m.apply(vs, jnp.transpose(x, (0, 3, 1, 2, 4)), zb=True)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(out_zb, (0, 2, 3, 1, 4))),
        np.asarray(ref), rtol=1e-5, atol=1e-4)
