"""Space-to-depth ResNet stem (COOCC_S2D_STEM) is exact vs the 7x7 conv.

The s2d path recomputes the stem's 7x7 stride-2 pad-3 conv as a 4x4
stride-1 conv over a factor-2 space-to-depth input (nn/resnet2d.py:
_s2d_stem_weight) — same params, same math, 4x the MXU lane density.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _apply_resnet(x, train=False):
    from coocc_tpu.nn.resnet2d import ResNet
    m = ResNet(depth=50)
    vs = m.init(jax.random.PRNGKey(0), x, train=False)
    return m.apply(vs, x, train=train), vs, m


def test_s2d_stem_matches_conv7(monkeypatch):
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 48, 3),
                    jnp.float32)
    monkeypatch.delenv("COOCC_S2D_STEM", raising=False)
    ref, vs, m = _apply_resnet(x)
    monkeypatch.setenv("COOCC_S2D_STEM", "1")
    # same param tree: init under s2d must produce identical structure
    vs2 = m.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.structure(vs) == jax.tree.structure(vs2)
    out = m.apply(vs, x, train=False)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)


def test_s2d_stem_weight_builder():
    from coocc_tpu.nn.resnet2d import _s2d_stem_weight, _space_to_depth2
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(7, 7, 3, 8), jnp.float32)
    x = jnp.asarray(rng.randn(1, 20, 24, 3), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        _space_to_depth2(x), _s2d_stem_weight(w), (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-4)


def test_s2d_skipped_on_odd_shapes(monkeypatch):
    # odd H/W can't space-to-depth; the gate must fall back to the 7x7 conv
    x = jnp.asarray(np.random.RandomState(2).randn(1, 31, 33, 3),
                    jnp.float32)
    monkeypatch.delenv("COOCC_S2D_STEM", raising=False)
    ref, vs, m = _apply_resnet(x)
    monkeypatch.setenv("COOCC_S2D_STEM", "1")
    out = m.apply(vs, x, train=False)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)
