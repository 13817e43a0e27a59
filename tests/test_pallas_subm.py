"""Pallas fused SubM ext conv == XLA shift_ext+conv2d path (interpret mode).

The kernel (ops/pallas/subm_conv.py) replaces the 192-lane extended concat
of the packed encoder's SubM twin (nn/sparse_enc_packed.py:139-158, reference
sparse_lidar_enc.py:125-178 SubMConv3d) with an in-VMEM im2col assembly.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coocc_tpu.nn.sparse_enc_packed import (_conv2d, _shift_ext,
                                            _subm_ext_weight)
from coocc_tpu.ops.pallas.subm_conv import subm_ext_conv


@pytest.mark.parametrize("B,bz,X,Y,C,p", [
    # pC = p*C must be 128-aligned (kernel req; true at every encoder level)
    (1, 3, 12, 16, 32, 4),
    (2, 2, 9, 11, 64, 2),   # odd spatial -> tile padding paths
])
def test_subm_ext_conv_matches_xla(rng, B, bz, X, Y, C, p):
    pC = p * C
    x = jnp.asarray(rng.randn(B, bz, X, Y, pC).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w27 = jnp.asarray(0.1 * rng.randn(27, C, C).astype(np.float32))
    wext = _subm_ext_weight(w27, p)

    ref = _conv2d(
        _shift_ext(x, C).reshape(B * bz, X, Y, pC + 2 * C),
        wext.astype(jnp.bfloat16)).astype(x.dtype).reshape(B, bz, X, Y, pC)
    got = subm_ext_conv(x, wext, bz=bz, C=C, interpret=True)

    assert got.shape == ref.shape and got.dtype == ref.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=2e-2)  # bf16 output quantization of fp32 accumulators


def test_packed_subm_pallas_gate(rng, monkeypatch):
    """COOCC_PALLAS_SUBM=interpret routes _PackedSubM through the kernel."""
    from coocc_tpu.nn.sparse_enc_packed import _PackedSubM

    C, p, bz = 8, 4, 2
    x = jnp.asarray(rng.randn(1, bz, 8, 16, p * C).astype(np.float32)
                    ).astype(jnp.bfloat16)
    mask = jnp.ones((1, bz, 8, 16, p), jnp.bfloat16)
    maskf = jnp.repeat(mask, C, axis=-1)
    mod = _PackedSubM(C)
    v = mod.init(jax.random.PRNGKey(0), x, maskf, C)
    ref = mod.apply(v, x, maskf, C)
    monkeypatch.setenv("COOCC_PALLAS_SUBM", "interpret")
    got = mod.apply(v, x, maskf, C)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=2e-2)
