"""EfficientNet backbone converter golden: torch twin -> convert -> acts.

Reference: coocc/backbones/efficientnet.py:15-520 (mmdet naming). Covers
both block families — b0 exercises the stem + MBConv (expand/dw/SE/project,
incl. the expand-free e=1 block) and es the fused-MBConv EdgeResidual path.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from coocc_tpu.nn.efficientnet import EfficientNet
from coocc_tpu.train.convert_torch import (ParamTreeBuilder,
                                           convert_efficientnet)

from golden_refs import TorchEfficientNet, randomize_bn_stats


@pytest.mark.parametrize("arch", ["b0", "es"])
def test_efficientnet_golden(rng, arch):
    torch.manual_seed(0)
    out_indices = (2, 3, 4)
    tm = TorchEfficientNet(arch=arch, out_indices=out_indices)
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(0.1 * torch.randn_like(p))
    randomize_bn_stats(tm, rng)
    tm.eval()

    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))

    b = ParamTreeBuilder()
    sd = {"m." + k: v.numpy() for k, v in tm.state_dict().items()}
    convert_efficientnet(b, sd, "m", "eff", arch=arch,
                         out_indices=out_indices)
    variables = {"params": b.params["eff"], "batch_stats": b.batch_stats["eff"]}

    fm = EfficientNet(arch=arch, out_indices=out_indices)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    init = fm.init(jax.random.PRNGKey(0), xj)
    ref_shapes = jax.tree.map(lambda a: a.shape, init["params"])
    got_shapes = jax.tree.map(lambda a: np.asarray(a).shape,
                              variables["params"])
    assert jax.tree.all(jax.tree.map(lambda a, c: a == c,
                                     ref_shapes, got_shapes))
    outs = fm.apply(variables, xj)

    assert len(outs) == len(ref)
    for o, r in zip(outs, ref):
        got = np.asarray(o).transpose(0, 3, 1, 2)
        r = r.numpy()
        # Randomized BN stats push activations to ~1e3 magnitude; scale the
        # absolute tolerance to the tensor so accumulation-order noise in the
        # near-zero elements doesn't trip a fixed atol.
        atol = 3e-4 + 1e-5 * np.abs(r).max()
        np.testing.assert_allclose(got, r, rtol=2e-4, atol=atol)
