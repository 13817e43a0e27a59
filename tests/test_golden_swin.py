"""Swin backbone converter golden: torch twin -> convert -> activations.

Reference: coocc/backbones/swintransformer.py:20-770 (mmdet naming). Pins
the converter's layout handling: Linear transposes, the mmcv PatchMerging
Unfold channel order (channel-major) vs our position-major concat, the
relative-position bias table gather, and the shifted-window seam mask —
through a 2-stage mini-Swin with an active shift in every second block.
"""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from coocc_tpu.nn.swin import SwinTransformer
from coocc_tpu.train.convert_torch import ParamTreeBuilder, convert_swin

from golden_refs import TorchSwinT


def test_swin_golden(rng):
    torch.manual_seed(0)
    embed, ws, depths, heads = 16, 4, (2, 2), (2, 4)
    tm = TorchSwinT(embed=embed, ws=ws, depths=depths, heads=heads,
                    out_indices=(0, 1))
    # randomize (default init leaves bias tables zero -> blind spots)
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(0.1 * torch.randn_like(p))
    tm.eval()

    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))

    b = ParamTreeBuilder()
    convert_swin(b, {"m." + k: v.numpy()
                     for k, v in tm.state_dict().items()},
                 "m", "swin", depths=depths, out_indices=(0, 1))
    params = b.params["swin"]

    fm = SwinTransformer(embed_dims=embed, window_size=ws, depths=depths,
                         num_heads=heads, out_indices=(0, 1))
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    init = fm.init(jax.random.PRNGKey(0), xj)
    # converter must cover every leaf the module owns
    ref_leaves = jax.tree.map(lambda a: a.shape, init["params"])
    got_leaves = jax.tree.map(lambda a: np.asarray(a).shape, params)
    assert jax.tree.all(jax.tree.map(lambda a, b_: a == b_,
                                     ref_leaves, got_leaves))
    outs = fm.apply({"params": params}, xj)

    assert len(outs) == len(ref)
    for o, r in zip(outs, ref):
        got = np.asarray(o).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, r.numpy(), rtol=2e-4, atol=2e-4)
