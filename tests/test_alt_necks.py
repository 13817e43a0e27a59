"""Alternative neck shapes/finiteness (capability-envelope components)."""
import jax
import jax.numpy as jnp
import numpy as np

from coocc_tpu.nn.alt_necks import FPNRender, GeneralizedLSSFPN, SECONDFPN2


def _feats(rng, chans, H=16, W=24):
    return [jnp.asarray(rng.randn(1, H // 2 ** i, W // 2 ** i, c)
                        .astype(np.float32))
            for i, c in enumerate(chans)]


def test_secondfpn2_levels(rng):
    feats = _feats(rng, (8, 16, 32))
    mod = SECONDFPN2(in_channels=(8, 16, 32), out_channels=(8, 8, 8),
                     upsample_strides=(1, 2, 4))
    v = mod.init(jax.random.PRNGKey(0), feats, train=False)
    outs = mod.apply(v, feats, train=False)
    assert [o.shape for o in outs] == [(1, 16, 24, 8)] * 3
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_generalized_lss_fpn(rng):
    feats = _feats(rng, (8, 16, 32))
    mod = GeneralizedLSSFPN(in_channels=(8, 16, 32), out_channels=12)
    v = mod.init(jax.random.PRNGKey(0), feats, train=False)
    outs = mod.apply(v, feats, train=False)
    assert [o.shape for o in outs] == [(1, 16, 24, 12), (1, 8, 12, 12)]
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_fpn_render(rng):
    feats = _feats(rng, (8, 16, 32, 64))
    mod = FPNRender(in_channels=(8, 16, 32, 64), out_channels=10)
    v = mod.init(jax.random.PRNGKey(0), feats)
    outs = mod.apply(v, feats)
    assert [o.shape for o in outs] == [
        (1, 16, 24, 10), (1, 8, 12, 10), (1, 4, 6, 10), (1, 2, 3, 10)]
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)
