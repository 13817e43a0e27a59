"""Capability-envelope modules: alternative fusers + MoE."""
import jax
import jax.numpy as jnp
import numpy as np

from coocc_tpu.nn.alt_fusers import AddFuser, AttnFuser
from coocc_tpu.nn.moe import MoE


def _grids(rng):
    img = jnp.asarray(rng.rand(1, 8, 8, 4, 32).astype(np.float32))
    pts = jnp.asarray(rng.rand(1, 8, 8, 4, 32).astype(np.float32))
    return img, pts


def test_add_fuser(rng):
    img, pts = _grids(rng)
    m = AddFuser(in_channels=32, out_channels=32)
    v = m.init(jax.random.PRNGKey(0), img, pts, train=False)
    out = m.apply(v, img, pts, train=False)
    assert out.shape == (1, 8, 8, 4, 32)
    assert bool(jnp.isfinite(out).all())


def test_attn_fuser(rng):
    img, pts = _grids(rng)
    m = AttnFuser(in_channels=32, out_channels=32, num_heads=4)
    v = m.init(jax.random.PRNGKey(0), img, pts, train=False)
    out = m.apply(v, img, pts, train=False)
    assert out.shape == (1, 8, 8, 4, 32)
    assert bool(jnp.isfinite(out).all())


def test_moe_gates_topk(rng):
    x = jnp.asarray(rng.rand(10, 16).astype(np.float32))
    m = MoE(num_experts=4, k=2, hidden=32, out_features=8)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (10, 8)
    assert bool(jnp.isfinite(out).all())
    # train mode with gating noise
    out2 = m.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert out2.shape == (10, 8)
