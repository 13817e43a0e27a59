"""Compile-budget regression guard for the driver's multichip dryrun.

The dryrun gate (__graft_entry__.dryrun_multichip) compiles the tiny-config
shard_map train step cold; its wall clock crept 4m49s -> 6m19s across
round 3 as the traced program grew. Compile time tracks traced-program
size, so pin the recursive jaxpr equation count of exactly that train step
and fail BEFORE the driver gate does. Measured 7500 eqns at round-4 HEAD
(2026-08-20); the budget leaves ~20% headroom. If this fails after an
intentional feature, re-measure, update BUDGET, and re-time the cold
dryrun (README perf notes) to confirm it still fits the driver's window.
"""
import jax
import jax.numpy as jnp
import numpy as np

from coocc_tpu.data.synthetic import synthetic_batch, tiny_config
from coocc_tpu.models.coocc_ray import CoOccRay
from coocc_tpu.parallel.mesh import make_mesh
from coocc_tpu.parallel.train_step import make_train_step
from coocc_tpu.train.state import create_train_state
from coocc_tpu.utils.init_utils import jit_init

BUDGET = 9000


def _count_eqns(jaxpr) -> int:
    n = 0
    for e in jaxpr.eqns:
        n += 1
        for p in e.params.values():
            if hasattr(p, "jaxpr"):
                n += _count_eqns(p.jaxpr)
            elif isinstance(p, (list, tuple)):
                for q in p:
                    if hasattr(q, "jaxpr"):
                        n += _count_eqns(q.jaxpr)
    return n


def test_dryrun_train_step_jaxpr_budget():
    n_devices = 8
    cfg = tiny_config(use_camera=True, use_lidar=True)
    model = CoOccRay(cfg=cfg)
    batch = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(x),
        synthetic_batch(cfg, batch_size=n_devices),
        is_leaf=lambda x: x is None)
    batch1 = jax.tree.map(lambda x: x[:1], batch)
    variables = jit_init(
        model,
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch1, train=True, fine_rng=jax.random.PRNGKey(2))
    mesh = make_mesh(n_devices)
    state = create_train_state(model, variables, cfg.optim,
                               steps_per_epoch=10)
    step = make_train_step(model, cfg, mesh=mesh)
    jaxpr = jax.make_jaxpr(step)(state, batch, jax.random.PRNGKey(3))
    n = _count_eqns(jaxpr.jaxpr)
    assert n <= BUDGET, (
        f"tiny train step traced to {n} eqns > budget {BUDGET}: the "
        f"multichip dryrun compile gate is at risk. If the growth is "
        f"intentional, re-time the cold dryrun and raise BUDGET.")


def test_batched_trace_is_constant_size():
    """B>1 must NOT unroll the per-sample python loops (round-3 weak #3):
    the B=4 forward trace must stay within a small constant factor of B=1
    (lax.map adds one scan wrapper, not 4x the body)."""
    cfg = tiny_config(use_camera=True, use_lidar=True)
    model = CoOccRay(cfg=cfg)

    counts = {}
    for bsz in (1, 4):
        batch = jax.tree.map(np.asarray, synthetic_batch(cfg, bsz))
        variables = jax.eval_shape(
            lambda b=batch: model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                b, train=True, fine_rng=jax.random.PRNGKey(2)))

        def fwd(v, b):
            return model.apply(v, b, train=True,
                               fine_rng=jax.random.PRNGKey(2),
                               rngs={"dropout": jax.random.PRNGKey(3)},
                               mutable=["batch_stats"])

        jaxpr = jax.make_jaxpr(fwd)(variables, batch)
        counts[bsz] = _count_eqns(jaxpr.jaxpr)
    # identical per-sample program under lax.map: allow 40% overhead for
    # the scan plumbing, nowhere near the 4x of an unrolled loop
    assert counts[4] <= counts[1] * 1.4, counts
