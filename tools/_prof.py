"""Shared on-chip timing helpers (axon-relay-safe).

The relay's scalar-readback round-trip is large AND noisy (27-67 ms
observed), so single-shot subtract-the-baseline timings are unreliable.
timed_scan runs the stage K times inside ONE jit via lax.scan with a
carry-dependent input perturbation (forces sequential re-execution, defeats
loop-invariant hoisting), so the round-trip amortizes to noise/K.
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def enable_compile_cache():
    """Persistent XLA compile cache under the repo — CPU backend ONLY.

    Observed on this environment: enabling the cache with the axon TPU
    relay WEDGES the relay (compiles hang indefinitely and block every
    other client). Tests and dryruns (CPU) benefit; TPU-side profiling and
    benching must keep it off.
    """
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        return
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


enable_compile_cache()


def _readback(x):
    return float(jnp.asarray(x).reshape(-1)[0].astype(jnp.float32))


def make_timer(reps: int = 3, iters: int = 8):
    measured_rt = {}

    @jax.jit
    def trivial(x):
        return (x * 2.0).sum()

    _readback(trivial(jnp.ones((8, 128))))

    def round_trip():
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            _readback(trivial(jnp.ones((8, 128))))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def timed(name, fn, *args, flops=None):
        """fn(*args) -> arbitrary pytree; returns seconds per call."""

        def scanned(seed, *a):
            # seed varies per rep: identical-args repeat calls can be
            # served from the relay's result cache (round-4 bench_render
            # incident); a fresh scalar changes the result every call at
            # zero compile cost
            def body(c, _):
                # carry-dependent perturbation of EVERY float leaf, so no
                # input-dependent compute is loop-invariant (hoistable).
                # MUST NOT be c * 0.0: XLA constant-folds that to zero and
                # hoists the whole body (observed: a 3.8 ms conv "measured"
                # 0.26 ms). c ~ 1e-30-scaled sums, so the value perturbation
                # is far below bf16 resolution.
                pert = c * jnp.float32(1e-8)

                def bump(x):
                    if not hasattr(x, "dtype"):
                        return x
                    dt = jnp.asarray(x).dtype
                    if jnp.issubdtype(dt, jnp.floating):
                        return x + pert.astype(x.dtype)
                    if dt == jnp.bool_:
                        # carry-dependent no-op XLA cannot fold: pert is a
                        # traced float, so (pert > 1e30) is not provably F
                        return x ^ (pert > jnp.float32(1e30))
                    if jnp.issubdtype(dt, jnp.integer):
                        return x + (pert > jnp.float32(1e30)).astype(dt)
                    return x

                aa = jax.tree.map(bump, list(a))
                out = fn(*aa)
                # reduce EVERY leaf: reducing only the first leaf lets XLA
                # dead-code-eliminate whole sub-paths (observed: the cascade
                # head measured 4 ms standalone vs 32 ms in-graph because
                # dict leaf #1 was fine_coords, which needs only the argsort)
                s = sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                        for l in jax.tree.leaves(out)
                        if hasattr(l, "dtype")) * 1e-30
                return c + s, None
            c, _ = jax.lax.scan(body, seed * jnp.float32(1e-30), None,
                                length=iters)
            return c

        jfn = jax.jit(scanned)
        t0 = time.perf_counter()
        _readback(jfn(jnp.float32(1.0), *args))
        compile_s = time.perf_counter() - t0
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            _readback(jfn(jnp.float32(2.0 + i), *args))
            ts.append(time.perf_counter() - t0)
        rt = round_trip()
        dt = (float(np.median(ts)) - rt) / iters
        msg = f"{name:30s} {dt*1e3:8.2f} ms"
        if flops:
            msg += f"  {flops/dt/1e12:6.1f} TFLOP/s"
        print(msg + f"   [compile {compile_s:.0f}s, rt {rt*1e3:.0f}ms]",
              flush=True)
        return dt

    return timed
