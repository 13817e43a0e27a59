#!/usr/bin/env python
"""Serialized TPU perf session 11: Pallas subm_ext_conv vs XLA ext conv."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from coocc_tpu.nn.sparse_enc_packed import (_conv2d, _shift_ext,
                                                _subm_ext_weight)
    from coocc_tpu.ops.pallas.subm_conv import subm_ext_conv
    from tools._prof import make_timer

    timed = make_timer()
    key = jax.random.PRNGKey(0)

    for name, (B, bz, X, Y, C, p) in [
            ("res1", (1, 8, 400, 400, 32, 4)),
            ("res2", (1, 8, 200, 200, 64, 2)),
            ("res3", (1, 8, 100, 100, 128, 1))]:
        pC = p * C
        x = jax.random.normal(key, (B, bz, X, Y, pC),
                              jnp.float32).astype(jnp.bfloat16)
        w27 = jax.random.normal(jax.random.fold_in(key, 1), (27, C, C),
                                jnp.float32) * 0.1
        wext = _subm_ext_weight(w27, p)

        def ref_fn(xx):
            return _conv2d(
                _shift_ext(xx, C).reshape(B * bz, X, Y, pC + 2 * C),
                wext).astype(xx.dtype).reshape(B, bz, X, Y, pC)

        timed(f"{name} XLA ext conv", ref_fn, x)
        timed(f"{name} pallas fused", lambda xx: subm_ext_conv(
            xx, wext, bz=bz, C=C), x)
        a = jax.jit(ref_fn)(x)
        b = subm_ext_conv(x, wext, bz=bz, C=C)
        print("   agree:", float(jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32)).max()),
            "scale:", float(jnp.abs(a.astype(jnp.float32)).max()),
            flush=True)

    print("[perf session 11 done]", flush=True)


if __name__ == "__main__":
    main()
