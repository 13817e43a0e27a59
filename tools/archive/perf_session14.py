#!/usr/bin/env python
"""Serialized TPU perf session 14: space-to-depth ResNet stem A/B.

A/Bs the exact s2d stem rewrite (nn/resnet2d.py, COOCC_S2D_STEM=1,
tests/test_s2d_stem.py) on the flagship 6-cam 256x704 shapes.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from coocc_tpu.nn.resnet2d import ResNet
    from tools._prof import make_timer

    timed = make_timer()
    key = jax.random.PRNGKey(0)
    x6 = jax.random.normal(key, (6, 256, 704, 3), jnp.float32) \
        .astype(jnp.bfloat16)
    rn = ResNet(depth=50, dtype=jnp.bfloat16)
    v_rn = jax.jit(rn.init, static_argnames="train")(
        jax.random.PRNGKey(0), x6, train=False)

    outs = {}
    for flag in ("", "1"):
        if flag:
            os.environ["COOCC_S2D_STEM"] = flag
        else:
            os.environ.pop("COOCC_S2D_STEM", None)

        @jax.jit
        def run(v, x):
            return rn.apply(v, x, train=False)

        timed(f"resnet50 6cam S2D='{flag}'", run, v_rn, x6)
        outs[flag] = jax.jit(run)(v_rn, x6)
    err = max(float(jnp.abs(a.astype(jnp.float32) -
                            b.astype(jnp.float32)).max())
              for a, b in zip(jax.tree.leaves(outs[""]),
                              jax.tree.leaves(outs["1"])))
    print("   max |delta|:", err, flush=True)
    print("[perf session 14 done]", flush=True)


if __name__ == "__main__":
    main()
