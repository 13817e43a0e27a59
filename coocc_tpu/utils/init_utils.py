"""Jitted model initialization.

Unjitted flax init runs the whole forward op-by-op (minutes of dispatch for
this model); jitting it collapses that to one compile + one run.
"""
from __future__ import annotations

from functools import partial

import jax


def jit_init(model, rngs, batch, train: bool = True, fine_rng=None):
    @partial(jax.jit, static_argnames=("train_",))
    def _init(rngs, batch, fine_rng, train_):
        if fine_rng is not None:
            return model.init(rngs, batch, train=train_, fine_rng=fine_rng)
        return model.init(rngs, batch, train=train_)

    return _init(rngs, batch, fine_rng, train)
