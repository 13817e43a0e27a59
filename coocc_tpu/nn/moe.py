"""Noisy top-k gated mixture-of-experts layer (capability envelope).

Capability parity with the reference's registered-but-unused MoE utilities
(utils/moe.py:1-282, torch_moe_layer_nobatch.py:1-283 — noisy top-k gating
after Shazeer et al.). TPU-native formulation: instead of per-expert
dynamic dispatch, every expert runs densely and the gate mixes the outputs
— exact for small expert counts and fully static-shaped; pairs naturally
with expert parallelism by sharding the expert axis over the mesh.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class MoE(nn.Module):
    num_experts: int = 4
    k: int = 2
    hidden: int = 256
    out_features: int = 128
    noisy_gating: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [..., C] -> [..., out_features]."""
        E, K = self.num_experts, self.k
        gate_logits = nn.Dense(E, use_bias=False, dtype=self.dtype,
                               name="w_gate")(x)
        if self.noisy_gating:
            noise_std = nn.softplus(
                nn.Dense(E, use_bias=False, dtype=self.dtype,
                         name="w_noise")(x))
            if train:
                rng = self.make_rng("dropout")
                gate_logits = gate_logits + noise_std * jax.random.normal(
                    rng, gate_logits.shape, gate_logits.dtype)

        # top-k softmax gate (small k over small E: full sort is fine)
        kth = jnp.sort(gate_logits, axis=-1)[..., -K][..., None]
        masked = jnp.where(gate_logits >= kth, gate_logits, -jnp.inf)
        gates = nn.softmax(masked, axis=-1)  # [..., E]

        experts = nn.vmap(
            _Expert,
            in_axes=None, out_axes=-2,
            axis_size=E,
            variable_axes={"params": 0},
            split_rngs={"params": True},
        )(hidden=self.hidden, out_features=self.out_features,
          dtype=self.dtype, name="experts")(x)  # [..., E, out]
        return jnp.einsum("...e,...eo->...o", gates, experts)


class _Expert(nn.Module):
    hidden: int
    out_features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        h = nn.relu(h)
        return nn.Dense(self.out_features, dtype=self.dtype, name="fc2")(h)
