"""NeRF-style MLP heads for the rendering regularizer.

Capability parity with the reference MLP (utils/nerf_mlp.py:14-105) as used
by COOCC_Ray (coocc_ray.py:111-113): sigma_head = MLP(128 -> 1, depth 1),
rgb_head = MLP(128 -> 3, depth 3), width 256, ReLU hidden, identity output,
no skip connections (skip_layer=None in the detector's instantiation).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn


class NeRFMLP(nn.Module):
    output_dim: int
    net_depth: int = 8
    net_width: int = 256
    skip_layer: Optional[int] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        inputs = x
        for i in range(self.net_depth):
            x = nn.Dense(self.net_width, dtype=self.dtype,
                         name=f"hidden{i}")(x)
            x = nn.relu(x)
            if (self.skip_layer is not None) and (i % self.skip_layer == 0) \
                    and (i > 0):
                import jax.numpy as jnp
                x = jnp.concatenate([x, inputs], axis=-1)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="output")(x)
