"""f32-accumulated conv2d that is differentiable with bf16 operands.

All hot convolutions in this framework request
``preferred_element_type=float32`` so the MXU's f32 accumulator is
preserved in the output (the z-tap sums and GN/BN that follow consume
f32). jax 0.9.0's conv TRANSPOSE rule, however, rejects that combination
under reverse-mode AD: the f32 cotangent is fed back into a conv against
the bf16 operand and `conv_general_dilated` requires matching dtypes
(dot_general's transpose casts; conv's does not). That made every bf16
TRAINING path through these convs a TypeError.

``conv2d_f32acc`` keeps the forward bit-identical and defines the
backward as standard mixed precision: the cotangent is cast to the
operand dtype and the two transpose convs run in that dtype — exactly
what ``flax.linen.Conv(dtype=bfloat16)`` does. For f32 operands the cast
is a no-op and the gradients are identical to plain AD.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


_NHWC = ("NHWC", "HWIO", "NHWC")


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def conv_f32acc(x, w, stride, pads, groups, dn):
    """conv_general_dilated with f32 output accumulation, bf16-trainable.

    stride / pads / dn must be hashable tuples (nondiff static args):
    pads = ((lo, hi), ...) per spatial dim, dn = the dimension-numbers
    string triple.
    """
    return jax.lax.conv_general_dilated(
        x, w, stride, list(pads), feature_group_count=groups,
        dimension_numbers=dn, preferred_element_type=jnp.float32)


def _fwd(x, w, stride, pads, groups, dn):
    return conv_f32acc(x, w, stride, pads, groups, dn), (x, w)


def _bwd(stride, pads, groups, dn, res, g):
    x, w = res

    def plain(x_, w_):
        return jax.lax.conv_general_dilated(
            x_, w_, stride, list(pads), feature_group_count=groups,
            dimension_numbers=dn)

    _, vjp = jax.vjp(plain, x, w)
    return vjp(g.astype(x.dtype))


conv_f32acc.defvjp(_fwd, _bwd)


def conv2d_f32acc(x, w, stride, pads, groups=1):
    """[N, H, W, Ci] x [kh, kw, Ci/groups, Co] -> f32 [N, Ho, Wo, Co]."""
    return conv_f32acc(x, w, tuple(stride),
                       tuple(tuple(p) for p in pads), groups, _NHWC)
