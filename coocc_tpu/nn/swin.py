"""Swin Transformer image backbone (capability-envelope component).

Capability parity with the reference's registered-but-unused alternative 2D
backbone (reference: coocc/backbones/swintransformer.py:465-700, mmdet-style
Swin): patch embed -> 4 stages of shifted-window attention blocks with patch
merging between stages, multi-scale NHWC outputs with per-stage LayerNorm.

TPU-first structure: window partition/reverse are static reshapes, the
cyclic shift is jnp.roll (a cheap on-chip rotation), attention runs as one
batched [nW*B, heads, N, N] matmul pair on the MXU, and the relative
position bias is a table gather folded into the logits. No torch-style
padding-at-forward: input sizes must be multiples of the total stride
(true for all shipped input resolutions).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _rel_pos_index(wh: int, ww: int) -> np.ndarray:
    """[N, N] index into the (2wh-1)(2ww-1) relative position bias table."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    return rel[:, :, 0] * (2 * ww - 1) + rel[:, :, 1]


class WindowMSA(nn.Module):
    """Window multi-head self-attention with relative position bias."""
    embed_dims: int
    num_heads: int
    window_size: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, attn_mask=None):
        """x: [B_, N, C] windows; attn_mask: [nW, N, N] or None."""
        B_, N, C = x.shape
        ws = self.window_size
        nh = self.num_heads
        hd = C // nh
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B_, N, 3, nh, hd)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd ** -0.5), k)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), nh))
        idx = jnp.asarray(_rel_pos_index(ws, ws))
        bias = table[idx.reshape(-1)].reshape(N, N, nh)
        attn = attn + jnp.transpose(bias, (2, 0, 1))[None].astype(attn.dtype)
        if attn_mask is not None:
            nW = attn_mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, nh, N, N) \
                + attn_mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(B_, nh, N, N)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


def _window_partition(x, ws: int):
    """[B, H, W, C] -> [B*nW, ws*ws, C]."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws * ws, C)


def _window_reverse(wins, ws: int, B: int, H: int, W: int):
    x = wins.reshape(B, H // ws, W // ws, ws, ws, -1)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, H, W, -1)


def _shift_attn_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """[nW, N, N] additive mask (-100 across shifted-window seams)."""
    img = np.zeros((H, W), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wss in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wss] = cnt
            cnt += 1
    wins = img.reshape(H // ws, ws, W // ws, ws).transpose(0, 2, 1, 3)
    wins = wins.reshape(-1, ws * ws)
    mask = (wins[:, :, None] != wins[:, None, :]).astype(np.float32) * -100.0
    return mask


class SwinBlock(nn.Module):
    """LN -> (S)W-MSA -> +res -> LN -> MLP -> +res."""
    embed_dims: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, C]."""
        B, H, W, C = x.shape
        ws = self.window_size
        # the reference shifts on every odd block regardless of input size
        # (swintransformer.py:440 — no small-input shift disable; the seam
        # mask blocks the wrapped-in attention), so we must too
        shift = self.shift

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        # pad to window multiples (static), as the torch reference does at
        # forward (swintransformer.py:185-189); pad tokens attend freely in
        # un-shifted windows — reproduced standard Swin behavior
        Hp = -(-H // ws) * ws
        Wp = -(-W // ws) * ws
        y = jnp.pad(y, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(Hp, Wp, ws, shift))
        else:
            mask = None
        wins = _window_partition(y, ws)
        wins = WindowMSA(C, self.num_heads, ws, dtype=self.dtype,
                         name="attn")(wins, mask)
        y = _window_reverse(wins, ws, B, Hp, Wp)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = x + y[:, :H, :W]

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(C * self.mlp_ratio, dtype=self.dtype, name="ffn_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(C, dtype=self.dtype, name="ffn_fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    """2x2 patch concat + LN + linear 4C -> 2C."""
    out_dims: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        # odd sizes: zero-pad to even, as the torch PatchMerging does
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
            B, H // 2, W // 2, 4 * C)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(self.out_dims, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class SwinTransformer(nn.Module):
    """Multi-scale Swin backbone, NHWC in/out.

    Defaults = Swin-T (reference swintransformer.py:522-535): embed 96,
    depths (2,2,6,2), heads (3,6,12,24), window 7, patch 4.
    """
    embed_dims: int = 96
    patch_size: int = 4
    window_size: int = 7
    mlp_ratio: int = 4
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    patch_norm: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, H, W, 3] -> tuple of [B, H/4/2^i, W/4/2^i, C*2^i]."""
        del train  # no droppath/dropout at inference parity
        p = self.patch_size
        B, H, W, _ = x.shape
        assert H % p == 0 and W % p == 0, \
            "input must be a multiple of the patch size"
        x = nn.Conv(self.embed_dims, (p, p), (p, p), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)

        outs = []
        dims = self.embed_dims
        for i, depth in enumerate(self.depths):
            for b in range(depth):
                x = SwinBlock(dims, self.num_heads[i], self.window_size,
                              shift=0 if b % 2 == 0 else self.window_size // 2,
                              mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                              name=f"stage{i}_block{b}")(x)
            if i in self.out_indices:
                o = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"out_norm{i}")(x)
                outs.append(o)
            if i < len(self.depths) - 1:
                x = PatchMerging(dims * 2, dtype=self.dtype,
                                 name=f"downsample{i}")(x)
                dims *= 2
        return tuple(outs)
