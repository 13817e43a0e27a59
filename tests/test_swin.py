"""Swin backbone: numpy oracles for the index/mask math + forward shapes."""
import jax
import jax.numpy as jnp
import numpy as np

from coocc_tpu.nn.swin import (SwinTransformer, WindowMSA, _rel_pos_index,
                               _shift_attn_mask, _window_partition,
                               _window_reverse)


def test_rel_pos_index_oracle():
    wh, ww = 3, 4
    idx = _rel_pos_index(wh, ww)
    N = wh * ww
    for a in range(N):
        for b in range(N):
            ah, aw = divmod(a, ww)
            bh, bw = divmod(b, ww)
            ref = (ah - bh + wh - 1) * (2 * ww - 1) + (aw - bw + ww - 1)
            assert idx[a, b] == ref
    assert idx.min() >= 0 and idx.max() < (2 * wh - 1) * (2 * ww - 1)


def test_shift_mask_blocks_seams():
    H = W = 8
    ws, shift = 4, 2
    mask = _shift_attn_mask(H, W, ws, shift)
    # rolled coordinate -> original coordinate region id
    img = np.zeros((H, W), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wss in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wss] = cnt
            cnt += 1
    wins = img.reshape(H // ws, ws, W // ws, ws).transpose(0, 2, 1, 3)
    wins = wins.reshape(-1, ws * ws)
    for w in range(wins.shape[0]):
        for a in range(ws * ws):
            for b in range(ws * ws):
                same = wins[w, a] == wins[w, b]
                assert (mask[w, a, b] == 0.0) == same


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 8, 12, 5).astype(np.float32))
    wins = _window_partition(x, 4)
    assert wins.shape == (2 * 2 * 3, 16, 5)
    back = _window_reverse(wins, 4, 2, 8, 12)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_window_msa_oracle(rng):
    """Single-window attention equals an explicit numpy computation."""
    ws, nh, C = 2, 2, 8
    N = ws * ws
    x = jnp.asarray(rng.randn(1, N, C).astype(np.float32))
    mod = WindowMSA(C, nh, ws)
    v = mod.init(jax.random.PRNGKey(0), x)
    got = np.asarray(mod.apply(v, x))[0]

    p = jax.tree.map(np.asarray, v["params"])
    qkv = x[0] @ p["qkv"]["kernel"] + p["qkv"]["bias"]
    qkv = qkv.reshape(N, 3, nh, C // nh)
    table = p["relative_position_bias_table"]
    idx = _rel_pos_index(ws, ws)
    out = np.zeros((N, C), np.float32)
    hd = C // nh
    for h in range(nh):
        q, k, vv = qkv[:, 0, h], qkv[:, 1, h], qkv[:, 2, h]
        logits = (q * hd ** -0.5) @ k.T + table[idx, h]
        a = np.exp(logits - logits.max(-1, keepdims=True))
        a = a / a.sum(-1, keepdims=True)
        out[:, h * hd:(h + 1) * hd] = a @ vv
    ref = out @ p["proj"]["kernel"] + p["proj"]["bias"]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_swin_forward_shapes(rng):
    x = jnp.asarray(rng.randn(1, 32, 88, 3).astype(np.float32))
    swin = SwinTransformer(embed_dims=24, depths=(1, 1, 2, 1),
                           num_heads=(2, 2, 4, 4), window_size=4)
    v = jax.jit(swin.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    outs = jax.jit(
        lambda v, x: swin.apply(v, x, train=False))(v, x)
    assert [o.shape for o in outs] == [
        (1, 8, 22, 24), (1, 4, 11, 48), (1, 2, 6, 96), (1, 1, 3, 192)]
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()
