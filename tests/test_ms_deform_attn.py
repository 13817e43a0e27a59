"""MSDeformAttn3D: naive-loop oracle for the sampling core + module smoke."""
import jax
import jax.numpy as jnp
import numpy as np

from coocc_tpu.ops.ms_deform_attn import MSDeformAttn3D, ms_deform_attn_3d


def naive_ms_deform(values, locs, weights):
    B, Q, H, L, P, _ = locs.shape
    D = values[0].shape[-1]
    out = np.zeros((B, Q, H, D), np.float32)
    for lvl, vol in enumerate(values):
        X, Y, Z = vol.shape[1:4]
        for b in range(B):
            for q in range(Q):
                for h in range(H):
                    for p in range(P):
                        x = locs[b, q, h, lvl, p, 0] * X - 0.5
                        y = locs[b, q, h, lvl, p, 1] * Y - 0.5
                        z = locs[b, q, h, lvl, p, 2] * Z - 0.5
                        acc = np.zeros(D, np.float32)
                        x0, y0, z0 = (int(np.floor(v)) for v in (x, y, z))
                        for dx in (0, 1):
                            for dy in (0, 1):
                                for dz in (0, 1):
                                    xi, yi, zi = x0 + dx, y0 + dy, z0 + dz
                                    if not (0 <= xi < X and 0 <= yi < Y
                                            and 0 <= zi < Z):
                                        continue
                                    w = ((x - x0) if dx else (1 - (x - x0))) \
                                        * ((y - y0) if dy else (1 - (y - y0))) \
                                        * ((z - z0) if dz else (1 - (z - z0)))
                                    acc += w * vol[b, xi, yi, zi, h]
                        out[b, q, h] += weights[b, q, h, lvl, p] * acc
    return out.reshape(B, Q, H * D)


def test_core_matches_naive(rng):
    B, Q, H, L, P, D = 1, 5, 2, 2, 3, 4
    values = [jnp.asarray(rng.randn(B, 6, 5, 4, H, D).astype(np.float32)),
              jnp.asarray(rng.randn(B, 3, 3, 2, H, D).astype(np.float32))]
    locs = rng.rand(B, Q, H, L, P, 3).astype(np.float32) * 1.2 - 0.1
    w = rng.rand(B, Q, H, L, P).astype(np.float32)
    w /= w.reshape(B, Q, H, -1).sum(-1)[..., None, None]
    got = np.asarray(ms_deform_attn_3d(values, jnp.asarray(locs),
                                       jnp.asarray(w)))
    ref = naive_ms_deform([np.asarray(v) for v in values], locs, w)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_module_smoke(rng):
    B, Q, C = 2, 7, 16
    levels = [jnp.asarray(rng.randn(B, 8, 8, 4, C).astype(np.float32)),
              jnp.asarray(rng.randn(B, 4, 4, 2, C).astype(np.float32)),
              jnp.asarray(rng.randn(B, 2, 2, 1, C).astype(np.float32))]
    q = jnp.asarray(rng.randn(B, Q, C).astype(np.float32))
    ref_pts = jnp.asarray(rng.rand(B, Q, 3).astype(np.float32))
    mod = MSDeformAttn3D(embed_dims=C, num_heads=4, num_levels=3,
                         num_points=2)
    v = mod.init(jax.random.PRNGKey(0), q, levels, ref_pts)
    out = mod.apply(v, q, levels, ref_pts)
    assert out.shape == (B, Q, C)
    assert np.isfinite(np.asarray(out)).all()
    # zero-init kernels: output = query + out_proj(weighted value means)
    assert np.abs(np.asarray(out - q)).max() > 1e-6
