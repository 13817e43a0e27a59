"""FPS / ball query / render-ray library oracles."""
import jax
import jax.numpy as jnp
import numpy as np

from coocc_tpu.ops.fps import ball_query, furthest_point_sample, gather_points


def test_fps_matches_sequential_oracle():
    rng = np.random.RandomState(0)
    pts = rng.randn(64, 3).astype(np.float32)
    mask = np.ones(64, bool)
    S = 8
    idx = np.asarray(furthest_point_sample(
        jnp.asarray(pts), jnp.asarray(mask), S))

    # sequential numpy oracle (CUDA kernel semantics: seed = first point)
    sel = [0]
    min_d2 = np.full(64, 1e10)
    for _ in range(S - 1):
        d2 = np.sum((pts - pts[sel[-1]]) ** 2, axis=-1)
        min_d2 = np.minimum(min_d2, d2)
        sel.append(int(np.argmax(min_d2)))
    np.testing.assert_array_equal(idx, np.array(sel))


def test_fps_ignores_padding():
    rng = np.random.RandomState(1)
    pts = rng.randn(32, 3).astype(np.float32)
    pts[16:] = 1e6  # far-away padding would dominate FPS if unmasked
    mask = np.zeros(32, bool)
    mask[:16] = True
    idx = np.asarray(furthest_point_sample(
        jnp.asarray(pts), jnp.asarray(mask), 6))
    assert idx.max() < 16


def test_ball_query_semantics():
    pts = np.array([[0, 0, 0], [0.1, 0, 0], [5, 5, 5], [0, 0.2, 0]],
                   np.float32)
    centers = np.array([[0, 0, 0], [9, 9, 9]], np.float32)
    out = np.asarray(ball_query(jnp.asarray(centers), jnp.asarray(pts),
                                jnp.ones(4, bool), radius=1.0, num_samples=3))
    # center 0: neighbours 0, 1, 3 (in point order)
    np.testing.assert_array_equal(out[0], [0, 1, 3])
    # center 1: none in radius -> fill with 0
    np.testing.assert_array_equal(out[1], [0, 0, 0])


def test_ball_query_fill_repeats_first():
    pts = np.array([[0, 0, 0], [0.1, 0, 0]], np.float32)
    centers = np.array([[0, 0, 0]], np.float32)
    out = np.asarray(ball_query(jnp.asarray(centers), jnp.asarray(pts),
                                jnp.ones(2, bool), radius=1.0, num_samples=4))
    np.testing.assert_array_equal(out[0], [0, 1, 0, 0])


def test_gather_points():
    feats = jnp.arange(12.0).reshape(4, 3)
    out = gather_points(feats, jnp.array([2, 0]))
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(feats)[[2, 0]])


def test_render_rays_library():
    from coocc_tpu.models.render_ray import (raw2outputs, render_rays,
                                             sample_along_camera_ray,
                                             sample_pdf)
    R, S = 4, 16
    ray_o = jnp.zeros((R, 3))
    ray_d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (R, 1))
    rs = sample_along_camera_ray(ray_o, ray_d, 0.5, 10.0, S)
    assert rs.pts.shape == (R, S, 3)
    assert float(rs.z_vals.min()) >= 0.5 and float(rs.z_vals.max()) <= 10.0
    assert bool(jnp.all(jnp.diff(rs.z_vals, axis=-1) > 0))

    # opaque wall at depth ~2: expected depth ~2
    def feature_fn(pts):
        return pts

    def rgb_sigma_fn(pts):
        sigma = jnp.where(pts[..., 2] > 2.0, 50.0, 0.0)
        rgb = jnp.ones(pts.shape[:-1] + (3,)) * 0.5
        return rgb, sigma

    out = render_rays(ray_o, ray_d, feature_fn, rgb_sigma_fn, 0.5, 10.0,
                      n_samples=64, n_importance=32)
    assert abs(float(out["depth"].mean()) - 2.0) < 0.3
    assert abs(float(out["depth_fine"].mean()) - 2.0) < 0.3
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               0.5 * np.ones((R, 3)), atol=0.05)

    # sample_pdf concentrates samples where weights are
    bins = jnp.tile(jnp.linspace(0.0, 1.0, 9)[None], (2, 1))
    w = jnp.zeros((2, 8)).at[:, 4].set(1.0)
    z = sample_pdf(bins, w, 16, det=True)
    assert float(jnp.mean((z > 0.5) & (z < 0.625))) > 0.8


def test_projector_inbounds():
    from coocc_tpu.models.render_ray import Projector
    intr = jnp.array([[[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]]])
    rots = jnp.eye(3)[None]
    trans = jnp.zeros((1, 3))
    proj = Projector(intr, rots, trans, img_hw=(48, 64))
    pts = jnp.array([[0.0, 0.0, 5.0], [100.0, 0.0, 1.0]])
    uv, mask = proj.project(pts)
    assert bool(mask[0, 0]) and not bool(mask[0, 1])
    np.testing.assert_allclose(np.asarray(uv[0, 0]), [32.0, 24.0], atol=1e-4)


def test_lidarseg_submission_roundtrip(tmp_path):
    from coocc_tpu.evaluation.savers import (save_output_nuscenes_lidarseg,
                                             validate_lidarseg_submission)
    preds = np.random.RandomState(0).randint(1, 17, 100).astype(np.uint8)
    save_output_nuscenes_lidarseg(preds, str(tmp_path), "tok123")
    assert validate_lidarseg_submission(str(tmp_path))
    bad = np.zeros(10, np.uint8)  # class 0 is not allowed
    save_output_nuscenes_lidarseg(bad, str(tmp_path), "tok124")
    assert not validate_lidarseg_submission(str(tmp_path))
