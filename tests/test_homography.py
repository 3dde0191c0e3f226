"""Homography DLT + RANSAC tests on synthetic correspondences."""

import jax
import jax.numpy as jnp
import numpy as np

from dr3_tpu.geometry import homography, ransac


def random_h(rng):
    """Realistic stitching homography: moderate affine part, small
    perspective terms so the horizon (w=0) stays far from the point domain."""
    H = np.eye(3) + 0.1 * rng.normal(size=(3, 3))
    H[2, :2] = 1e-4 * rng.normal(size=2)
    H[2, 2] = 1.0
    return H.astype(np.float32)


def apply_np(H, pts):
    ph = np.hstack([pts, np.ones((len(pts), 1))]) @ H.T
    return ph[:, :2] / ph[:, 2:3]


def test_affine_mats():
    T = np.asarray(homography.affine_translate(3.0, -2.0))
    np.testing.assert_allclose(T, [[1, 0, 3], [0, 1, -2]])
    R = np.asarray(homography.affine_rotate(0.0, 0.0, 90.0))
    np.testing.assert_allclose(R @ np.array([1.0, 0.0, 1.0]), [0.0, -1.0], atol=1e-6)
    S = np.asarray(homography.affine_scale(2.0, 0.5))
    np.testing.assert_allclose(S @ np.array([4.0, 4.0, 1.0]), [8.0, 2.0])


def test_fit_homography_exact(rng):
    H = random_h(rng)
    src = rng.uniform(0, 500, size=(64, 2)).astype(np.float32)
    dst = apply_np(H, src).astype(np.float32)
    Hest = np.asarray(homography.fit_homography(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(Hest / Hest[2, 2], H / H[2, 2], atol=1e-3)


def test_fit_homography_weighted_ignores_masked(rng):
    H = random_h(rng)
    src = rng.uniform(0, 500, size=(64, 2)).astype(np.float32)
    dst = apply_np(H, src).astype(np.float32)
    dst[:10] = 1e5
    w = np.ones(64, np.float32)
    w[:10] = 0.0
    Hest = np.asarray(homography.fit_homography(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)))
    np.testing.assert_allclose(Hest / Hest[2, 2], H / H[2, 2], atol=1e-3)


def test_fit_translation(rng):
    src = rng.uniform(0, 100, size=(32, 2)).astype(np.float32)
    dst = src + np.asarray([5.0, -3.0], np.float32)
    H = np.asarray(homography.fit_translation(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(H[:2, 2], [5.0, -3.0], atol=1e-5)
    np.testing.assert_allclose(H[:2, :2], np.eye(2), atol=1e-6)


def test_apply_homography_identity():
    pts = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    out = homography.apply_homography(jnp.eye(3), pts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-6)


def test_ransac_homography_outliers(rng):
    H = random_h(rng)
    n, n_out = 256, 80
    src = rng.uniform(0, 500, size=(n, 2)).astype(np.float32)
    dst = apply_np(H, src).astype(np.float32)
    dst[:n_out] = rng.uniform(0, 500, size=(n_out, 2)).astype(np.float32)
    res = ransac.ransac_homography(
        jax.random.PRNGKey(1), jnp.asarray(src), jnp.asarray(dst),
        jnp.ones(n, jnp.float32), n_samples=300, threshold=3.0)
    inl = np.asarray(res.inliers)
    assert inl[n_out:].mean() > 0.95
    assert inl[:n_out].mean() < 0.05
    Hest = np.asarray(res.model)
    np.testing.assert_allclose(Hest / Hest[2, 2], H / H[2, 2], atol=1e-2)


def test_ransac_translation_mode(rng):
    n, n_out = 128, 30
    src = rng.uniform(0, 300, size=(n, 2)).astype(np.float32)
    dst = src + np.asarray([12.0, 7.0], np.float32)
    dst[:n_out] += rng.uniform(20, 80, size=(n_out, 2)).astype(np.float32)
    res = ransac.ransac_homography(
        jax.random.PRNGKey(2), jnp.asarray(src), jnp.asarray(dst),
        jnp.ones(n, jnp.float32), n_samples=64, threshold=3.0, translate_only=True)
    H = np.asarray(res.model)
    np.testing.assert_allclose(H[:2, 2], [12.0, 7.0], atol=0.5)


def test_ransac_jits(rng):
    src = rng.uniform(0, 500, size=(64, 2)).astype(np.float32)
    H = random_h(rng)
    dst = apply_np(H, src).astype(np.float32)

    @jax.jit
    def run(key, src, dst, w):
        return ransac.ransac_homography(key, src, dst, w, n_samples=50)

    res = run(jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(dst),
              jnp.ones(64, jnp.float32))
    assert int(res.n_inliers) > 60
