"""Epipolar geometry tests on synthetic two-view scenes with known ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dr3_tpu.geometry import epipolar, ransac
from dr3_tpu.geometry.lie import SO3
from dr3_tpu.models.camera import Pinhole


def make_two_view(rng, n=200, noise=0.0, outlier_frac=0.0):
    """Synthetic scene: cam1 at origin, cam2 at known (R, t)."""
    cam = Pinhole.kitti()
    K = np.asarray(cam.K)
    # points in front of both cameras
    X = np.stack([
        rng.uniform(-5, 5, n), rng.uniform(-2, 2, n), rng.uniform(4, 20, n)
    ], axis=-1).astype(np.float32)
    R = np.asarray(SO3.exp(jnp.asarray([0.02, -0.03, 0.01])).matrix())
    t = np.asarray([-0.8, 0.05, 0.3], np.float32)
    t = t / np.linalg.norm(t)

    def proj(P, X):
        x = X @ P[:, :3].T + P[:, 3]
        return x[:, :2] / x[:, 2:3]

    P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = K @ np.hstack([R, t[:, None]])
    p1 = proj(P1, X).astype(np.float32)
    p2 = proj(P2, X).astype(np.float32)
    if noise:
        p1 += rng.normal(0, noise, p1.shape).astype(np.float32)
        p2 += rng.normal(0, noise, p2.shape).astype(np.float32)
    n_out = int(outlier_frac * n)
    if n_out:
        p2[:n_out] = rng.uniform([0, 0], [1240, 376], (n_out, 2)).astype(np.float32)
    # ground-truth F = K^-T [t]x R K^-1
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    F = np.linalg.inv(K).T @ tx @ R @ np.linalg.inv(K)
    F = F / np.linalg.norm(F)
    return dict(X=X, R=R, t=t, K=K, p1=p1, p2=p2, F=F, n_outliers=n_out)


def _f_error(F1, F2):
    F1 = F1 / np.linalg.norm(F1)
    F2 = F2 / np.linalg.norm(F2)
    return min(np.linalg.norm(F1 - F2), np.linalg.norm(F1 + F2))


def test_fit_fundamental_exact(rng):
    sc = make_two_view(rng)
    w = np.ones(len(sc["p1"]), np.float32)
    F = np.asarray(epipolar.fit_fundamental(
        jnp.asarray(sc["p1"]), jnp.asarray(sc["p2"]), jnp.asarray(w)))
    assert _f_error(F, sc["F"]) < 1e-3


def test_fit_fundamental_masked_rows_ignored(rng):
    sc = make_two_view(rng)
    p2 = sc["p2"].copy()
    p2[:50] = 1e6  # corrupt masked-out rows
    w = np.ones(len(sc["p1"]), np.float32)
    w[:50] = 0.0
    F = np.asarray(epipolar.fit_fundamental(
        jnp.asarray(sc["p1"]), jnp.asarray(p2), jnp.asarray(w)))
    assert _f_error(F, sc["F"]) < 1e-3


def test_rank2(rng):
    sc = make_two_view(rng)
    F = np.asarray(epipolar.fit_fundamental(
        jnp.asarray(sc["p1"]), jnp.asarray(sc["p2"]),
        jnp.ones(len(sc["p1"]), np.float32)))
    s = np.linalg.svd(F, compute_uv=False)
    assert s[2] < 1e-6 * s[0]


def test_epipolar_errors_zero_on_clean(rng):
    sc = make_two_view(rng)
    d1, d2 = epipolar.epipolar_errors(jnp.asarray(sc["F"], jnp.float32),
                                      jnp.asarray(sc["p1"]), jnp.asarray(sc["p2"]))
    assert float(jnp.max(d1)) < 1e-2
    assert float(jnp.max(d2)) < 1e-2


def test_decompose_essential_recovers_pose(rng):
    sc = make_two_view(rng)
    K = jnp.asarray(sc["K"], jnp.float32)
    F = jnp.asarray(sc["F"], jnp.float32)
    E = epipolar.essential_from_fundamental(F, K)
    hyp = epipolar.decompose_essential(E)
    # one of the four must match ground truth up to scale on t
    errs_R = [np.linalg.norm(np.asarray(hyp.R[i]) - sc["R"]) for i in range(4)]
    errs_t = [min(np.linalg.norm(np.asarray(hyp.t[i]) - sc["t"]),
                  np.linalg.norm(np.asarray(hyp.t[i]) + sc["t"])) for i in range(4)]
    assert min(errs_R) < 1e-3
    assert min(errs_t) < 1e-3


def test_triangulate_exact(rng):
    sc = make_two_view(rng)
    K = sc["K"]
    P1 = jnp.asarray(K @ np.hstack([np.eye(3), np.zeros((3, 1))]), jnp.float32)
    P2 = jnp.asarray(K @ np.hstack([sc["R"], sc["t"][:, None]]), jnp.float32)
    X = np.asarray(epipolar.triangulate(P1, P2, jnp.asarray(sc["p1"]), jnp.asarray(sc["p2"])))
    np.testing.assert_allclose(X, sc["X"], atol=5e-2, rtol=1e-3)


def test_triangulate_broadcast_hypotheses(rng):
    sc = make_two_view(rng, n=50)
    K = jnp.asarray(sc["K"], jnp.float32)
    E = epipolar.essential_from_fundamental(jnp.asarray(sc["F"], jnp.float32), K)
    hyp = epipolar.decompose_essential(E)
    P1 = epipolar.projection_matrix(K, jnp.eye(3), jnp.zeros(3))
    P2s = epipolar.projection_matrix(K, hyp.R, hyp.t)  # [4, 3, 4]
    X = epipolar.triangulate(P1, P2s[:, None], jnp.asarray(sc["p1"]), jnp.asarray(sc["p2"]))
    assert X.shape == (4, 1, 50, 3) or X.shape == (4, 50, 3)


def test_check_rt_selects_true_pose(rng):
    sc = make_two_view(rng)
    K = jnp.asarray(sc["K"], jnp.float32)
    E = epipolar.essential_from_fundamental(jnp.asarray(sc["F"], jnp.float32), K)
    hyp = epipolar.decompose_essential(E)
    w = jnp.ones(len(sc["p1"]), jnp.float32)
    best, results, clear = epipolar.disambiguate_pose(
        hyp, jnp.asarray(sc["p1"]), jnp.asarray(sc["p2"]), w, K)
    bi = int(best)
    assert bool(clear)
    assert np.linalg.norm(np.asarray(hyp.R[bi]) - sc["R"]) < 1e-3
    assert int(results.n_good[bi]) > 190


def test_ransac_fundamental_with_outliers(rng):
    sc = make_two_view(rng, n=300, noise=0.3, outlier_frac=0.3)
    key = jax.random.PRNGKey(0)
    res = ransac.ransac_fundamental(
        key, jnp.asarray(sc["p1"]), jnp.asarray(sc["p2"]),
        jnp.ones(300, jnp.float32), n_samples=200, sigma=1.0)
    inl = np.asarray(res.inliers)
    # outliers are rows [0, n_out); the vast majority must be rejected
    assert inl[:sc["n_outliers"]].mean() < 0.1
    assert inl[sc["n_outliers"]:].mean() > 0.9
    assert _f_error(np.asarray(res.model), sc["F"]) < 5e-2


def test_check_rt_rejects_behind_camera(rng):
    # points behind camera 2 should not count as good
    sc = make_two_view(rng, n=100)
    K = jnp.asarray(sc["K"], jnp.float32)
    R_wrong = jnp.asarray(sc["R"] @ np.diag([1.0, -1.0, -1.0]).astype(np.float32))
    res = epipolar.check_rt(R_wrong, jnp.asarray(sc["t"]),
                            jnp.asarray(sc["p1"]), jnp.asarray(sc["p2"]),
                            jnp.ones(100, jnp.float32), K)
    assert int(res.n_good) < 60
