"""Two-view bootstrap tests on synthetic scenes with known ground truth."""

import jax
import jax.numpy as jnp
import numpy as np

from dr3_tpu.pipelines.twoview_init import initialize_two_view
from dr3_tpu.utils.config import Config
from tests.test_epipolar import make_two_view


def test_init_recovers_pose_and_scale(rng):
    sc = make_two_view(rng, n=300, noise=0.3)
    key = jax.random.PRNGKey(0)
    res = initialize_two_view(key, jnp.asarray(sc["p1"]), jnp.asarray(sc["p2"]),
                              jnp.ones(300, bool), jnp.asarray(sc["K"], jnp.float32),
                              Config())
    assert bool(res.success)
    R_est = np.asarray(res.T_cur_ref.rotation().matrix())
    assert np.linalg.norm(R_est - sc["R"]) < 5e-2
    # map_scale=1.0 => median depth of accepted points is 1.0
    good = np.asarray(res.good)
    z = np.asarray(res.points)[good][:, 2]
    np.testing.assert_allclose(np.median(z), 1.0, atol=0.05)
    # translation direction preserved after rescale
    t_est = np.asarray(res.T_cur_ref.t)
    t_dir = t_est / np.linalg.norm(t_est)
    assert min(np.linalg.norm(t_dir - sc["t"]), np.linalg.norm(t_dir + sc["t"])) < 0.1


def test_init_fails_without_parallax(rng):
    # pure rotation: no triangulable structure
    from dr3_tpu.geometry.lie import SO3
    from dr3_tpu.models.camera import Pinhole

    cam = Pinhole.kitti()
    K = np.asarray(cam.K)
    X = np.stack([rng.uniform(-5, 5, 200), rng.uniform(-2, 2, 200),
                  rng.uniform(5, 20, 200)], -1).astype(np.float32)
    R = np.asarray(SO3.exp(jnp.asarray([0.0, 0.03, 0.0])).matrix())

    def proj(P, X):
        x = X @ P[:, :3].T + P[:, 3]
        return (x[:, :2] / x[:, 2:3]).astype(np.float32)

    p1 = proj(K @ np.hstack([np.eye(3), np.zeros((3, 1))]), X)
    p2 = proj(K @ np.hstack([R, np.zeros((3, 1))]), X)
    res = initialize_two_view(jax.random.PRNGKey(0), jnp.asarray(p1),
                              jnp.asarray(p2), jnp.ones(200, bool),
                              jnp.asarray(K, jnp.float32), Config())
    assert not bool(res.success)  # parallax gate must reject


def test_init_fails_with_mostly_outliers(rng):
    sc = make_two_view(rng, n=200, outlier_frac=0.8)
    res = initialize_two_view(jax.random.PRNGKey(0), jnp.asarray(sc["p1"]),
                              jnp.asarray(sc["p2"]), jnp.ones(200, bool),
                              jnp.asarray(sc["K"], jnp.float32), Config())
    # either outright failure or very few accepted points
    assert (not bool(res.success)) or int(res.n_good) < 100
