"""Pinhole camera tests: projection round trips, distortion, bounds."""

import jax.numpy as jnp
import numpy as np

from dr3_tpu.models.camera import Pinhole


def test_project_unproject_no_distortion(rng):
    cam = Pinhole.kitti()
    xyz = rng.uniform(0.5, 10.0, size=(100, 3)).astype(np.float32)
    xyz[:, 0] = rng.uniform(-3, 3, size=100)
    xyz[:, 1] = rng.uniform(-1, 1, size=100)
    px = cam.world2cam(jnp.asarray(xyz))
    f = cam.cam2world(px)
    # bearing must be parallel to the original ray
    dirs = xyz / np.linalg.norm(xyz, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(f), dirs, atol=1e-4)


def test_project_center():
    cam = Pinhole.kitti()
    px = cam.world2cam(jnp.asarray([0.0, 0.0, 5.0]))
    np.testing.assert_allclose(np.asarray(px), [607.1928, 185.2157], atol=1e-3)


def test_distort_undistort_roundtrip(rng):
    cam = Pinhole.create(640, 480, 500.0, 500.0, 320.0, 240.0,
                         d=(-0.28, 0.07, 1e-4, -2e-4, 0.0))
    xy = rng.uniform(-0.4, 0.4, size=(200, 2)).astype(np.float32)
    xyd = cam.distort(jnp.asarray(xy))
    back = cam.undistort(xyd, iters=10)
    np.testing.assert_allclose(np.asarray(back), xy, atol=1e-4)


def test_cam2world_with_distortion_roundtrip(rng):
    cam = Pinhole.create(640, 480, 500.0, 500.0, 320.0, 240.0,
                         d=(-0.28, 0.07, 1e-4, -2e-4, 0.0))
    xyz = np.stack([
        rng.uniform(-1.5, 1.5, 50), rng.uniform(-1.0, 1.0, 50),
        rng.uniform(2.0, 8.0, 50)
    ], axis=-1).astype(np.float32)
    px = cam.world2cam(jnp.asarray(xyz))
    f = np.asarray(cam.cam2world(px))
    dirs = xyz / np.linalg.norm(xyz, axis=-1, keepdims=True)
    np.testing.assert_allclose(f, dirs, atol=1e-3)


def test_is_in_frame_levels():
    cam = Pinhole.kitti()
    px = jnp.asarray([[10.0, 10.0], [1239.0, 375.0], [-1.0, 5.0], [700.0, 200.0]])
    ok0 = np.asarray(cam.is_in_frame(px))
    assert list(ok0) == [True, True, False, True]
    # at level 2 the frame is 310x94
    ok2 = np.asarray(cam.is_in_frame(px, level=2))
    assert list(ok2) == [True, False, False, False]
    # boundary shrink
    okb = np.asarray(cam.is_in_frame(px, boundary=20.0))
    assert list(okb) == [False, False, False, True]


def test_K_matrix():
    cam = Pinhole.kitti()
    K = np.asarray(cam.K)
    assert K.shape == (3, 3)
    np.testing.assert_allclose(K[0, 0], 718.856)
    np.testing.assert_allclose(K[2, 2], 1.0)
