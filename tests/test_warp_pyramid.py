"""Warp + pyramid op tests vs closed forms and scipy reference."""

import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from dr3_tpu.ops import pyramid, warp


def test_half_sample_exact():
    img = jnp.arange(16.0).reshape(4, 4)
    out = np.asarray(pyramid.half_sample(img))
    expected = np.array([[2.5, 4.5], [10.5, 12.5]])
    np.testing.assert_allclose(out, expected)


def test_half_sample_odd_dims():
    img = jnp.ones((5, 7))
    out = pyramid.half_sample(img)
    assert out.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(out), 1.0)


def test_build_pyramid_shapes():
    img = jnp.zeros((376, 1240))
    pyr = pyramid.build_pyramid(img, 4)
    assert [p.shape for p in pyr] == [(376, 1240), (188, 620), (94, 310), (47, 155)]


def test_half_sample_batched():
    imgs = jnp.ones((3, 8, 8))
    assert pyramid.half_sample(imgs).shape == (3, 4, 4)


def test_bilinear_sample_exact_grid(rng):
    img = jnp.asarray(rng.uniform(0, 1, (32, 48)).astype(np.float32))
    xy = jnp.asarray([[5.0, 7.0], [0.0, 0.0], [47.0, 31.0]])
    vals, ok = warp.bilinear_sample(img, xy)
    expected = [img[7, 5], img[0, 0], img[31, 47]]
    np.testing.assert_allclose(np.asarray(vals), np.asarray(expected), atol=1e-6)
    assert np.all(np.asarray(ok))


def test_bilinear_sample_out_of_bounds():
    img = jnp.ones((10, 10))
    vals, ok = warp.bilinear_sample(img, jnp.asarray([[-1.0, 5.0], [5.0, 10.5]]))
    assert not np.any(np.asarray(ok))
    np.testing.assert_allclose(np.asarray(vals), 0.0)


def test_bilinear_matches_scipy(rng):
    img = rng.uniform(0, 1, (64, 64)).astype(np.float32)
    xy = rng.uniform(1, 62, (200, 2)).astype(np.float32)
    vals, _ = warp.bilinear_sample(jnp.asarray(img), jnp.asarray(xy))
    expected = ndimage.map_coordinates(img, [xy[:, 1], xy[:, 0]], order=1)
    np.testing.assert_allclose(np.asarray(vals), expected, atol=1e-5)


def test_warp_perspective_identity(rng):
    img = jnp.asarray(rng.uniform(0, 1, (20, 30)).astype(np.float32))
    out, ok = warp.warp_perspective(img, jnp.eye(3), (20, 30))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
    assert np.all(np.asarray(ok))


def test_warp_perspective_translation(rng):
    img = jnp.asarray(rng.uniform(0, 1, (20, 30)).astype(np.float32))
    H = jnp.eye(3).at[0, 2].set(3.0).at[1, 2].set(2.0)  # shift right 3, down 2
    out, ok = warp.warp_perspective(img, H, (20, 30))
    np.testing.assert_allclose(np.asarray(out)[2:, 3:], np.asarray(img)[:-2, :-3], atol=1e-5)
    assert not np.asarray(ok)[0, 0]  # top-left has no source


def test_warp_affine_matches_perspective(rng):
    img = jnp.asarray(rng.uniform(0, 1, (20, 30)).astype(np.float32))
    M = jnp.asarray([[1.0, 0.0, 2.0], [0.0, 1.0, 1.0]])
    a, _ = warp.warp_affine(img, M, (20, 30))
    H = jnp.eye(3).at[0, 2].set(2.0).at[1, 2].set(1.0)
    b, _ = warp.warp_perspective(img, H, (20, 30))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_spherical_field_center_fixed():
    # the principal axis (image center) maps to itself
    u, v = warp.spherical_warp_field(100, 200, f=150.0)
    np.testing.assert_allclose(float(u[50, 100]), 100.0, atol=1e-3)
    np.testing.assert_allclose(float(v[50, 100]), 50.0, atol=1e-3)


def test_cylindrical_field_center_fixed():
    u, v = warp.cylindrical_warp_field(100, 200, f=150.0)
    np.testing.assert_allclose(float(u[50, 100]), 100.0, atol=1e-3)
    np.testing.assert_allclose(float(v[50, 100]), 50.0, atol=1e-3)


def test_spherical_warp_runs_on_kitti(kitti_pair):
    img = jnp.asarray(kitti_pair[0])
    out = warp.warp_spherical(img, f=718.856)
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()


def test_cylindrical_less_distortion_than_spherical():
    # for the same f, cylindrical keeps vertical lines straighter; sanity:
    # both warps shrink horizontal extent symmetrically
    img = jnp.ones((50, 80))
    s = np.asarray(warp.warp_spherical(img, f=40.0))
    c = np.asarray(warp.warp_cylindrical(img, f=40.0))
    assert s[25, 1] == 0.0 and c[25, 1] == 0.0  # corners fall outside source
    assert s[25, 40] > 0.9 and c[25, 40] > 0.9
