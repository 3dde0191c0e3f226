"""Compiled Pallas kernels vs jnp oracles at production (KITTI) shapes."""

import jax.numpy as jnp
import numpy as np

from dr3_tpu.ops import corners, lk, pyramid
from dr3_tpu.ops import warp as wref
from dr3_tpu.ops.pallas import detect_pallas, warp_pallas
from dr3_tpu.ops.pallas.lk_pallas import track_pyramid_pallas

H, W = 376, 1240


def _kitti_like(rng):
    from scipy import ndimage

    img = ndimage.gaussian_filter(
        rng.uniform(0, 1, (H, W)).astype(np.float32), 1.2)
    return jnp.asarray((img - img.min()) / (img.max() - img.min() + 1e-9))


def test_lk_compiled_matches_oracle(rng):
    img = _kitti_like(rng)
    shift = (3.3, -2.1)
    from scipy import ndimage

    img2 = jnp.asarray(ndimage.shift(np.asarray(img), shift, order=1,
                                     mode="nearest"))
    p1 = pyramid.build_pyramid(img, 4)
    p2 = pyramid.build_pyramid(img2, 4)
    pts = rng.uniform([30, 30], [W - 30, H - 30], (546, 2)).astype(np.float32)
    v = jnp.ones(546, bool)
    ref = lk.track_pyramid(p1, p2, jnp.asarray(pts), v, half_window=7,
                           iters=10)
    pal = track_pyramid_pallas(p1, p2, jnp.asarray(pts), v, half_window=7,
                               iters=10, interpret=False)
    both = np.asarray(ref.ok) & np.asarray(pal.ok)
    assert both.mean() > 0.8
    diff = np.abs(np.asarray(ref.pos)[both] - np.asarray(pal.pos)[both]).max()
    assert diff < 1e-2, diff
    flow = np.asarray(pal.pos)[both] - pts[both]
    np.testing.assert_allclose(flow.mean(0), [shift[1], shift[0]], atol=0.1)


def test_detect_compiled_matches_oracle(rng):
    img = _kitti_like(rng)
    got = np.asarray(detect_pallas.corner_response_map(img, 10.0,
                                                       interpret=False))
    want = np.asarray(jnp.where(
        corners.nms3x3(corners.fast_score_map(img, 10.0)),
        corners.shi_tomasi_map(img), 0.0))
    # same corner set (FAST + NMS are min/max chains); scores to loose
    # tolerance (min-eigenvalue formula amplifies reassociation noise)
    np.testing.assert_array_equal(got > 0, want > 0)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.05)


def test_warp_perspective_compiled_matches_oracle(rng):
    img = _kitti_like(rng)
    Hm = jnp.asarray([[1.0, 0.015, 7.0], [-0.012, 1.0, 4.0],
                      [2e-5, -1e-5, 1.0]])
    ref, vref = wref.warp_perspective(img, Hm, (H, W))
    out, vout = warp_pallas.warp_perspective(img, Hm, (H, W),
                                             interpret=False)
    bothv = np.asarray(vref) & np.asarray(vout)
    assert bothv.mean() > 0.9
    diff = np.abs(np.asarray(ref) - np.asarray(out))[bothv].max()
    assert diff < 2e-2, diff


def test_warp_spherical_compiled_matches_oracle(rng):
    img = _kitti_like(rng)
    ref = wref.warp_spherical(img, 700.0)
    out = warp_pallas.warp_spherical(img, 700.0, interpret=False)
    diff = np.abs(np.asarray(ref) - np.asarray(out))
    assert np.median(diff) < 1e-3
    assert diff.max() < 5e-2, diff.max()


def test_warp_cylindrical_compiled_matches_oracle(rng):
    img = _kitti_like(rng)
    ref = wref.warp_cylindrical(img, 700.0)
    out = warp_pallas.warp_cylindrical(img, 700.0, interpret=False)
    diff = np.abs(np.asarray(ref) - np.asarray(out))
    assert np.median(diff) < 1e-3
    assert diff.max() < 5e-2, diff.max()
