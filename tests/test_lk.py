"""Pyramidal LK tracking tests: known shifts, rotation, real KITTI pair."""

import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from dr3_tpu.ops import corners, lk, pyramid


def smooth_random_image(rng, h=128, w=160, sigma=3.0):
    img = rng.uniform(0, 1, (h, w)).astype(np.float32)
    return ndimage.gaussian_filter(img, sigma).astype(np.float32)


def test_track_pure_translation(rng):
    img = smooth_random_image(rng)
    shift = (2.3, -1.7)  # (dy, dx)
    img2 = ndimage.shift(img, shift, order=1, mode="nearest").astype(np.float32)
    pyr1 = pyramid.build_pyramid(jnp.asarray(img), 3)
    pyr2 = pyramid.build_pyramid(jnp.asarray(img2), 3)

    pts = np.stack(np.meshgrid(np.arange(30, 130, 12), np.arange(30, 98, 12)),
                   -1).reshape(-1, 2).astype(np.float32)
    res = lk.track_pyramid(pyr1, pyr2, jnp.asarray(pts),
                           jnp.ones(len(pts), bool), half_window=7, iters=15)
    ok = np.asarray(res.ok)
    flow = np.asarray(res.pos) - pts
    assert ok.mean() > 0.8
    np.testing.assert_allclose(flow[ok].mean(0), [shift[1], shift[0]], atol=0.1)
    assert flow[ok].std(0).max() < 0.2


def test_track_large_displacement_needs_pyramid(rng):
    img = smooth_random_image(rng, 192, 256, sigma=4.0)
    shift = (11.0, -9.0)
    img2 = ndimage.shift(img, shift, order=1, mode="nearest").astype(np.float32)
    pyr1 = pyramid.build_pyramid(jnp.asarray(img), 4)
    pyr2 = pyramid.build_pyramid(jnp.asarray(img2), 4)
    pts = np.stack(np.meshgrid(np.arange(40, 216, 16), np.arange(40, 152, 16)),
                   -1).reshape(-1, 2).astype(np.float32)
    res = lk.track_pyramid(pyr1, pyr2, jnp.asarray(pts),
                           jnp.ones(len(pts), bool), half_window=7, iters=15)
    ok = np.asarray(res.ok)
    flow = np.asarray(res.pos) - pts
    assert ok.mean() > 0.7
    np.testing.assert_allclose(flow[ok].mean(0), [shift[1], shift[0]], atol=0.15)


def test_track_flat_region_rejected(rng):
    img = np.full((64, 64), 0.5, np.float32)
    pyr = pyramid.build_pyramid(jnp.asarray(img), 2)
    pts = jnp.asarray([[32.0, 32.0]])
    res = lk.track_pyramid(pyr, pyr, pts, jnp.ones(1, bool), half_window=7)
    assert not bool(res.ok[0])  # zero gradient => ill-conditioned


def test_track_invalid_mask_passthrough(rng):
    img = smooth_random_image(rng)
    pyr = pyramid.build_pyramid(jnp.asarray(img), 3)
    pts = jnp.asarray([[50.0, 50.0], [60.0, 60.0]])
    res = lk.track_pyramid(pyr, pyr, pts, jnp.asarray([True, False]), half_window=7)
    assert bool(res.ok[0])
    assert not bool(res.ok[1])


def test_track_identity_stays_put(rng):
    img = smooth_random_image(rng)
    pyr = pyramid.build_pyramid(jnp.asarray(img), 3)
    pts = np.stack(np.meshgrid(np.arange(30, 130, 20), np.arange(30, 98, 20)),
                   -1).reshape(-1, 2).astype(np.float32)
    res = lk.track_pyramid(pyr, pyr, jnp.asarray(pts), jnp.ones(len(pts), bool),
                           half_window=7)
    drift = np.abs(np.asarray(res.pos) - pts).max()
    assert drift < 1e-3


def test_track_kitti_pair(kitti_pair):
    """End-to-end: detect on kitti0, LK-track to kitti1; the reference
    requires >=100 tracked for init (src/initialization.cpp:655)."""
    a, b = kitti_pair
    pyr1 = pyramid.build_pyramid(jnp.asarray(a), 4)
    pyr2 = pyramid.build_pyramid(jnp.asarray(b), 4)
    feats = corners.detect_features(pyr1[:3], cell_size=30)
    res = lk.track_pyramid(pyr1, pyr2, feats.xy, feats.valid,
                           half_window=10, iters=15)
    n_tracked = int(jnp.sum(res.ok))
    assert n_tracked >= 100
    # KITTI forward motion: most flow is modest; sanity-check magnitudes
    flow = np.asarray(res.pos) - np.asarray(feats.xy)
    ok = np.asarray(res.ok)
    med = np.median(np.abs(flow[ok]), axis=0)
    assert med.max() < 40.0
