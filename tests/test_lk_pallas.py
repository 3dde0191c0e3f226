"""Pallas LK kernel tests (interpreter mode on CPU — same kernel code path
that compiles on TPU)."""

import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from dr3_tpu.ops import lk, pyramid
from dr3_tpu.ops.pallas.lk_pallas import track_pyramid_pallas


def smooth(rng, h=128, w=160, sigma=3.0):
    return ndimage.gaussian_filter(rng.uniform(0, 1, (h, w)), sigma).astype(np.float32)


def test_pallas_matches_jnp_reference(rng):
    img = smooth(rng)
    img2 = ndimage.shift(img, (2.3, -1.7), order=1, mode="nearest").astype(np.float32)
    p1 = pyramid.build_pyramid(jnp.asarray(img), 3)
    p2 = pyramid.build_pyramid(jnp.asarray(img2), 3)
    pts = np.stack(np.meshgrid(np.arange(30, 130, 16), np.arange(30, 98, 16)),
                   -1).reshape(-1, 2).astype(np.float32)
    v = jnp.ones(len(pts), bool)
    ref = lk.track_pyramid(p1, p2, jnp.asarray(pts), v, half_window=7, iters=15)
    pal = track_pyramid_pallas(p1, p2, jnp.asarray(pts), v, half_window=7,
                               iters=15, interpret=True)
    both = np.asarray(ref.ok) & np.asarray(pal.ok)
    assert both.mean() > 0.8
    diff = np.abs(np.asarray(ref.pos)[both] - np.asarray(pal.pos)[both]).max()
    assert diff < 1e-2


def test_pallas_recovers_known_shift(rng):
    img = smooth(rng, 160, 192)
    shift = (4.6, -3.1)
    img2 = ndimage.shift(img, shift, order=1, mode="nearest").astype(np.float32)
    p1 = pyramid.build_pyramid(jnp.asarray(img), 3)
    p2 = pyramid.build_pyramid(jnp.asarray(img2), 3)
    pts = np.stack(np.meshgrid(np.arange(40, 150, 20), np.arange(40, 120, 20)),
                   -1).reshape(-1, 2).astype(np.float32)
    v = jnp.ones(len(pts), bool)
    res = track_pyramid_pallas(p1, p2, jnp.asarray(pts), v, half_window=7,
                               iters=12, interpret=True)
    ok = np.asarray(res.ok)
    flow = np.asarray(res.pos) - pts
    assert ok.mean() > 0.8
    np.testing.assert_allclose(flow[ok].mean(0), [shift[1], shift[0]], atol=0.15)


def test_pallas_flat_region_rejected():
    img = jnp.full((96, 128), 0.5)
    pyr = pyramid.build_pyramid(img, 2)
    res = track_pyramid_pallas(pyr, pyr, jnp.asarray([[50.0, 50.0]]),
                               jnp.ones(1, bool), half_window=7, interpret=True)
    assert not bool(res.ok[0])


def test_pallas_nonfinite_positions_safe(rng):
    """NaN/inf/out-of-range positions (diverged or empty track slots) must
    not reach the kernel's dynamic loads — on TPU an OOB vector load
    crashes the worker process. Garbage tracks return finite output with
    ok=False; healthy tracks are unaffected."""
    img = smooth(rng)
    img2 = ndimage.shift(img, (1.2, -0.8), order=1, mode="nearest").astype(np.float32)
    p1 = pyramid.build_pyramid(jnp.asarray(img), 3)
    p2 = pyramid.build_pyramid(jnp.asarray(img2), 3)
    pts = np.stack(np.meshgrid(np.arange(30, 130, 16), np.arange(30, 98, 16)),
                   -1).reshape(-1, 2).astype(np.float32)
    bad = pts.copy()
    bad[0] = [np.nan, np.nan]
    bad[1] = [np.inf, -np.inf]
    bad[2] = [-1e9, 1e9]
    bad[3] = [1e4, -1e4]
    v = jnp.ones(len(bad), bool)
    res = track_pyramid_pallas(p1, p2, jnp.asarray(bad), v, half_window=7,
                               iters=8, interpret=True)
    assert bool(jnp.all(jnp.isfinite(res.pos)))
    ok = np.asarray(res.ok)
    assert not ok[:3].any()   # garbage slots are rejected
    assert ok[4:].mean() > 0.8  # healthy tracks still track
