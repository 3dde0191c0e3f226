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


def test_template_atlas_layout(rng):
    """Every atlas cell must hold its template exactly at the stated
    center, edge-replicated to the cell borders."""
    n, W = 7, 9
    t = rng.uniform(0, 1, (n, W, W)).astype(np.float32)
    atlas, centers = lk.template_atlas(jnp.asarray(t))
    a = np.asarray(atlas)
    c = np.asarray(centers)
    half = (W - 1) // 2
    for i in range(n):
        cx, cy = int(c[i, 0]), int(c[i, 1])
        patch = a[cy - half:cy + half + 1, cx - half:cx + half + 1]
        np.testing.assert_allclose(patch, t[i], atol=0)
        # edge replication just outside the patch
        np.testing.assert_allclose(a[cy - half - 1, cx - half:cx + half + 1],
                                   t[i][0], atol=0)


def test_atlas_align_matches_jnp_align(rng):
    """The Pallas template-atlas feature_align (interpreter mode) must
    recover template positions like the jnp align_to_templates path."""
    from dr3_tpu.ops.pallas.lk_pallas import track_level_pallas

    img = smooth(rng, 160, 192, sigma=2.0)
    true = np.stack(np.meshgrid(np.arange(40, 150, 18), np.arange(40, 120, 18)),
                    -1).reshape(-1, 2).astype(np.float32)
    templates = lk.extract_patches(jnp.asarray(img), jnp.asarray(true), 4)
    start = true + rng.uniform(-2.0, 2.0, true.shape).astype(np.float32)
    v = jnp.ones(len(true), bool)

    ref = lk.align_to_templates(jnp.asarray(img), templates,
                                jnp.asarray(start), v, iters=10)
    atlas, centers = lk.template_atlas(templates)
    pos, ok, err = track_level_pallas(atlas, jnp.asarray(img), centers,
                                      jnp.asarray(start), half_window=4,
                                      iters=10, min_eig=0.0, interpret=True)
    ok = np.asarray(ok) & np.asarray(ref.ok)
    assert ok.mean() > 0.8
    # both refine back to the true corner
    e_pal = np.abs(np.asarray(pos)[ok] - true[ok]).max()
    e_jnp = np.abs(np.asarray(ref.pos)[ok] - true[ok]).max()
    assert e_pal < 0.2, e_pal
    assert e_jnp < 0.2, e_jnp


def test_sample_patches_pallas_matches_bilinear(rng):
    from dr3_tpu.ops.pallas.lk_pallas import sample_patches_pallas
    from dr3_tpu.ops.warp import bilinear_sample

    img = smooth(rng, 96, 160, sigma=1.5)
    pts = rng.uniform([6, 6], [150, 90], (23, 2)).astype(np.float32)
    for half in (2, 3):
        got = np.asarray(sample_patches_pallas(jnp.asarray(img),
                                               jnp.asarray(pts), half,
                                               True))
        off = np.arange(-half, half + 1, dtype=np.float32)
        oy, ox = np.meshgrid(off, off, indexing="ij")
        grid = np.stack([ox, oy], -1)
        coords = pts[:, None, None, :] + grid[None]
        want = np.asarray(bilinear_sample(jnp.asarray(img),
                                          jnp.asarray(coords), clamp=True)[0])
        np.testing.assert_allclose(got, want, atol=1e-5)
