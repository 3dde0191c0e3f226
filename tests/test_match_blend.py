"""ZNCC descriptor matching + feathered blending tests."""

import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from dr3_tpu.ops import blend, match


def textured(rng, h=96, w=128):
    return ndimage.gaussian_filter(
        rng.uniform(0, 1, (h, w)), 1.5).astype(np.float32)


def test_descriptors_normalized(rng):
    img = jnp.asarray(textured(rng))
    xy = jnp.asarray(rng.uniform(20, 90, (16, 2)).astype(np.float32))
    d = match.patch_descriptors(img, xy, jnp.ones(16, bool))
    norms = np.linalg.norm(np.asarray(d), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    means = np.asarray(d).mean(axis=1)
    np.testing.assert_allclose(means, 0.0, atol=1e-5)


def test_descriptors_invalid_zeroed(rng):
    img = jnp.asarray(textured(rng))
    xy = jnp.asarray([[30.0, 30.0], [40.0, 40.0]])
    d = match.patch_descriptors(img, xy, jnp.asarray([True, False]))
    assert np.linalg.norm(np.asarray(d)[1]) == 0.0


def test_match_shifted_image(rng):
    img = textured(rng)
    img2 = ndimage.shift(img, (0, 10), order=1, mode="nearest").astype(np.float32)
    xy1 = rng.uniform(25, 85, (32, 2)).astype(np.float32)
    xy2 = (xy1 + np.asarray([10.0, 0.0])).astype(np.float32)  # true correspondences
    perm = rng.permutation(32)
    d1 = match.patch_descriptors(jnp.asarray(img), jnp.asarray(xy1), jnp.ones(32, bool))
    d2 = match.patch_descriptors(jnp.asarray(img2), jnp.asarray(xy2[perm]), jnp.ones(32, bool))
    m = match.match_descriptors(d1, d2, jnp.ones(32, bool), jnp.ones(32, bool),
                                min_score=0.7, ratio=0.99)
    ok = np.asarray(m.ok)
    idx = np.asarray(m.idx2)
    # matched pairs must map back to the permuted true correspondence
    correct = (perm[idx] == np.arange(32)) & ok
    assert ok.sum() > 16
    assert correct.sum() == ok.sum()


def test_match_mutual_rejects_ambiguous():
    # two identical descriptors in set1 vs one in set2: at most one survives
    d = np.zeros((2, 8), np.float32)
    d[:, 0] = 1.0
    d2 = np.zeros((1, 8), np.float32)
    d2[0, 0] = 1.0
    m = match.match_descriptors(jnp.asarray(d), jnp.asarray(d2),
                                jnp.ones(2, bool), jnp.ones(1, bool),
                                min_score=0.5, ratio=0.99)
    assert np.asarray(m.ok).sum() <= 1


def test_column_feather_profile():
    w = np.asarray(blend.column_feather(100, 20.0, 80.0, 10))
    np.testing.assert_allclose(w[:20], 0.0)
    np.testing.assert_allclose(w[81:], 0.0)
    np.testing.assert_allclose(w[30:71], 1.0, atol=1e-5)
    assert 0.0 < w[25] < 1.0 and 0.0 < w[75] < 1.0  # ramps
    np.testing.assert_allclose(w[25], w[75], atol=1e-5)  # symmetric


def test_column_feather_narrow_span():
    w = np.asarray(blend.column_feather(50, 10.0, 20.0, 40))
    assert w.max() <= 1.0 and w.max() > 0.5  # ramp clamps to half-span


def test_accumulate_normalize_roundtrip(rng):
    img = jnp.asarray(rng.uniform(0, 1, (8, 12, 3)).astype(np.float32))
    canvas = jnp.zeros((8, 12, 4))
    valid = jnp.ones((8, 12), bool)
    colw = jnp.full((12,), 0.7)
    canvas = blend.accumulate(canvas, img, valid, colw)
    canvas = blend.accumulate(canvas, img, valid, colw)
    out = blend.normalize(canvas)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_accumulate_masks_invalid(rng):
    img = jnp.ones((4, 6, 3))
    canvas = jnp.zeros((4, 6, 4))
    valid = jnp.zeros((4, 6), bool).at[0, 0].set(True)
    canvas = blend.accumulate(canvas, img, valid, jnp.ones(6))
    out = np.asarray(blend.normalize(canvas))
    assert out[0, 0, 0] == 1.0
    assert out[1:].sum() == 0.0


def test_oriented_descriptors_survive_rotation(rng):
    """oriented=True (intensity-centroid grid rotation, ORB's mechanism —
    reference frame.cpp:22-33): descriptors of the same corners in a
    15-degree-rotated image must still ZNCC-match; the axis-aligned
    variant degrades (round-4 verdict missing item 1)."""
    from dr3_tpu.ops.warp import bilinear_sample

    img = rng.uniform(0, 1, (240, 320)).astype(np.float32)
    img = ndimage.gaussian_filter(img, 2.5).astype(np.float32)
    img = (img - img.min()) / (img.max() - img.min())
    # exact-convention rotation: rot(x) = img(c + R(-th)(x - c)), so a
    # point p in img appears at c + R(th)(p - c) in rot
    th = np.deg2rad(15.0)
    c = np.array([(320 - 1) / 2.0, (240 - 1) / 2.0], np.float32)
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]],
                 np.float32)
    ys, xs = np.meshgrid(np.arange(240, dtype=np.float32),
                         np.arange(320, dtype=np.float32), indexing="ij")
    g = np.stack([xs, ys], -1) - c
    coords = g @ R + c  # (x-c) @ R == R(-th) applied to column vectors
    rot = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(coords),
                                     clamp=True)[0])

    n = 40
    xy = rng.uniform([80, 80], [240, 160], (n, 2)).astype(np.float32)
    xy_rot = ((xy - c) @ R.T + c).astype(np.float32)

    valid = jnp.ones(n, bool)
    scores = {}
    for oriented in (False, True):
        d1 = match.patch_descriptors(jnp.asarray(img), jnp.asarray(xy),
                                     valid, patch=8, spread=3.0,
                                     oriented=oriented)
        d2 = match.patch_descriptors(jnp.asarray(rot), jnp.asarray(xy_rot),
                                     valid, patch=8, spread=3.0,
                                     oriented=oriented)
        scores[oriented] = np.asarray(jnp.sum(d1 * d2, axis=1))
    med_plain = float(np.median(scores[False]))
    med_orient = float(np.median(scores[True]))
    assert med_orient > 0.8, (med_orient, med_plain)
    assert med_orient > med_plain + 0.05, (med_orient, med_plain)
