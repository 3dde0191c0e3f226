"""Pallas dense-warp kernels vs. the jnp/XLA reference warps.

Runs the kernels through the Pallas interpreter on CPU (same code path
that compiles on TPU). Correctness anchors:

* single-axis remaps must match direct bilinear exactly (one filtering
  pass each — no double-filter difference);
* spherical/cylindrical two-pass composition is mathematically exact
  (the u-field depends only on the output column);
* perspective two-pass (Catmull-Smith) matches direct bilinear exactly
  on ramp images (bilinear reproduces affine images exactly) and to a
  filtering tolerance on noise images.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dr3_tpu.ops import warp as wref
from dr3_tpu.ops.pallas import warp_pallas as wp


def _img(rng, h=93, w=201):
    return jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))


def _grid(h, w):
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return gx, gy


class TestSingleAxisRemaps:
    def test_identity_rows_exact(self, rng):
        img = _img(rng)
        v = jnp.broadcast_to(jnp.arange(93, dtype=jnp.float32)[:, None], (93, 201))
        out = wp.remap_rows(img, v, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=0)

    def test_identity_cols_exact(self, rng):
        img = _img(rng)
        u = jnp.broadcast_to(jnp.arange(201, dtype=jnp.float32)[None, :], (93, 201))
        out = wp.remap_cols(img, u, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=0)

    @pytest.mark.parametrize("shift", [3.25, -7.6, 0.5])
    def test_row_shift_matches_bilinear(self, rng, shift):
        img = _img(rng)
        gx, gy = _grid(93, 201)
        v = jnp.clip(gy + shift, 0, 92)
        ref, _ = wref.bilinear_sample(img, jnp.stack([gx, v], -1), clamp=True)
        out = wp.remap_rows(img, v, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

    @pytest.mark.parametrize("shift", [3.25, -7.6, 0.5])
    def test_col_shift_matches_bilinear(self, rng, shift):
        img = _img(rng)
        gx, gy = _grid(93, 201)
        u = jnp.clip(gx + shift, 0, 200)
        ref, _ = wref.bilinear_sample(img, jnp.stack([u, gy], -1), clamp=True)
        out = wp.remap_cols(img, u, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

    def test_smooth_varying_field(self, rng):
        """Non-constant shift field within kernel capacity."""
        img = _img(rng)
        gx, gy = _grid(93, 201)
        v = jnp.clip(gy + 4.0 * jnp.sin(gx / 30.0), 0, 92)
        ref, _ = wref.bilinear_sample(img, jnp.stack([gx, v], -1), clamp=True)
        out = wp.remap_rows(img, v, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

    def test_far_out_of_bounds_does_not_poison_neighbors(self, rng):
        """A tile mixing valid coords and far-out sentinels keeps the
        valid pixels exact (the _BIG sentinel regression)."""
        img = _img(rng)
        gx, gy = _grid(93, 201)
        v = jnp.where(gx > 150.0, 5000.0, gy + 2.5)
        out = wp.remap_rows(img, v, interpret=True)
        ref, _ = wref.bilinear_sample(
            img, jnp.stack([gx, jnp.clip(gy + 2.5, 0, 92)], -1), clamp=True)
        keep = np.asarray(gx <= 150.0 - 0.0)
        np.testing.assert_allclose(np.asarray(out)[keep], np.asarray(ref)[keep],
                                   atol=2e-3)


class TestSphericalCylindrical:
    @pytest.mark.parametrize("f", [150.0, 300.0])
    def test_spherical_exact(self, rng, f):
        img = _img(rng)
        ref = wref.warp_spherical(img, f)
        out = wp.warp_spherical(img, f, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_cylindrical_exact(self, rng):
        img = _img(rng)
        ref = wref.warp_cylindrical(img, 150.0)
        out = wp.warp_cylindrical(img, 150.0, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


class TestPerspective:
    H1 = np.asarray([[1.02, 0.03, 4.0], [-0.02, 0.98, -2.5],
                     [1e-5, -2e-5, 1.0]], np.float32)
    H2 = np.asarray([[0.98, 0.05, 60.0], [-0.04, 1.01, 8.0],
                     [2e-5, 1e-5, 1.0]], np.float32)

    def test_ramp_exact(self):
        """Bilinear reproduces affine images exactly, so two-pass == direct."""
        gx, gy = _grid(93, 201)
        ramp = 0.3 * gx + 0.5 * gy
        ref, vref = wref.warp_perspective(ramp, jnp.asarray(self.H1), (93, 201))
        out, vout = wp.warp_perspective(ramp, jnp.asarray(self.H1), (93, 201),
                                        interpret=True)
        assert bool(jnp.all(vref == vout))
        m = np.asarray(vref)
        np.testing.assert_allclose(np.asarray(out)[m], np.asarray(ref)[m],
                                   atol=5e-3)

    @pytest.mark.parametrize("H,out_hw", [(H1, (93, 201)), (H2, (120, 260))])
    def test_noise_image_tolerance(self, rng, H, out_hw):
        img = _img(rng)
        assert wp.perspective_spread_ok(H, (93, 201), out_hw)
        ref, vref = wref.warp_perspective(img, jnp.asarray(H), out_hw)
        out, vout = wp.warp_perspective(img, jnp.asarray(H), out_hw,
                                        interpret=True)
        # validity is a discrete threshold on a continuous source
        # coordinate, and the two implementations compute H^-1 p through
        # different (equally valid) arithmetic orders — a source pixel
        # landing within ~1 ulp of the image border may flip between
        # them. inv3x3's round-5 max-|entry| pre-normalization (the BAL
        # Hpp f32-overflow fix) moved exactly one such knife-edge pixel
        # here; allow a handful of border-adjacent flips, nothing more.
        assert int(np.sum(np.asarray(vref) != np.asarray(vout))) <= 3
        m = np.asarray(vref) & np.asarray(vout)
        # two-pass filtering differs from single-pass by interpolation
        # order on non-smooth images; bounded well below visible level
        assert float(np.abs(np.asarray(out)[m] - np.asarray(ref)[m]).max()) < 0.05
        assert float(np.abs(np.asarray(out)[m] - np.asarray(ref)[m]).mean()) < 5e-3

    def test_rgb_matches_gray_per_channel(self, rng):
        rgb = jnp.asarray(rng.uniform(0, 1, (93, 201, 3)).astype(np.float32))
        out, valid = wp.warp_perspective(rgb, jnp.asarray(self.H1), (93, 201),
                                         interpret=True)
        for c in range(3):
            oc, vc = wp.warp_perspective(rgb[..., c], jnp.asarray(self.H1),
                                         (93, 201), interpret=True)
            np.testing.assert_allclose(np.asarray(out[..., c]), np.asarray(oc),
                                       atol=0)
            assert bool(jnp.all(valid == vc))

    def test_spread_check_rejects_horizon(self):
        """A homography with a horizon inside the canvas must be rejected."""
        Hbad = np.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                           [0.0, 0.01, 1.0]], np.float32)  # horizon at y=-100
        assert not wp.perspective_spread_ok(Hbad, (93, 201), (300, 201))


class TestSpreadHelper:
    def test_constant_shift_zero_spread(self):
        gx, gy = _grid(64, 256)
        assert float(wp.tile_shift_spread(gy + 5.0, identity_axis=0)) == 0.0
        assert float(wp.tile_shift_spread(gx - 3.0, identity_axis=1)) == 0.0

    def test_masked_pixels_ignored(self):
        gx, gy = _grid(64, 256)
        f = jnp.where(gx > 200, 1e6, gy + 1.0)
        mask = gx <= 200
        assert float(wp.tile_shift_spread(f, 0, mask=mask)) == 0.0
