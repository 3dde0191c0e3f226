"""Fused Pallas detection kernel vs the jnp oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dr3_tpu.ops import corners
from dr3_tpu.ops.pallas.detect_pallas import corner_response_map


def oracle(img, t):
    return jnp.where(corners.nms3x3(corners.fast_score_map(img, t)),
                     corners.shi_tomasi_map(img), 0.0)


def assert_same_response(got, want):
    """Same corner set exactly (FAST + NMS are pure min/max chains — bitwise
    reproducible); scores to loose tolerance (the min-eigenvalue formula
    0.5*(tr - sqrt(tr^2-4det)) amplifies ulp-level reassociation noise)."""
    np.testing.assert_array_equal(got > 0, want > 0)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.05)


@pytest.mark.parametrize("hw", [(32, 32), (64, 96), (56, 200), (96, 130)])
def test_matches_oracle_random(rng, hw):
    img = jnp.asarray(rng.uniform(0, 1, hw).astype(np.float32))
    got = np.asarray(corner_response_map(img, 20.0, interpret=True))
    want = np.asarray(oracle(img, 20.0))
    assert_same_response(got, want)


def test_matches_oracle_structured(rng):
    # rectangles + dots: real corners with nonzero scores
    img = np.zeros((72, 160), np.float32)
    img[20:50, 30:90] = 0.8
    img[10:14, 120:150] = 0.5
    for _ in range(20):
        y, x = rng.integers(6, 66), rng.integers(6, 154)
        img[y, x] = 1.0
    img = jnp.asarray(img)
    got = np.asarray(corner_response_map(img, 20.0, interpret=True))
    want = np.asarray(oracle(img, 20.0))
    assert (want > 0).sum() > 4  # the scenario actually produces corners
    assert_same_response(got, want)


def test_zero_outside_inner_border(rng):
    img = jnp.asarray(rng.uniform(0, 1, (48, 136)).astype(np.float32))
    got = np.asarray(corner_response_map(img, 20.0, interpret=True))
    assert (got[:5] == 0).all() and (got[-5:] == 0).all()
    assert (got[:, :5] == 0).all() and (got[:, -5:] == 0).all()


def test_multirow_grid_tiles_consistent(rng):
    # H spanning several TH=32 tiles: tile seams must be invisible
    img = jnp.asarray(rng.uniform(0, 1, (130, 140)).astype(np.float32))
    got = np.asarray(corner_response_map(img, 20.0, interpret=True))
    want = np.asarray(oracle(img, 20.0))
    assert_same_response(got, want)
