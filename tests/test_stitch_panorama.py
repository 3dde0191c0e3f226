"""Stitch + panorama pipeline tests (synthetic ground truth + real fixtures)."""

import numpy as np
import pytest
from scipy import ndimage

from dr3_tpu.io.image import load_image
from dr3_tpu.pipelines.panorama import Panorama, PanType
from dr3_tpu.pipelines.stitch import Stitch
from dr3_tpu.utils.config import Config


def scene(rng, h=240, w=320):
    """High-contrast textured scene so FAST finds corners."""
    base = ndimage.gaussian_filter(rng.uniform(0, 1, (h, w)), 4.0)
    binary = (base > np.median(base)).astype(np.float32)
    soft = ndimage.gaussian_filter(rng.uniform(0, 1, (h, w)), 1.5).astype(np.float32)
    return (0.7 * binary + 0.3 * soft).astype(np.float32)


def test_align_pair_known_translation(rng):
    img = scene(rng)
    dx, dy = 40.0, 6.0
    # right image: content shifted left => feature at x in left appears at
    # x - dx in right => H_left_to_right has tx = -dx
    right = ndimage.shift(img, (-dy, -dx), order=1, mode="nearest").astype(np.float32)
    s = Stitch(Config(), translate_only=False)
    al = s.align_pair(img, right)
    # enough support to be trustworthy; the tight H tolerances below are the
    # real accuracy oracle
    assert al.n_inliers >= 12
    H = al.H / al.H[2, 2]
    np.testing.assert_allclose(H[0, 2], -dx, atol=1.0)
    np.testing.assert_allclose(H[1, 2], -dy, atol=1.0)
    np.testing.assert_allclose(H[:2, :2], np.eye(2), atol=0.02)


def test_align_pair_translate_mode(rng):
    img = scene(rng)
    right = ndimage.shift(img, (0, -30.0), order=1, mode="nearest").astype(np.float32)
    s = Stitch(Config(), translate_only=True)
    al = s.align_pair(img, right)
    H = al.H
    np.testing.assert_allclose(H[0, 2], -30.0, atol=1.0)
    np.testing.assert_allclose(H[:2, :2], np.eye(2), atol=1e-5)  # pure translation


def test_stitch_process_canvas(rng):
    img = scene(rng)
    right = ndimage.shift(img, (0, -50.0), order=1, mode="nearest").astype(np.float32)
    s = Stitch(Config())
    out, Hinv = s.process(img, right)
    # canvas must be wider than either input and contain both
    assert out.shape[1] >= img.shape[1] + 45
    assert np.isfinite(out).all()


def test_panorama_synthetic_three(rng):
    wide = scene(rng, 240, 640)
    views = [wide[:, 0:320], wide[:, 110:430], wide[:, 220:540]]
    pan = Panorama(feathering_width=20)
    out = pan.process(views)
    # canvas should approximately recover the wide strip
    assert abs(out.shape[1] - 540) < 12
    assert abs(out.shape[0] - 240) < 8
    # register the canvas against the source using the reported origin
    ox, oy = pan.origin_
    xs = np.arange(30, 510)
    ys = np.arange(20, 220)
    crop = out[np.ix_((ys - int(round(oy))), (xs - int(round(ox))))]
    src = wide[np.ix_(ys, xs)]
    cc = np.corrcoef(crop.ravel(), src.ravel())[0, 1]
    assert cc > 0.98


@pytest.mark.slow
def test_panorama_yosemite_fixture():
    import os
    d = "/root/reference/imgs/yosemite"
    if not os.path.isdir(d):
        pytest.skip("yosemite fixtures unavailable")
    pan = Panorama(feathering_width=40)
    out = pan.process_dir(d)
    # 4 x 640-wide views with ~50% overlap: canvas lands near 2000px wide
    assert 1500 < out.shape[1] < 2600
    assert np.isfinite(out).all()
    assert out.max() > 0.5
