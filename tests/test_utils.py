"""Config, timing, and IO utility tests."""

import time

import numpy as np
import pytest

from dr3_tpu.utils.config import Config
from dr3_tpu.utils.timing import Monitor, Timer


def test_config_reference_defaults():
    """Defaults must mirror the reference Config (src/config.cpp:8-14)."""
    c = Config()
    assert c.ransac_iters == 50
    assert c.ransac_threshold == 5.0
    assert c.cell_size == 30
    assert c.n_pyr_levels == 3
    assert c.min_corner_score == 20.0
    assert c.reproj_threshold == 5.0
    assert c.map_scale == 1.0


def test_config_replace_immutable():
    c = Config()
    c2 = c.replace(cell_size=40)
    assert c.cell_size == 30 and c2.cell_size == 40
    with pytest.raises(Exception):
        c.cell_size = 50  # frozen


def test_config_from_cli():
    c = Config.from_cli(["--cell-size=25", "--map_scale=2.5",
                         "--ba_jacobi_scaling=false", "positional-ignored"])
    assert c.cell_size == 25
    assert c.map_scale == 2.5
    assert c.ba_jacobi_scaling is False


def test_config_from_cli_unknown_flag():
    with pytest.raises(ValueError):
        Config.from_cli(["--not_a_flag=1"])


def test_config_from_dict_unknown_key():
    with pytest.raises(ValueError):
        Config.from_dict({"bogus": 1})


def test_timer_accumulates():
    t = Timer("x")
    for _ in range(3):
        t.tic()
        time.sleep(0.01)
        t.toc()
    assert t.n == 3
    assert 0.005 < t.average < 0.1


def test_monitor_report_and_tat():
    m = Monitor()
    m.tic("stage_a")
    time.sleep(0.01)
    m.toc("stage_a")
    m.tic("stage_b")
    m.toc("stage_b")
    assert m.get_tat() >= m["stage_a"].average
    rep = m.report(n_frames=1, extra={"k": 1})
    assert "stage_a" in rep and "stage_b" in rep and "k" in rep


def test_kitti_fixture_sequence():
    from dr3_tpu.io.kitti import open_fixture_sequence

    seq = open_fixture_sequence()
    if len(seq) == 0:
        pytest.skip("fixtures unavailable")
    assert len(seq) == 10
    assert seq.cam.width == 1240
    frames = list(seq)
    assert frames[0].shape == (376, 1240)
    assert frames[0].dtype == np.float32
    assert 0.0 <= frames[0].min() and frames[0].max() <= 1.0


def test_image_roundtrip(tmp_path, rng):
    from dr3_tpu.io.image import load_image, save_image, to_gray

    img = rng.uniform(0, 1, (20, 30, 3)).astype(np.float32)
    p = str(tmp_path / "x.png")
    save_image(img, p)
    back = load_image(p)
    np.testing.assert_allclose(back, img, atol=1 / 255.0 + 1e-6)
    g = to_gray(img)
    assert g.shape == (20, 30)


def test_run_panorama_cli_pair(tmp_path, rng):
    """Smoke: the pair-stitch CLI writes an output image."""
    from scipy import ndimage

    from dr3_tpu.io.image import save_image
    from dr3_tpu.run_panorama import main

    base = ndimage.gaussian_filter(rng.uniform(0, 1, (120, 160)), 3.0)
    img = (base > np.median(base)).astype(np.float32)
    right = ndimage.shift(img, (0, -30), order=1, mode="nearest").astype(np.float32)
    a = str(tmp_path / "a.png")
    b = str(tmp_path / "b.png")
    o = str(tmp_path / "out.png")
    save_image(img, a)
    save_image(right, b)
    assert main(["--pair", a, b, "--out", o]) == 0
    import os

    assert os.path.getsize(o) > 1000
