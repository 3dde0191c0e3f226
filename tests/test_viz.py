"""Offline viewer smoke tests: artifacts render and are non-trivial PNGs."""

import os

import numpy as np

from dr3_tpu.viz.draw2d import draw_epipolar, draw_matches, draw_points
from dr3_tpu.viz.draw3d import render_map


def test_draw_matches(tmp_path, rng):
    img1 = rng.uniform(0, 1, (60, 80)).astype(np.float32)
    img2 = rng.uniform(0, 1, (60, 80)).astype(np.float32)
    p1 = rng.uniform(5, 70, (20, 2))
    p2 = p1 + 2.0
    out = draw_matches(img1, img2, p1, p2, path=str(tmp_path / "m.png"))
    assert os.path.getsize(out) > 5000


def test_draw_points(tmp_path, rng):
    img = rng.uniform(0, 1, (60, 80)).astype(np.float32)
    out = draw_points(img, rng.uniform(5, 70, (15, 2)),
                      path=str(tmp_path / "p.png"))
    assert os.path.getsize(out) > 5000


def test_draw_epipolar(tmp_path, rng):
    img = rng.uniform(0, 1, (60, 80)).astype(np.float32)
    F = np.asarray([[0, -1e-3, 0.02], [1e-3, 0, -0.03], [-0.02, 0.03, 1.0]])
    p = rng.uniform(10, 60, (10, 2))
    out = draw_epipolar(img, img, F, p, p + 1.0, path=str(tmp_path / "e.png"))
    assert os.path.getsize(out) > 5000


def test_render_map(tmp_path, rng):
    t = np.linspace(0, 5, 30)
    centers = np.stack([0.2 * t, 0.02 * t, t], -1)
    pts = rng.normal(0, 1, (200, 3)) + np.asarray([0, 0, 3.0])
    # as poses: world->frame with R=I, t=-center
    poses = np.tile(np.eye(4, dtype=np.float32), (30, 1, 1))
    poses[:, :3, 3] = -centers
    out = render_map(poses, pts, poses[::10], path=str(tmp_path / "map.png"))
    assert os.path.getsize(out) > 10000
