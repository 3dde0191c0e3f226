"""Full-pipeline accuracy: monocular VO on a rendered sequence with exact
ground truth, evaluated by Sim(3)-aligned ATE."""

import numpy as np
import pytest

from dr3_tpu.models.camera import Pinhole
from dr3_tpu.pipelines.vo import MonoVO, Stage
from dr3_tpu.utils.config import Config
from dr3_tpu.viz.ate import ate_rmse
from tests.synth import forward_trajectory, gt_centers, make_textures, render_scene


@pytest.mark.slow
def test_vo_ate_on_synthetic_sequence(rng):
    cam = Pinhole.create(320, 240, 280.0, 280.0, 160.0, 120.0)
    tex_near, tex_far = make_textures(rng)
    poses = forward_trajectory(24, step=0.12)
    frames = [render_scene(cam, T, tex_near, tex_far) for T in poses]

    cfg = Config(
        init_min_features=60, init_min_tracked=60, init_min_triangulated=30,
        init_min_disparity=2.0, max_keyframes=16,
    )
    vo = MonoVO(cam, cfg)
    for f in frames:
        vo.process(f)

    assert vo.stage is Stage.GENERAL, [s.stage for s in vo.stats]
    est = vo.positions()
    gt = gt_centers(poses)
    # evaluate only frames after bootstrap produced motion
    moving = np.nonzero(np.linalg.norm(est, axis=1) > 1e-9)[0]
    assert len(moving) >= 12
    i0 = moving[0] - 1
    a = ate_rmse(est[i0:], gt[i0:], with_scale=True)
    traj_len = np.linalg.norm(np.diff(gt[i0:], axis=0), axis=1).sum()
    # ATE under 5% of trajectory length (monocular, no loop closure)
    assert a.rmse < 0.05 * traj_len, (a.rmse, traj_len)
