"""Monocular VO integration tests (KITTI fixture mini-sequence) + ATE."""

import numpy as np
import pytest

from dr3_tpu.utils.config import Config
from dr3_tpu.viz.ate import ate_rmse


def test_ate_identity():
    t = np.linspace(0, 10, 50)
    pos = np.stack([t, np.zeros_like(t), np.zeros_like(t)], -1)
    a = ate_rmse(pos, pos)
    assert a.rmse < 1e-9
    np.testing.assert_allclose(a.scale, 1.0)


def test_ate_scale_invariance():
    rng = np.random.default_rng(3)
    gt = np.cumsum(rng.normal(0, 0.5, (100, 3)), axis=0)
    est = 0.37 * gt  # monocular scale ambiguity
    a = ate_rmse(est, gt, with_scale=True)
    assert a.rmse < 1e-6
    np.testing.assert_allclose(a.scale, 1 / 0.37, rtol=1e-5)


def test_ate_rigid_alignment():
    rng = np.random.default_rng(4)
    gt = np.cumsum(rng.normal(0, 0.5, (60, 3)), axis=0)
    from dr3_tpu.geometry.lie import SO3
    import jax.numpy as jnp

    R = np.asarray(SO3.exp(jnp.asarray([0.2, -0.1, 0.3])).matrix())
    est = gt @ R.T + np.asarray([5.0, -2.0, 1.0])
    a = ate_rmse(est, gt, with_scale=False)
    assert a.rmse < 1e-5


def test_ate_detects_drift():
    t = np.linspace(0, 10, 50)
    gt = np.stack([t, np.zeros_like(t), np.zeros_like(t)], -1)
    est = gt.copy()
    est[:, 1] += 0.05 * t**2  # quadratic drift
    a = ate_rmse(est, gt)
    assert a.rmse > 0.3


@pytest.mark.slow
def test_vo_kitti_fixture_sequence(kitti_seq):
    """End-to-end over the 10 checked-in KITTI frames: bootstrap must
    succeed and produce forward motion with a populated keyframe map."""
    from dr3_tpu.models.camera import Pinhole
    from dr3_tpu.pipelines.vo import MonoVO, Stage

    vo = MonoVO(Pinhole.kitti(), Config())
    for img in kitti_seq:
        vo.process(img)

    assert vo.stage is Stage.GENERAL           # bootstrap succeeded
    assert int(vo.map.n) > 100                 # initialization.cpp:666 parity
    assert vo.kf_count >= 2
    pos = vo.positions()
    dz = np.diff(pos[:, 2])
    moving = dz[np.abs(dz) > 1e-6]
    assert len(moving) >= 4
    assert (moving > 0).mean() > 0.9           # consistent forward motion
    # KITTI drives ~constant speed: per-frame steps should be comparable
    # (skip the first step — it is the accumulated motion of the frames the
    # bootstrap consumed before producing its first pose)
    steady = moving[1:]
    assert steady.std() / max(steady.mean(), 1e-9) < 0.3
    report = vo.report()
    # fused front-end: general frames run as one "frame_step" program;
    # pyramid/klt timers still appear from the bootstrap frames
    for stage in ("pyramid", "klt", "frame_step", "kf_step", "local_BA"):
        assert stage in report


@pytest.mark.slow
def test_vo_fused_matches_unfused(kitti_seq):
    """Config.fused_frontend only changes dispatch granularity: the fused
    one-program path and the per-stage path must produce the same
    trajectory and map."""
    from dr3_tpu.models.camera import Pinhole
    from dr3_tpu.pipelines.vo import MonoVO

    runs = {}
    for fused in (True, False):
        vo = MonoVO(Pinhole.kitti(), Config(fused_frontend=fused))
        for img in kitti_seq:
            vo.process(img)
        runs[fused] = (vo.positions(), int(vo.map.n), vo.kf_count)
    np.testing.assert_allclose(runs[True][0], runs[False][0],
                               rtol=1e-4, atol=1e-4)
    assert runs[True][1] == runs[False][1]
    assert runs[True][2] == runs[False][2]
