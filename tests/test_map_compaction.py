"""Map compaction: dense renumbering of referenced landmarks so unbounded
sequences never exhaust the fixed point capacity (the reference's Map only
grows, reference README.md:44-48)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dr3_tpu.state import MapState, compact_map, remap_point_ids


def test_compact_map_renumbers_and_drops(rng):
    P = 16
    xyz = jnp.asarray(rng.normal(size=(P, 3)).astype(np.float32))
    valid = jnp.asarray(np.arange(P) < 12)  # 12 live, 4 never allocated
    m = MapState(xyz=xyz, valid=valid)

    # reference only even ids among the live ones
    keep = jnp.asarray((np.arange(P) % 2 == 0))
    m2, new_id, n_live = compact_map(m, keep)
    assert int(n_live) == 6  # ids 0,2,4,6,8,10
    ni = np.asarray(new_id)
    for old in range(P):
        if old < 12 and old % 2 == 0:
            assert ni[old] == old // 2
            np.testing.assert_allclose(np.asarray(m2.xyz)[ni[old]],
                                       np.asarray(xyz)[old])
        else:
            assert ni[old] == -1
    assert int(m2.n) == 6
    assert not bool(m2.valid[6:].any())

    ids = jnp.asarray([-1, 0, 3, 10, 11], jnp.int32)
    out = np.asarray(remap_point_ids(ids, new_id))
    np.testing.assert_array_equal(out, [-1, 0, -1, 5, -1])


@pytest.mark.slow
def test_vo_compaction_under_tiny_capacity(rng):
    """VO keeps tracking correctly when the point capacity forces repeated
    compactions mid-run."""
    from dr3_tpu.models.camera import Pinhole
    from dr3_tpu.pipelines.vo import MonoVO, Stage
    from dr3_tpu.utils.config import Config
    from dr3_tpu.viz.ate import ate_rmse
    from tests.synth import (forward_trajectory, gt_centers, make_textures,
                             render_scene)

    cam = Pinhole.create(320, 240, 280.0, 280.0, 160.0, 120.0)
    tn, tf = make_textures(rng)
    poses = forward_trajectory(24, step=0.12)
    frames = [render_scene(cam, T, tn, tf) for T in poses]

    cfg = Config(init_min_features=60, init_min_tracked=60,
                 init_min_triangulated=30, init_min_disparity=2.0,
                 max_keyframes=8, kf_disparity=8.0,
                 max_points=160)  # < 2 spawns worth => compaction must fire
    vo = MonoVO(cam, cfg)
    for f in frames:
        vo.process(f)

    assert vo.stage is Stage.GENERAL
    assert vo.n_compactions >= 1
    # live tracks' point ids must stay consistent through renumbering
    pt = np.asarray(vo.tracks.point)
    ok = np.asarray(vo.tracks.valid) & (pt >= 0)
    assert np.asarray(vo.map.valid)[pt[ok]].all()

    est = vo.positions()
    gt = gt_centers(poses)
    moving = np.nonzero(np.linalg.norm(est, axis=1) > 1e-9)[0]
    i0 = moving[0] - 1
    a = ate_rmse(est[i0:], gt[i0:], with_scale=True)
    traj_len = np.linalg.norm(np.diff(gt[i0:], axis=0), axis=1).sum()
    assert a.rmse < 0.08 * traj_len, (a.rmse, traj_len)
