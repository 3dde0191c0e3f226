"""Distributed VO (mesh-sharded local BA) + relocalization tests."""

import numpy as np
import pytest

from dr3_tpu.models.camera import Pinhole
from dr3_tpu.pipelines.vo import MonoVO, Stage
from dr3_tpu.utils.config import Config


@pytest.mark.slow
def test_vo_distributed_matches_single(kitti_seq):
    """Running VO with local BA sharded over an 8-device mesh must match
    the single-device trajectory (same algorithm, same damping)."""
    from dr3_tpu.parallel.mesh import make_mesh

    vo1 = MonoVO(Pinhole.kitti(), Config())
    vo2 = MonoVO(Pinhole.kitti(), Config(), mesh=make_mesh(8))
    for img in kitti_seq:
        vo1.process(img)
        vo2.process(img)
    assert vo2.stage is Stage.GENERAL
    p1 = vo1.positions()
    p2 = vo2.positions()
    # identical up to LM accept/reject float noise
    np.testing.assert_allclose(p2, p1, atol=5e-3)
    assert int(vo2.map.n) > 100


def test_relocalization_on_black_frames(kitti_seq):
    """Tracking through a camera blackout: VO must detect the loss,
    re-bootstrap, and keep the trajectory anchored (no pose jump to origin)."""
    vo = MonoVO(Pinhole.kitti(), Config())
    frames = list(kitti_seq[:6])
    black = [np.zeros_like(frames[0])] * 4
    tail = list(kitti_seq[6:])
    for img in frames + black + tail + tail:
        vo.process(img)
    assert vo.n_relocalizations >= 1
    stages = [s.stage for s in vo.stats]
    assert "relocalize" in stages
    # anchored: after relocalization the reported pose stays near the last
    # good pose instead of resetting to the origin
    pos = vo.positions()
    pre_loss = pos[5]
    post = pos[-1]
    assert np.linalg.norm(post - pre_loss) < 2.0  # same neighborhood, not origin-reset
