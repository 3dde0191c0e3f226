"""VO with the sparse-image-alignment stage enabled."""

import numpy as np
import pytest

from dr3_tpu.models.camera import Pinhole
from dr3_tpu.pipelines.vo import MonoVO, Stage
from dr3_tpu.utils.config import Config


@pytest.mark.slow
def test_vo_with_sparse_align(kitti_seq):
    # fused_frontend=False: this test also checks the per-stage Monitor
    # timer is registered, which only the per-stage dispatch path records
    vo = MonoVO(Pinhole.kitti(), Config(use_sparse_align=True,
                                        fused_frontend=False))
    for img in kitti_seq:
        vo.process(img)
    assert vo.stage is Stage.GENERAL
    assert int(vo.map.n) > 100
    pos = vo.positions()
    dz = np.diff(pos[:, 2])
    moving = dz[np.abs(dz) > 1e-6]
    assert (moving > 0).mean() > 0.9
    assert "sparse_img_align" in vo.report()


@pytest.mark.slow
def test_vo_sparse_align_fused(kitti_seq):
    """use_sparse_align inside the fused one-dispatch frame step."""
    vo = MonoVO(Pinhole.kitti(), Config(use_sparse_align=True))
    for img in kitti_seq:
        vo.process(img)
    assert vo.stage is Stage.GENERAL
    assert int(vo.map.n) > 100
    assert "frame_step" in vo.report()
