"""Native dataloader + checkpoint/resume tests."""

import os

import numpy as np
import pytest

from dr3_tpu.native import dataloader


KITTI0 = "/root/reference/imgs/kitti0.png"


@pytest.mark.skipif(not dataloader.available(), reason="native loader not built")
def test_native_decode_matches_pil():
    if not os.path.exists(KITTI0):
        pytest.skip("fixture unavailable")
    from PIL import Image

    img = dataloader.decode_image(KITTI0)
    ref = np.asarray(Image.open(KITTI0).convert("L"), np.float32) / 255.0
    assert img.shape == ref.shape
    np.testing.assert_allclose(img, ref, atol=1e-6)


@pytest.mark.skipif(not dataloader.available(), reason="native loader not built")
def test_native_iter_ordered():
    paths = [f"/root/reference/imgs/kitti{i}.png" for i in range(10)]
    if not all(os.path.exists(p) for p in paths):
        pytest.skip("fixtures unavailable")
    from PIL import Image

    frames = list(dataloader.iter_images(paths, n_threads=4, capacity=3))
    assert len(frames) == 10
    # spot-check order: frames must match their path's content
    for i in (0, 5, 9):
        ref = np.asarray(Image.open(paths[i]).convert("L"), np.float32) / 255.0
        np.testing.assert_allclose(frames[i], ref, atol=1e-6)


@pytest.mark.skipif(not dataloader.available(), reason="native loader not built")
def test_native_jpeg():
    p = "/root/reference/imgs/yosemite/yosemite1.jpg"
    if not os.path.exists(p):
        pytest.skip("fixture unavailable")
    img = dataloader.decode_image(p)
    assert img is not None and img.shape == (480, 640)
    assert 0.0 <= img.min() and img.max() <= 1.0


@pytest.mark.slow
def test_checkpoint_resume_vo(tmp_path, kitti_seq):
    """Run 6 frames, checkpoint, resume in a fresh pipeline, finish the
    sequence; the resumed run must keep tracking (not re-bootstrap)."""
    from dr3_tpu.io.checkpoint import load_vo, save_vo
    from dr3_tpu.models.camera import Pinhole
    from dr3_tpu.pipelines.vo import MonoVO, Stage
    from dr3_tpu.utils.config import Config

    vo = MonoVO(Pinhole.kitti(), Config())
    for img in kitti_seq[:6]:
        vo.process(img)
    assert vo.stage is Stage.GENERAL
    ckpt = str(tmp_path / "state")
    save_vo(ckpt, vo)

    vo2 = MonoVO(Pinhole.kitti(), Config())
    load_vo(ckpt, vo2)
    assert vo2.stage is Stage.GENERAL
    assert vo2.frame_idx == vo.frame_idx
    assert int(vo2.map.n) == int(vo.map.n)
    np.testing.assert_allclose(np.asarray(vo2.T_cur.t), np.asarray(vo.T_cur.t))
    # format-2 state: loop database + local trajectory (a post-resume loop
    # closure indexes absolute frame ids into _traj_local)
    assert vo2.db_cursor == vo.db_cursor
    assert int(vo2.loop_db.n) == int(vo.loop_db.n)
    assert len(vo2._traj_local) == len(vo2.trajectory) == vo.frame_idx + 1

    for img in kitti_seq[6:]:
        vo2.process(img)
    assert vo2.stage is Stage.GENERAL
    pos = vo2.positions()
    # continued forward motion after resume
    assert pos[-1, 2] > pos[6, 2]


@pytest.mark.slow
def test_checkpoint_resume_then_loop_closure(tmp_path, kitti_seq):
    """A loop closure AFTER resume must correct the PRE-resume trajectory
    too (the format-1 checkpoint dropped _traj_local and the loop
    database, silently skipping or misaligning the correction)."""
    from dr3_tpu.io.checkpoint import load_vo, save_vo
    from dr3_tpu.models.camera import Pinhole
    from dr3_tpu.pipelines.vo import MonoVO, Stage
    from dr3_tpu.utils.config import Config

    base = list(kitti_seq)
    seq = base + base[-2:0:-1] + base[:6]  # palindrome -> content revisit
    cfg = Config(loop_db_capacity=32, loop_min_gap_frames=10,
                 loop_min_inliers=15, loop_cooldown_kfs=2)
    vo = MonoVO(Pinhole.kitti(), cfg)
    for img in seq[:8]:
        vo.process(img)
    assert vo.stage is Stage.GENERAL
    ckpt = str(tmp_path / "state")
    save_vo(ckpt, vo)

    vo2 = MonoVO(Pinhole.kitti(), cfg)
    load_vo(ckpt, vo2)
    for img in seq[8:]:
        vo2.process(img)
    assert vo2.n_loop_closures >= 1
    # the regression this pins: format-1 checkpoints dropped _traj_local
    # (and the loop database), so post-resume corrections either crashed
    # or silently skipped/misaligned the pre-resume frames. With format 2
    # the two trajectory views stay index-aligned through the closure and
    # every entry is finite. (The pre-resume entries themselves may move
    # ~0 here — drift over 8 real frames is tiny and PGO fixes node 0.)
    assert len(vo2._traj_local) == len(vo2.trajectory) == len(seq)
    assert np.all(np.isfinite(np.stack(vo2.trajectory)))
