"""Chip gate for the PRODUCTION scan program (round-4 verdict weak item 5).

`_scan_frames` — the fused general step + full keyframe path (eviction,
triangulation, spawning, loop-db insert/query, window BA) inside one
``lax.scan`` — is the largest composite program in the repo, and the
round-2/3 worker-crash class (scatter/gather composites after a Pallas
program, tests_tpu/test_kernel_numerics.py crash canary) was chip-only by
nature. This runs the batched driver against the per-frame driver ON THE
SAME DEVICE over a KITTI-resolution synthetic sweep and pins trajectory
equality with at least one in-scan keyframe (incl. its window BA), so a
scan-program miscompile or crash shows up here instead of inside a
500-frame evidence run.
"""

import jax.numpy as jnp
import numpy as np

from dr3_tpu.utils.config import Config

W, H = 1240, 376


def _frames(rng, n=24, step=0.11):
    from types import SimpleNamespace

    from tests.synth import NpSE3, make_textures, render_scene

    f = 0.6 * W
    host_cam = SimpleNamespace(width=W, height=H, fx=f, fy=f,
                               cx=W / 2.0, cy=H / 2.0)
    tn, tf = make_textures(rng)
    out = []
    for i in range(n):
        tau = np.asarray([-step * i, 0.0, 0.0, 0.0, 0.0, 0.0], np.float32)
        out.append(np.asarray(render_scene(host_cam, NpSE3.exp(tau), tn, tf)))
    return out, f


def test_scan_program_matches_per_frame_on_chip(rng):
    from dr3_tpu.models.camera import Pinhole
    from dr3_tpu.pipelines.vo import MonoVO, Stage

    frames, f = _frames(rng)
    cam = Pinhole.create(W, H, f, f, W / 2.0, H / 2.0)
    cfg = Config(init_min_features=60, init_min_tracked=60,
                 init_min_triangulated=30, init_min_disparity=2.0,
                 max_keyframes=16, kf_disparity=14.0, loop_closure=True,
                 loop_db_capacity=16, loop_min_gap_frames=1000,
                 frames_per_dispatch=8)

    vo_pf = MonoVO(cam, cfg)
    for img in frames:
        vo_pf.process(img)
    assert vo_pf.stage is Stage.GENERAL

    vo_sc = MonoVO(cam, cfg)
    vo_sc.process_batch(frames)
    assert vo_sc.stage is Stage.GENERAL
    assert "scan_dispatch" in vo_sc.monitor.timers

    # at least one keyframe was made INSIDE the scan (bootstrap makes 2 on
    # the host; anything beyond that came from the scan's keyframe branch,
    # including its in-scan window BA)
    assert vo_sc.kf_count >= 3, vo_sc.kf_count
    assert vo_sc.kf_count == vo_pf.kf_count
    kf_pf = [(s.frame_id, s.is_keyframe) for s in vo_pf.stats]
    kf_sc = [(s.frame_id, s.is_keyframe) for s in vo_sc.stats]
    assert kf_pf == kf_sc

    p_pf = vo_pf.positions()
    p_sc = vo_sc.positions()
    assert np.all(np.isfinite(p_sc))
    np.testing.assert_allclose(p_sc, p_pf, atol=5e-3)
