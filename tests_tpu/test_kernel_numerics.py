"""Compiled Pallas kernels vs jnp oracles at production (KITTI) shapes."""

import jax.numpy as jnp
import numpy as np

from dr3_tpu.ops import corners, lk, pyramid
from dr3_tpu.ops import warp as wref
from dr3_tpu.ops.pallas import detect_pallas, warp_pallas
from dr3_tpu.ops.pallas.lk_pallas import track_pyramid_pallas

H, W = 376, 1240


def _kitti_like(rng):
    from scipy import ndimage

    img = ndimage.gaussian_filter(
        rng.uniform(0, 1, (H, W)).astype(np.float32), 1.2)
    return jnp.asarray((img - img.min()) / (img.max() - img.min() + 1e-9))


def test_lk_compiled_matches_oracle(rng):
    img = _kitti_like(rng)
    shift = (3.3, -2.1)
    from scipy import ndimage

    img2 = jnp.asarray(ndimage.shift(np.asarray(img), shift, order=1,
                                     mode="nearest"))
    p1 = pyramid.build_pyramid(img, 4)
    p2 = pyramid.build_pyramid(img2, 4)
    pts = rng.uniform([30, 30], [W - 30, H - 30], (546, 2)).astype(np.float32)
    v = jnp.ones(546, bool)
    ref = lk.track_pyramid(p1, p2, jnp.asarray(pts), v, half_window=7,
                           iters=10)
    pal = track_pyramid_pallas(p1, p2, jnp.asarray(pts), v, half_window=7,
                               iters=10, interpret=False)
    both = np.asarray(ref.ok) & np.asarray(pal.ok)
    assert both.mean() > 0.8
    diff = np.abs(np.asarray(ref.pos)[both] - np.asarray(pal.pos)[both]).max()
    assert diff < 1e-2, diff
    flow = np.asarray(pal.pos)[both] - pts[both]
    np.testing.assert_allclose(flow.mean(0), [shift[1], shift[0]], atol=0.1)


def test_detect_compiled_matches_oracle(rng):
    img = _kitti_like(rng)
    got = np.asarray(detect_pallas.corner_response_map(img, 10.0,
                                                       interpret=False))
    want = np.asarray(jnp.where(
        corners.nms3x3(corners.fast_score_map(img, 10.0)),
        corners.shi_tomasi_map(img), 0.0))
    # same corner set (FAST + NMS are min/max chains); scores to loose
    # tolerance (min-eigenvalue formula amplifies reassociation noise)
    np.testing.assert_array_equal(got > 0, want > 0)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.05)


def test_warp_perspective_compiled_matches_oracle(rng):
    img = _kitti_like(rng)
    Hm = jnp.asarray([[1.0, 0.015, 7.0], [-0.012, 1.0, 4.0],
                      [2e-5, -1e-5, 1.0]])
    ref, vref = wref.warp_perspective(img, Hm, (H, W))
    out, vout = warp_pallas.warp_perspective(img, Hm, (H, W),
                                             interpret=False)
    bothv = np.asarray(vref) & np.asarray(vout)
    assert bothv.mean() > 0.9
    diff = np.abs(np.asarray(ref) - np.asarray(out))[bothv].max()
    assert diff < 2e-2, diff


def test_warp_spherical_compiled_matches_oracle(rng):
    img = _kitti_like(rng)
    ref = wref.warp_spherical(img, 700.0)
    out = warp_pallas.warp_spherical(img, 700.0, interpret=False)
    diff = np.abs(np.asarray(ref) - np.asarray(out))
    assert np.median(diff) < 1e-3
    assert diff.max() < 5e-2, diff.max()


def test_warp_cylindrical_compiled_matches_oracle(rng):
    img = _kitti_like(rng)
    ref = wref.warp_cylindrical(img, 700.0)
    out = warp_pallas.warp_cylindrical(img, 700.0, interpret=False)
    diff = np.abs(np.asarray(ref) - np.asarray(out))
    assert np.median(diff) < 1e-3
    assert diff.max() < 5e-2, diff.max()


def test_lk_then_keyframe_spawn_no_worker_crash(rng):
    """Chip-side crash canary: the round-2/3 TPU worker fault fired when a
    scatter/gather composite program ran AFTER the LK Pallas program at
    KITTI resolution (the keyframe detect/spawn stage). The scatter-free
    rewrite fixed it; this runs the exact sequence so a regression shows
    up as a worker crash here, not at the end of a 500-frame run."""
    import jax

    from dr3_tpu.models.camera import Pinhole
    from dr3_tpu.pipelines.vo import _keyframe_step, _spawn_tracks
    from dr3_tpu.state import KeyframeState, MapState, TrackState
    from dr3_tpu.utils.config import Config

    cfg = Config(fast_threshold=8.0)
    img = _kitti_like(rng)
    pyr = [jnp.asarray(p) for p in pyramid.build_pyramid(img, 4)]
    n = 546
    px = jnp.asarray(rng.uniform([20, 20], [W - 20, H - 20],
                                 (n, 2)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=n) < 0.9)
    tracks = TrackState.empty(n, cfg.feature_align_patch)._replace(
        px=px, ref_px=px, valid=valid,
        ref_kf=jnp.ones((n,), jnp.int32),
        point=jnp.where(jnp.arange(n) % 2 == 0, jnp.arange(n), -1)
        .astype(jnp.int32))
    kfs = KeyframeState.empty(cfg.max_keyframes, n)
    kfs = kfs._replace(valid=kfs.valid.at[0].set(True).at[1].set(True),
                       obs_px=kfs.obs_px.at[1].set(px))
    mp = MapState.empty(cfg.max_points)
    mp = mp._replace(
        xyz=mp.xyz.at[:n].set(jnp.asarray(
            rng.uniform([-5, -2, 4], [5, 2, 30], (n, 3)).astype(np.float32))),
        valid=mp.valid.at[:n].set(True))
    f = 0.875 * W
    cam = Pinhole.create(W, H, f, f, W / 2.0, H / 2.0)
    from dr3_tpu.geometry.lie import SE3

    # 1. the LK Pallas program (the context that triggered the fault)
    res = track_pyramid_pallas(pyr, pyr, px, valid, half_window=7, iters=10,
                               interpret=False)
    jax.block_until_ready(res.pos)
    # 2. spawn alone, then the fused keyframe step — both formerly fatal
    tr, n_sp = _spawn_tracks(pyr, tracks, cfg, jnp.asarray(2, jnp.int32),
                             (H, W))
    jax.block_until_ready(tr.px)
    out = _keyframe_step(pyr, tracks, kfs, SE3.identity(), mp,
                         jnp.asarray(int(n // 2), jnp.int32), cam, cfg,
                         jnp.asarray(2, jnp.int32), (H, W))
    st = np.asarray(out[2])
    assert np.all(np.isfinite(st))
    assert int(st[2]) >= 0  # spawned counter sane
