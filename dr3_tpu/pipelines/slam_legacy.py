"""Legacy frame-to-frame visual odometry (the reference's first SLAM stack).

The reference contains two SLAM stacks (SURVEY §0); this is the older
descriptor-matching one, ``dr3::SLAM`` (reference include/slam.hpp:26-68,
src/slam.cpp:6-218), kept alongside the SVO-style tracker in
pipelines/vo.py. Per frame:

reference (src/slam.cpp:86-216)        | here
---------------------------------------|--------------------------------
ORB detect + BFMatcher(Hamming) vs     | FAST grid corners + ZNCC patch
  previous frame (103-113)             |   descriptors, [N,M] matmul
                                       |   match w/ cross-check + ratio
TwoView::estimate_F RANSAC x30 (117)   | vmapped 8-point RANSAC, same 30
                                       |   hypotheses, 5 px gate
extract_camera_pose: E=K^T F K, 4      | decompose_essential (same +-u3,
  (R,t) hypotheses (123)               |   UWV^T/UW^TV^T construction)
4 x inliers x DLT triangulation        | batched 4-hypothesis triangulate
  (127-144)                            |   (one vmapped program)
disambiguate by cheirality (152)       | same z>0-in-both count
pose chain T_cur = Rt * T_prev (159)   | same (SE3)
world-point insertion w/ duplicate     | same: match-index chaining reuses
  suppression via prev-frame obs reuse |   the previous frame's point ids
  (161-197)                            |
per-stage timing report (49-84)        | Monitor + report() parity

The whole geometry stage (match -> F -> E -> triangulate -> cheirality)
is ONE jitted program per frame; host code only chains poses and appends
to the (numpy, unbounded like the reference's std::list Map) point store.
Monocular scale is unobservable frame-to-frame, so each step's t has unit
norm — exactly the reference's behavior (its KITTI demo drifts in scale;
fixing that is what the SVO stack + BA are for).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dr3_tpu.geometry.epipolar import (decompose_essential,
                                       essential_from_fundamental,
                                       disambiguate_pose)
from dr3_tpu.geometry.lie import SE3, SO3
from dr3_tpu.geometry.ransac import ransac_fundamental
from dr3_tpu.models.camera import Pinhole
from dr3_tpu.ops import corners, lk, match, pyramid
from dr3_tpu.utils.config import Config
from dr3_tpu.utils.timing import Monitor


@dataclasses.dataclass
class LegacyFrameResult:
    R: np.ndarray            # [3,3] cur-from-prev rotation
    t: np.ndarray            # [3] unit translation
    n_matches: int
    n_inliers: int
    n_good: int              # cheirality-positive triangulations


class LegacySLAM:
    """dr3::SLAM equivalent: frame-to-frame VO over descriptor matches."""

    def __init__(self, cam: Pinhole, cfg: Optional[Config] = None,
                 seed: int = 0):
        self.cam = cam
        self.cfg = cfg or Config()
        self.key = jax.random.PRNGKey(seed)
        self.monitor = Monitor()
        for name in ("frame", "match", "fmatrix", "triangulation", "global"):
            self.monitor.add_timer(name)

        self.T_f_w = SE3.identity()        # current cam-from-world
        self.trajectory: List[np.ndarray] = [np.asarray(self.T_f_w.matrix())]
        self.points_w: List[np.ndarray] = []      # world landmarks
        self.point_obs: List[int] = []            # observation count per point
        self._prev = None                          # (desc, xy, valid, point_id)
        self.n_frames = 0

        cfg_ = self.cfg
        K = cam.K

        @jax.jit
        def _detect_describe(img):
            pyr = pyramid.build_pyramid(img, cfg_.n_pyr_levels)
            f = corners.detect_features(pyr, cfg_.cell_size,
                                        cfg_.min_corner_score,
                                        cfg_.fast_threshold)
            d = match.patch_descriptors(img, f.xy, f.valid)
            return pyr, f.xy, f.valid, d

        @jax.jit
        def _geometry(key, pyr_prev, d_prev, xy_prev, v_prev,
                      pyr_cur, d_cur, xy_cur, v_cur):
            m = match.match_descriptors(d_prev, d_cur, v_prev, v_cur)
            p1 = xy_prev
            p2 = xy_cur[m.idx2]
            # subpixel refinement of matched positions: integer-pixel corner
            # pairs are too coarse for F estimation under forward motion, so
            # a short LK polish (initialized at the match, level-0 only)
            # recovers the subpixel correspondence before RANSAC
            ref = lk.track_level(pyr_prev[0], pyr_cur[0], p1, p2,
                                 half_window=5, iters=8, eps=1e-3)
            p2 = jnp.where((ref[1] & (jnp.linalg.norm(ref[0] - p2, axis=-1)
                                      < 2.0))[:, None], ref[0], p2)
            w = m.ok.astype(jnp.float32)
            # reference estimate_F: Config::ransac_iters iterations, 5 px
            # inlier gate (src/two.cpp:55 hardcodes 30; config.cpp:8 says 50
            # — hypotheses are vmapped here so the larger value is free).
            # ransac_fundamental scores with a chi-square gate
            # dist^2 < 3.841 * sigma^2, so a raw px threshold tau maps to
            # sigma = tau / sqrt(3.841) = tau / 1.96.
            res = ransac_fundamental(key, p1, p2, w,
                                     n_samples=max(cfg_.ransac_iters, 30),
                                     sigma=cfg_.ransac_threshold / 1.96)
            inl = res.inliers & m.ok
            E = essential_from_fundamental(res.model, K)
            hyp = decompose_essential(E)
            wi = inl.astype(jnp.float32)
            best, results, clear = disambiguate_pose(hyp, p1, p2, wi, K)
            R = hyp.R[best]
            t = hyp.t[best]
            X = results.points[best]          # [N, 3] in prev-camera frame
            good = results.good[best] & inl
            return (m.idx2, m.ok, inl, R, t, X, good,
                    results.n_good[best], clear)

        self._detect_describe = _detect_describe
        self._geometry = _geometry

    def process(self, img: np.ndarray) -> Optional[LegacyFrameResult]:
        """SLAM::process parity (src/slam.cpp:86-216). Returns None for the
        first frame (nothing to match against)."""
        self.monitor.tic("global")
        self.monitor.tic("frame")
        img_j = jnp.asarray(img, jnp.float32)
        pyr, xy, valid, desc = self._detect_describe(img_j)
        self.monitor.toc("frame", block=desc)
        self.n_frames += 1

        if self._prev is None:
            n = int(xy.shape[0])
            self._prev = (pyr, desc, xy, valid, np.full(n, -1, np.int64))
            self.monitor.toc("global")
            return None

        pyr_p, d_p, xy_p, v_p, pid_p = self._prev
        self.key, sub = jax.random.split(self.key)
        self.monitor.tic("match")
        out = self._geometry(sub, pyr_p, d_p, xy_p, v_p, pyr, desc, xy, valid)
        (idx2, mok, inl, R, t, X, good, n_good, clear) = map(np.asarray, out)
        self.monitor.toc("match", block=out[0])
        # matching/F/triangulation run fused in one program; report the
        # stage split the reference prints by attributing the fused call to
        # "match" and keeping fmatrix/triangulation as aliases
        self.monitor.tic("fmatrix")
        self.monitor.toc("fmatrix")
        self.monitor.tic("triangulation")
        self.monitor.toc("triangulation")

        # pose chain: T_cur_w = [R|t] * T_prev_w (src/slam.cpp:159)
        T_rel = SE3(SO3.from_matrix(jnp.asarray(R)).wxyz, jnp.asarray(t))
        T_prev = self.T_f_w
        self.T_f_w = T_rel @ T_prev
        self.trajectory.append(np.asarray(self.T_f_w.matrix()))

        # world-point insertion with duplicate suppression via prev-frame
        # observation reuse (src/slam.cpp:161-197): a match whose previous
        # feature already observes a landmark extends it instead of
        # duplicating
        T_w_prev = T_prev.inverse()
        pid_cur = np.full(int(xy.shape[0]), -1, np.int64)
        good_idx = np.flatnonzero(good & inl)
        if good_idx.size:
            Xw = np.asarray(T_w_prev.apply(jnp.asarray(X[good_idx])))
            for k, i_prev in enumerate(good_idx):
                j_cur = int(idx2[i_prev])
                existing = pid_p[i_prev]
                if existing >= 0:
                    self.point_obs[existing] += 1
                    pid_cur[j_cur] = existing
                else:
                    self.points_w.append(Xw[k])
                    self.point_obs.append(2)
                    pid_cur[j_cur] = len(self.points_w) - 1

        self._prev = (pyr, desc, xy, valid, pid_cur)
        self.monitor.toc("global")
        return LegacyFrameResult(
            R=R, t=t, n_matches=int(mok.sum()), n_inliers=int(inl.sum()),
            n_good=int(n_good))

    # ----- reporting (SLAM::pprint parity, src/slam.cpp:49-84) -----------
    def report(self) -> str:
        m = self.monitor
        fps = self.n_frames / max(m["global"].total, 1e-9)
        n_pts = len(self.points_w)
        n_obs = sum(self.point_obs)
        lines = [
            "-" * 58,
            f"frames processed      : {self.n_frames}",
            f"FPS                   : {fps:.2f}",
            f"map points            : {n_pts}",
            f"observations          : {n_obs}",
            f"parameters (6K + 3P)  : {6 * self.n_frames + 3 * n_pts}",
        ]
        for name in ("frame", "match", "fmatrix", "triangulation"):
            lines.append(f"avg {name:<18}: {m[name].average * 1e3:8.3f} ms")
        lines.append("-" * 58)
        return "\n".join(lines)

    def trajectory_matrix(self) -> np.ndarray:
        return np.stack(self.trajectory)

    def map_points(self) -> np.ndarray:
        if not self.points_w:
            return np.zeros((0, 3), np.float32)
        return np.stack(self.points_w)
