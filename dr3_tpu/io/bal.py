"""BAL ("Bundle Adjustment in the Large") problem file I/O.

The reference's offline bundle adjuster demo (tests/ceres/ba.cc:21-167)
reads Snavely's BAL text format and solves it with Ceres; the in-repo
OptProblem (src/optimizer.cpp:29-41) flattens the SLAM map into exactly
this layout. This module reads/writes the format and converts it to the
framework's :class:`~dr3_tpu.ba.problem.BAProblem` so BAL datasets run
through the same jitted Schur-LM solver as the live SLAM map.

Format:
    n_cams n_points n_obs
    <n_obs lines>  cam_idx pt_idx u v
    <n_cams * 9 values>  angle-axis R (3), t (3), f, k1, k2
    <n_points * 3 values> xyz

Conventions: BAL cameras look down -z and project p = -f * (x/z, y/z)
(Snavely model). Negating the measured (u, v) converts every observation
to the standard +z pinhole used by :func:`dr3_tpu.ba.problem.project`
with principal point (0, 0) — same residuals, same minimizer. Per-camera
focals become the shared 4-param intrinsics block the reference's own BA
uses (optimizer.hpp:114-118) by taking the median focal; the k1/k2 radial
terms are dropped at conversion (the reference's in-repo residual has no
distortion either, optimizer.hpp:95-108). Lossless round-trip of the raw
arrays is available via :func:`save_bal` on a :class:`BALData`.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np


class BALData(NamedTuple):
    """Raw BAL arrays, exactly as stored in the file."""
    cam_params: np.ndarray  # [K, 9] angle-axis(3), t(3), f, k1, k2
    points: np.ndarray      # [P, 3]
    obs_cam: np.ndarray     # [O] int32
    obs_pt: np.ndarray      # [O] int32
    obs_uv: np.ndarray      # [O, 2]


def load_bal(path: str) -> BALData:
    with open(path) as f:
        tokens = f.read().split()
    it = iter(tokens)
    n_cams, n_pts, n_obs = int(next(it)), int(next(it)), int(next(it))
    obs_cam = np.empty(n_obs, np.int32)
    obs_pt = np.empty(n_obs, np.int32)
    obs_uv = np.empty((n_obs, 2), np.float64)
    for i in range(n_obs):
        obs_cam[i] = int(next(it))
        obs_pt[i] = int(next(it))
        obs_uv[i, 0] = float(next(it))
        obs_uv[i, 1] = float(next(it))
    rest = np.asarray([float(next(it))
                       for _ in range(9 * n_cams + 3 * n_pts)], np.float64)
    cam_params = rest[:9 * n_cams].reshape(n_cams, 9)
    points = rest[9 * n_cams:].reshape(n_pts, 3)
    return BALData(cam_params, points, obs_cam, obs_pt, obs_uv)


def save_bal(path: str, d: BALData) -> None:
    with open(path, "w") as f:
        f.write(f"{d.cam_params.shape[0]} {d.points.shape[0]} "
                f"{d.obs_cam.shape[0]}\n")
        for c, p, (u, v) in zip(d.obs_cam, d.obs_pt, d.obs_uv):
            f.write(f"{int(c)} {int(p)} {u:.17g} {v:.17g}\n")
        for row in d.cam_params:
            f.write("\n".join(f"{x:.17g}" for x in row) + "\n")
        for row in d.points:
            f.write("\n".join(f"{x:.17g}" for x in row) + "\n")


def bal_to_problem(d: BALData, huber_ready: bool = True):
    """Convert raw BAL arrays to a jitted-solver :class:`BAProblem`.

    Flips (u, v) sign to move from Snavely's -z projection to the +z
    pinhole; shared intrinsics = (median f, median f, 0, 0).
    """
    import jax.numpy as jnp

    from dr3_tpu.ba.problem import make_problem
    from dr3_tpu.geometry.lie import SE3, SO3

    aa = jnp.asarray(d.cam_params[:, 0:3], jnp.float32)
    t = jnp.asarray(d.cam_params[:, 3:6], jnp.float32)
    f_med = float(np.median(d.cam_params[:, 6]))
    cams = SE3(SO3.exp(aa).wxyz, t)
    intr = jnp.asarray([f_med, f_med, 0.0, 0.0], jnp.float32)
    return make_problem(
        cams, jnp.asarray(d.points, jnp.float32), intr,
        d.obs_cam, d.obs_pt,
        jnp.asarray(-d.obs_uv, jnp.float32),
    )


def problem_to_bal(p, f: float | None = None) -> BALData:
    """Inverse of :func:`bal_to_problem` (for exporting SLAM maps)."""
    from dr3_tpu.geometry.lie import SO3

    wxyz = np.asarray(p.cam_wxyz, np.float64)
    aa = np.asarray(SO3(np.asarray(wxyz, np.float32)).log(), np.float64)
    f_out = float(p.intrinsics[0]) if f is None else f
    K = wxyz.shape[0]
    cam_params = np.concatenate([
        aa, np.asarray(p.cam_t, np.float64),
        np.tile([[f_out, 0.0, 0.0]], (K, 1)),
    ], axis=1)
    return BALData(
        cam_params=cam_params,
        points=np.asarray(p.points, np.float64),
        obs_cam=np.asarray(p.obs_cam, np.int32),
        obs_pt=np.asarray(p.obs_pt, np.int32),
        obs_uv=-np.asarray(p.obs_uv, np.float64),
    )
