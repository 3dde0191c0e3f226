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
(Snavely model), so visible points have z < 0 in the BAL camera frame.
:func:`bal_to_problem` conjugates each camera by S = diag(1, -1, -1)
(a proper rotation): with R' = S @ R, t' = S @ t the camera frame flips to
the +z pinhole convention used by :func:`dr3_tpu.ba.problem.project`
(visible points get z > 0) and the measurement maps to (u, -v) — same
residuals, same minimizer. Per-camera focals become the shared 4-param
intrinsics block the reference's own BA uses (optimizer.hpp:114-118) by
taking the median focal; the k1/k2 radial terms are dropped at conversion
(the reference's in-repo residual has no distortion either,
optimizer.hpp:95-108). For the *exact* Snavely objective (per-camera
focal + k1/k2 radial, what tests/ceres/ba.cc:105-118 minimizes) use
:func:`dr3_tpu.ba.snavely.bal_to_snavely` instead — it keeps the raw BAL
parameterization with no frame flip. Lossless round-trip of the raw
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
    # one vectorized parse: real BAL files have 1e5-1e6 observations, so a
    # per-row Python loop would take minutes
    with open(path) as f:
        tokens = f.read().split()
    n_cams, n_pts, n_obs = int(tokens[0]), int(tokens[1]), int(tokens[2])
    obs_block = np.asarray(tokens[3:3 + 4 * n_obs], np.float64).reshape(n_obs, 4)
    obs_cam = obs_block[:, 0].astype(np.int32)
    obs_pt = obs_block[:, 1].astype(np.int32)
    obs_uv = np.ascontiguousarray(obs_block[:, 2:4])
    rest = np.asarray(tokens[3 + 4 * n_obs:
                             3 + 4 * n_obs + 9 * n_cams + 3 * n_pts], np.float64)
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

    Conjugates each camera by the proper rotation S = diag(1, -1, -1)
    (R' = S R, t' = S t) so the BAL -z viewing frame becomes the +z
    pinhole frame — visible points then have z > 0 and pass linearize's
    cheirality mask — and stores observations as (u, -v), which makes the
    +z pinhole residual equal BAL's Snavely residual (up to the dropped
    k1/k2 radial terms). Shared intrinsics = (median f, median f, 0, 0).
    """
    import jax.numpy as jnp

    from dr3_tpu.ba.problem import make_problem
    from dr3_tpu.geometry.lie import SE3, SO3

    S = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    R = np.asarray(SO3.exp(jnp.asarray(d.cam_params[:, 0:3],
                                       jnp.float32)).matrix())
    Rp = np.einsum("ij,kjl->kil", S, R)
    t = d.cam_params[:, 3:6].astype(np.float32) @ S.T
    f_med = float(np.median(d.cam_params[:, 6]))
    cams = SE3(SO3.from_matrix(jnp.asarray(Rp)).wxyz, jnp.asarray(t))
    intr = jnp.asarray([f_med, f_med, 0.0, 0.0], jnp.float32)
    uv = d.obs_uv * np.asarray([1.0, -1.0])
    return make_problem(
        cams, jnp.asarray(d.points, jnp.float32), intr,
        d.obs_cam, d.obs_pt,
        jnp.asarray(uv, jnp.float32),
    )


def problem_to_bal(p, f: float | None = None) -> BALData:
    """Inverse of :func:`bal_to_problem` (for exporting SLAM maps):
    conjugate back by S = diag(1, -1, -1) and restore (u, -v)."""
    import jax.numpy as jnp

    from dr3_tpu.geometry.lie import SO3

    S = np.diag([1.0, -1.0, -1.0])
    Rp = np.asarray(SO3(jnp.asarray(p.cam_wxyz, jnp.float32)).matrix(),
                    np.float64)
    R_bal = np.einsum("ij,kjl->kil", S, Rp)
    t_bal = np.asarray(p.cam_t, np.float64) @ S.T
    aa = np.asarray(SO3.from_matrix(jnp.asarray(R_bal, jnp.float32)).log(),
                    np.float64)
    f_out = float(p.intrinsics[0]) if f is None else f
    K = Rp.shape[0]
    cam_params = np.concatenate([
        aa, t_bal, np.tile([[f_out, 0.0, 0.0]], (K, 1)),
    ], axis=1)
    return BALData(
        cam_params=cam_params,
        points=np.asarray(p.points, np.float64),
        obs_cam=np.asarray(p.obs_cam, np.int32),
        obs_pt=np.asarray(p.obs_pt, np.int32),
        obs_uv=np.asarray(p.obs_uv, np.float64) * np.asarray([1.0, -1.0]),
    )
