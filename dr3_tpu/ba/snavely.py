"""Snavely-camera bundle adjustment: the exact BAL objective.

The reference's offline BAL adjuster (tests/ceres/ba.cc:105-118) minimizes
the 9-parameter Snavely model: angle-axis rotation (3), translation (3),
focal f, radial k1, k2 — projection

    p  = R X + t                (camera looks down -z)
    q  = -(p_x, p_y) / p_z
    u  = f * (1 + k1 |q|^2 + k2 |q|^4) * q

This module keeps that parameterization verbatim (no frame flip, no shared
median focal — that lossy conversion lives in io/bal.py for the in-repo
shared-intrinsics pipeline) so costs are directly comparable with Ceres on
real BAL files. Cameras carry a 9-dim tangent: SE3 left retraction on the
pose half, additive on (f, k1, k2).

The solve reuses the observation-keyed Schur core (ba/schur_core.py) — the
camera block dimension is shape-generic, so C=9 flows through the same
explicit / PCG machinery. BAL camera counts routinely exceed the dense-S
comfort zone, so the default solver switches to matrix-free PCG with the
SCHUR_JACOBI preconditioner above ``_EXPLICIT_MAX_CAMS`` cameras.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dr3_tpu.ba.schur_core import assemble_blocks, solve_schur
from dr3_tpu.ba.schur_lm import _EXPLICIT_MAX_CAMS
from dr3_tpu.geometry.lie import SE3, hat, quat_rotate, quat_to_matrix, \
    quat_normalize


class SnavelyProblem(NamedTuple):
    cam_wxyz: jnp.ndarray   # [K, 4] world->camera rotations
    cam_t: jnp.ndarray      # [K, 3]
    cam_fkk: jnp.ndarray    # [K, 3] focal, k1, k2
    points: jnp.ndarray     # [P, 3]
    obs_cam: jnp.ndarray    # [O] int32
    obs_pt: jnp.ndarray     # [O] int32
    obs_uv: jnp.ndarray     # [O, 2] BAL pixel measurements
    obs_w: jnp.ndarray      # [O] weight; 0 = padding
    cam_fixed: jnp.ndarray  # [K] bool gauge

    @property
    def n_cams(self) -> int:
        return self.cam_wxyz.shape[0]

    @property
    def n_points(self) -> int:
        return self.points.shape[0]

    @property
    def n_obs(self) -> int:
        return self.obs_cam.shape[0]


class SnavelyResult(NamedTuple):
    problem: SnavelyProblem
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    n_accepted: jnp.ndarray
    lambda_final: jnp.ndarray


def bal_to_snavely(d, dtype=jnp.float32) -> SnavelyProblem:
    """Raw BAL arrays -> SnavelyProblem, parameter-for-parameter (the
    objective is *identical* to tests/ceres/ba.cc's)."""
    from dr3_tpu.geometry.lie import SO3

    aa = jnp.asarray(d.cam_params[:, 0:3], dtype)
    K = d.cam_params.shape[0]
    return SnavelyProblem(
        cam_wxyz=SO3.exp(aa).wxyz.astype(dtype),
        cam_t=jnp.asarray(d.cam_params[:, 3:6], dtype),
        cam_fkk=jnp.asarray(d.cam_params[:, 6:9], dtype),
        points=jnp.asarray(d.points, dtype),
        obs_cam=jnp.asarray(d.obs_cam, jnp.int32),
        obs_pt=jnp.asarray(d.obs_pt, jnp.int32),
        obs_uv=jnp.asarray(d.obs_uv, dtype),
        obs_w=jnp.ones(d.obs_cam.shape[0], dtype),
        cam_fixed=jnp.zeros(K, bool).at[0].set(True),
    )


def snavely_to_bal(p: SnavelyProblem):
    from dr3_tpu.geometry.lie import SO3
    from dr3_tpu.io.bal import BALData

    aa = np.asarray(SO3(p.cam_wxyz).log(), np.float64)
    cam_params = np.concatenate([
        aa, np.asarray(p.cam_t, np.float64),
        np.asarray(p.cam_fkk, np.float64)], axis=1)
    return BALData(cam_params=cam_params,
                   points=np.asarray(p.points, np.float64),
                   obs_cam=np.asarray(p.obs_cam, np.int32),
                   obs_pt=np.asarray(p.obs_pt, np.int32),
                   obs_uv=np.asarray(p.obs_uv, np.float64))


def project_snavely(fkk: jnp.ndarray, xc: jnp.ndarray) -> jnp.ndarray:
    """BAL projection of camera-frame points (ba.cc:105-118): looks down -z,
    u = f * distortion * (-x/z, -y/z)."""
    f, k1, k2 = fkk[..., 0:1], fkk[..., 1:2], fkk[..., 2:3]
    z = xc[..., 2:3]
    z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    q = -xc[..., :2] / z
    r2 = jnp.sum(q * q, axis=-1, keepdims=True)
    dist = 1.0 + k1 * r2 + k2 * r2 * r2
    return f * dist * q


class SnavelyResiduals(NamedTuple):
    r: jnp.ndarray    # [O, 2]
    Jc: jnp.ndarray   # [O, 2, 9] d r / d [rho, omega, f, k1, k2]
    Jp: jnp.ndarray   # [O, 2, 3]
    cost: jnp.ndarray
    valid: jnp.ndarray


def residuals_only(p: SnavelyProblem) -> jnp.ndarray:
    q = p.cam_wxyz[p.obs_cam]
    t = p.cam_t[p.obs_cam]
    xc = quat_rotate(q, p.points[p.obs_pt]) + t
    return project_snavely(p.cam_fkk[p.obs_cam], xc) - p.obs_uv


def residual_cost(p: SnavelyProblem, huber_delta: float = 2.0) -> jnp.ndarray:
    """Robust cost WITHOUT Jacobians — the LM accept test only needs the
    cost, and the Jacobian terms are ~60% of linearize's work at BAL
    scale. Validity here is residual-finiteness only (linearize's extra
    Jacobian-finiteness mask re-applies on the next linearization)."""
    quat = p.cam_wxyz[p.obs_cam]
    t = p.cam_t[p.obs_cam]
    fkk = p.cam_fkk[p.obs_cam]
    X = p.points[p.obs_pt]
    xc = quat_rotate(quat, X) + t
    f, k1, k2 = fkk[..., 0], fkk[..., 1], fkk[..., 2]
    z = xc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    q2d = -xc[..., :2] / z_safe[..., None]
    r2 = jnp.sum(q2d * q2d, axis=-1)
    dist = 1.0 + k1 * r2 + k2 * r2 * r2
    r = f[..., None] * dist[..., None] * q2d - p.obs_uv
    valid = jnp.all(jnp.isfinite(r), axis=-1) & (jnp.abs(z) > 1e-9) \
        & (p.obs_w > 0)
    r = jnp.where(valid[..., None], r, 0.0)
    r_norm = jnp.linalg.norm(r, axis=-1)
    rho = jnp.where(r_norm <= huber_delta, 0.5 * r_norm**2,
                    huber_delta * (r_norm - 0.5 * huber_delta))
    return jnp.sum(p.obs_w * valid.astype(r.dtype) * rho)


def linearize(p: SnavelyProblem, huber_delta: float = 2.0) -> SnavelyResiduals:
    """Residuals + analytic Jacobians per observation (9-dim camera blocks)."""
    quat = p.cam_wxyz[p.obs_cam]
    t = p.cam_t[p.obs_cam]
    fkk = p.cam_fkk[p.obs_cam]
    X = p.points[p.obs_pt]
    xc = quat_rotate(quat, X) + t            # [O, 3]

    f, k1, k2 = fkk[..., 0], fkk[..., 1], fkk[..., 2]
    z = xc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    inv_z = 1.0 / z_safe
    q2d = -xc[..., :2] * inv_z[..., None]    # [O, 2]
    r2 = jnp.sum(q2d * q2d, axis=-1)
    dist = 1.0 + k1 * r2 + k2 * r2 * r2
    ddist = k1 + 2.0 * k2 * r2               # d dist / d r2

    uv = f[..., None] * dist[..., None] * q2d
    r = uv - p.obs_uv

    # du/dq = f * (dist * I + 2 ddist * q q^T)   [O, 2, 2]
    eye2 = jnp.eye(2, dtype=xc.dtype)
    du_dq = (f * dist)[..., None, None] * eye2 + \
        (2.0 * f * ddist)[..., None, None] * (q2d[..., :, None] * q2d[..., None, :])

    # dq/dp = -(1/z) * [[1, 0, -x/z], [0, 1, -y/z]]   [O, 2, 3]
    x_z = xc[..., 0] * inv_z
    y_z = xc[..., 1] * inv_z
    one = jnp.ones_like(inv_z)
    zero = jnp.zeros_like(inv_z)
    dq_dp = -inv_z[..., None, None] * jnp.stack([
        jnp.stack([one, zero, -x_z], -1),
        jnp.stack([zero, one, -y_z], -1),
    ], -2)

    du_dp = du_dq @ dq_dp                     # [O, 2, 3]

    # pose block (left retraction): dp/d[rho, omega] = [I | -hat(p)]
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=xc.dtype),
                            xc.shape[:-1] + (3, 3))
    J_pose = du_dp @ jnp.concatenate([eye3, -hat(xc)], axis=-1)  # [O, 2, 6]

    # internal parameters
    du_df = (dist[..., None] * q2d)[..., None]          # [O, 2, 1]
    du_dk1 = (f * r2)[..., None, None] * q2d[..., None]
    du_dk2 = (f * r2 * r2)[..., None, None] * q2d[..., None]
    Jc = jnp.concatenate([J_pose, du_df, du_dk1, du_dk2], axis=-1)  # [O,2,9]

    R = quat_to_matrix(quat_normalize(quat))
    Jp = du_dp @ R

    # Sanitize through the mask with where, not 0-multiplication: padded /
    # non-finite observations can overflow the k2 r^4 term and 0 * inf
    # would nan the summed cost and normal equations (same guard as
    # ba/problem.py linearize).
    valid = jnp.all(jnp.isfinite(r), axis=-1) & (jnp.abs(z) > 1e-9) \
        & (p.obs_w > 0) & jnp.all(jnp.isfinite(Jc), axis=(-2, -1)) \
        & jnp.all(jnp.isfinite(Jp), axis=(-2, -1))
    r = jnp.where(valid[..., None], r, 0.0)
    Jc = jnp.where(valid[..., None, None], Jc, 0.0)
    Jp = jnp.where(valid[..., None, None], Jp, 0.0)
    r_norm = jnp.linalg.norm(r, axis=-1)
    huber_w = jnp.where(r_norm <= huber_delta, 1.0,
                        huber_delta / jnp.maximum(r_norm, 1e-12))
    w = p.obs_w * huber_w * valid.astype(r.dtype)
    sw = jnp.sqrt(w)[..., None]
    rho = jnp.where(r_norm <= huber_delta, 0.5 * r_norm**2,
                    huber_delta * (r_norm - 0.5 * huber_delta))
    cost = jnp.sum(p.obs_w * valid.astype(r.dtype) * rho)
    return SnavelyResiduals(r=r * sw, Jc=Jc * sw[..., None],
                            Jp=Jp * sw[..., None], cost=cost, valid=valid)


def apply_update(p: SnavelyProblem, dc: jnp.ndarray,
                 dp: jnp.ndarray) -> SnavelyProblem:
    """dc [K, 9] = [rho, omega, df, dk1, dk2]; fixed cameras stay put."""
    dc = jnp.where(p.cam_fixed[:, None], 0.0, dc)
    new_cams = SE3.exp(dc[:, :6]) @ SE3(p.cam_wxyz, p.cam_t)
    new_cams = new_cams.normalize()
    return p._replace(cam_wxyz=new_cams.wxyz, cam_t=new_cams.t,
                      cam_fkk=p.cam_fkk + dc[:, 6:],
                      points=p.points + dp)


@functools.partial(jax.jit, static_argnums=(1, 2, 4, 5, 6, 7, 8))
def bundle_adjust_snavely(problem: SnavelyProblem, max_iters: int = 30,
                          huber_delta: float = 2.0, lambda0: float = 1e-3,
                          solver: str = "auto", d_max: int | None = None,
                          cg_iters: int = 100, cg_tol: float = 1e-2,
                          q_eta: float = 0.1) -> SnavelyResult:
    """LM on the exact BAL objective (ba.cc's ceres::Solve equivalent).

    ``cg_tol``/``q_eta`` control the PCG inner solve (defaults: the loose
    Ceres ITERATIVE_SCHUR forcing, right for BAL-scale problems whose outer
    LM loop absorbs step inexactness). Callers that need near-exact steps —
    fixed LM budgets, tight-convergence tests — pass cg_tol=1e-5, q_eta=0.
    """
    method = solver
    if solver == "auto":
        method = "explicit" if problem.n_cams <= _EXPLICIT_MAX_CAMS else "pcg"
    if d_max is None:
        d_max = min(problem.n_cams, problem.n_obs)
    cost0 = residual_cost(problem, huber_delta)

    # camera one-hot for MXU-shaped normal-equation reductions, built ONCE
    # and reused every LM iteration (obs_cam is constant across the loop)
    E = None
    if problem.n_obs * problem.n_cams <= 256 * 1024 * 1024:
        from dr3_tpu.ba.schur_core import cam_onehot_matrix

        E = cam_onehot_matrix(problem.obs_cam, problem.n_cams)

    def body(_, state):
        p, lam, best_cost, n_acc = state
        res = linearize(p, huber_delta)
        active = (p.obs_w > 0) & res.valid
        blocks = assemble_blocks(res.r, res.Jc, res.Jp, p.obs_cam, p.obs_pt,
                                 active, p.n_cams, p.n_points, cam_onehot=E)
        # loose inexact-Newton forcing (Ceres ITERATIVE_SCHUR eta): at BAL
        # scale the LM loop absorbs CG step inexactness, so the Q-stagnation
        # exit cuts ~90 CG iterations per LM step at identical final cost
        dc, dpt, _ = solve_schur(blocks, lam, p.cam_fixed, method=method,
                                 d_max=d_max, cg_iters=cg_iters,
                                 cg_tol=cg_tol, q_eta=q_eta)
        p_new = apply_update(p, dc, dpt)
        new_cost = residual_cost(p_new, huber_delta)
        # finite params required: a nan candidate masks its own
        # observations, making its cost spuriously small (ba/schur_lm.py)
        finite = (jnp.all(jnp.isfinite(p_new.cam_wxyz))
                  & jnp.all(jnp.isfinite(p_new.cam_t))
                  & jnp.all(jnp.isfinite(p_new.cam_fkk))
                  & jnp.all(jnp.isfinite(p_new.points)))
        ok = (new_cost < best_cost) & jnp.isfinite(new_cost) & finite
        p_next = jax.tree.map(lambda a, b: jnp.where(ok, b, a), p, p_new)
        lam_next = jnp.where(ok, jnp.maximum(lam / 3.0, 1e-9),
                             jnp.minimum(lam * 2.0, 1e6))
        best = jnp.where(ok, new_cost, best_cost)
        return p_next, lam_next, best, n_acc + ok.astype(jnp.int32)

    init = (problem, jnp.asarray(lambda0, jnp.float32), cost0,
            jnp.asarray(0, jnp.int32))
    p_fin, lam_fin, cost_fin, n_acc = jax.lax.fori_loop(0, max_iters, body,
                                                        init)
    return SnavelyResult(problem=p_fin, initial_cost=cost0,
                         final_cost=cost_fin, n_accepted=n_acc,
                         lambda_final=lam_fin)
