"""Bundle-adjustment problem layout + reprojection residuals/Jacobians.

The reference flattens its Map into BAL-style arrays before every Ceres
solve (reference OptProblem, src/optimizer.cpp:6-81: camera_index/
point_index per observation, 6-dof cameras, 3-dof points, shared 4-param
intrinsics) and its residual is an autodiff pinhole reprojection functor
(include/optimizer.hpp:82-111). Here that flat layout IS the primary
representation (SURVEY §7): fixed-capacity struct-of-arrays with weights as
masks, so the whole problem is one pytree that jits and shards.

Differences by design:
* cameras are SE3 (quaternion + translation) updated by a left-multiplicative
  retraction exp(delta) @ T — better conditioned than the reference's
  angle-axis parameter vector;
* Jacobians are analytic (closed-form [2,6]/[2,3] blocks on the VPU), not
  autodiff — one fused program, no per-residual functor dispatch;
* robust Huber weighting replaces Ceres' default trivial loss (the
  reference's BA diverges on outliers; README.md:44).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from dr3_tpu.geometry.lie import SE3, hat, quat_rotate


class BAProblem(NamedTuple):
    cam_wxyz: jnp.ndarray    # [K, 4] world->camera rotations
    cam_t: jnp.ndarray       # [K, 3] world->camera translations
    points: jnp.ndarray      # [P, 3] world points
    intrinsics: jnp.ndarray  # [4] fx, fy, cx, cy (shared, optimizer.cpp:144)
    obs_cam: jnp.ndarray     # [O] int32 camera index per observation
    obs_pt: jnp.ndarray      # [O] int32 point index per observation
    obs_uv: jnp.ndarray      # [O, 2] measured pixels
    obs_w: jnp.ndarray       # [O] weight; 0 = padding/invalid
    cam_fixed: jnp.ndarray   # [K] bool gauge-fixed cameras
    dist: Optional[jnp.ndarray] = None  # [5] shared (k1, k2, p1, p2, k3)
                             # lens distortion (reference src/camera.cpp:57-70)
                             # applied inside the residual; None = pure
                             # pinhole (the reference's own BA residual,
                             # optimizer.hpp:95-108, also omits distortion)

    @property
    def n_cams(self) -> int:
        return self.cam_wxyz.shape[0]

    @property
    def n_points(self) -> int:
        return self.points.shape[0]

    @property
    def n_obs(self) -> int:
        return self.obs_cam.shape[0]

    def cams(self) -> SE3:
        return SE3(self.cam_wxyz, self.cam_t)


def make_problem(cams: SE3, points, intrinsics, obs_cam, obs_pt, obs_uv,
                 obs_w=None, cam_fixed=None, dist=None) -> BAProblem:
    obs_cam = jnp.asarray(obs_cam, jnp.int32)
    if obs_w is None:
        obs_w = jnp.ones(obs_cam.shape[0], jnp.float32)
    if cam_fixed is None:
        cam_fixed = jnp.zeros(cams.wxyz.shape[0], bool).at[0].set(True)
    return BAProblem(
        cam_wxyz=cams.wxyz, cam_t=cams.t, points=jnp.asarray(points),
        intrinsics=jnp.asarray(intrinsics), obs_cam=obs_cam,
        obs_pt=jnp.asarray(obs_pt, jnp.int32), obs_uv=jnp.asarray(obs_uv),
        obs_w=jnp.asarray(obs_w), cam_fixed=jnp.asarray(cam_fixed),
        dist=None if dist is None else jnp.asarray(dist),
    )


def distort(dist: jnp.ndarray, xn: jnp.ndarray):
    """Apply (k1, k2, p1, p2, k3) radial + tangential distortion to
    normalized coords [..., 2] (reference Pinhole::world2cam,
    src/camera.cpp:57-70). Returns (distorted [..., 2], d(out)/d(in)
    [..., 2, 2]) — the Jacobian is closed-form for linearize."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    a = xn[..., 0]
    b = xn[..., 1]
    r2 = a * a + b * b
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    dradial = k1 + r2 * (2.0 * k2 + 3.0 * k3 * r2)   # d radial / d r2
    xd = a * radial + 2.0 * p1 * a * b + p2 * (r2 + 2.0 * a * a)
    yd = b * radial + p1 * (r2 + 2.0 * b * b) + 2.0 * p2 * a * b
    J = jnp.stack([
        jnp.stack([radial + 2.0 * a * a * dradial + 2.0 * p1 * b
                   + 6.0 * p2 * a,
                   2.0 * a * b * dradial + 2.0 * p1 * a + 2.0 * p2 * b], -1),
        jnp.stack([2.0 * a * b * dradial + 2.0 * p1 * a + 2.0 * p2 * b,
                   radial + 2.0 * b * b * dradial + 6.0 * p1 * b
                   + 2.0 * p2 * a], -1),
    ], -2)
    return jnp.stack([xd, yd], axis=-1), J


def project(intr: jnp.ndarray, xc: jnp.ndarray,
            dist: jnp.ndarray | None = None) -> jnp.ndarray:
    """Projection of camera-frame points [..., 3] (optimizer.hpp:95-108);
    optional shared lens distortion (src/camera.cpp:57-70)."""
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    z = jnp.where(jnp.abs(xc[..., 2:3]) < 1e-9, 1e-9, xc[..., 2:3])
    xy = xc[..., :2] / z
    if dist is not None:
        xy, _ = distort(dist, xy)
    return jnp.stack([fx * xy[..., 0] + cx, fy * xy[..., 1] + cy], axis=-1)


class Residuals(NamedTuple):
    r: jnp.ndarray        # [O, 2] weighted residuals
    Jc: jnp.ndarray       # [O, 2, 6] weighted d r / d cam tangent [rho, omega]
    Jp: jnp.ndarray       # [O, 2, 3] weighted d r / d point
    cost: jnp.ndarray     # [] robust cost
    valid: jnp.ndarray    # [O] finite & in-front mask
    Jg: Optional[jnp.ndarray] = None  # [O, 2, 4] d r / d (fx, fy, cx, cy)
                                      # when linearized with intrinsics


def residuals_only(p: BAProblem, huber_delta: float = 5.0) -> jnp.ndarray:
    """[O, 2] unweighted reprojection residuals (for diagnostics)."""
    q = p.cam_wxyz[p.obs_cam]
    t = p.cam_t[p.obs_cam]
    X = p.points[p.obs_pt]
    xc = quat_rotate(q, X) + t
    return project(p.intrinsics, xc, p.dist) - p.obs_uv


def linearize(p: BAProblem, huber_delta: float = 5.0,
              with_intrinsics: bool = False) -> Residuals:
    """Residuals + analytic Jacobians for every observation, batched.

    Left-multiplicative SE3 retraction: for T' = exp([rho, omega]) @ T,
    d X_c / d rho = I, d X_c / d omega = -[X_c]x, d X_c / d X_world = R.
    Robust weighting folds sqrt(Huber weight) * obs weight into r and J
    (standard IRLS form), so downstream code sees a plain least-squares
    problem.

    ``with_intrinsics=True`` additionally returns the [O, 2, 4] Jacobian
    w.r.t. the shared (fx, fy, cx, cy) block — the reference optimizes this
    block as a variable parameter in global BA (src/optimizer.cpp:144-153,
    functor AutoDiffCostFunction<ReprojectionError, 2, 4, 6, 3>).
    """
    q = p.cam_wxyz[p.obs_cam]
    t = p.cam_t[p.obs_cam]
    X = p.points[p.obs_pt]
    xc = quat_rotate(q, X) + t

    fx, fy = p.intrinsics[0], p.intrinsics[1]
    z = xc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    inv_z = 1.0 / z_safe
    x_z = xc[..., 0] * inv_z
    y_z = xc[..., 1] * inv_z

    r = project(p.intrinsics, xc, p.dist) - p.obs_uv  # [O, 2]

    # d r / d xc  [O, 2, 3]
    zero = jnp.zeros_like(inv_z)
    if p.dist is None:
        J_proj = jnp.stack([
            jnp.stack([fx * inv_z, zero, -fx * x_z * inv_z], -1),
            jnp.stack([zero, fy * inv_z, -fy * y_z * inv_z], -1),
        ], -2)
    else:
        # chain through the distortion: F @ Jd @ d(x/z, y/z)/dxc
        xy_d, Jd = distort(p.dist, jnp.stack([x_z, y_z], -1))
        x_z, y_z = xy_d[..., 0], xy_d[..., 1]  # Jg below needs distorted
        J_norm = jnp.stack([
            jnp.stack([inv_z, zero, -xc[..., 0] * inv_z * inv_z], -1),
            jnp.stack([zero, inv_z, -xc[..., 1] * inv_z * inv_z], -1),
        ], -2)
        F = jnp.stack([jnp.stack([fx, 0.0 * fx], -1),
                       jnp.stack([0.0 * fy, fy], -1)], -2)
        J_proj = F @ (Jd @ J_norm)

    # Sanitize through the mask with where (not by multiplying by 0): a
    # masked/padded observation can overflow the distortion polynomial
    # (r^6 -> inf in f32) and 0 * inf = nan would poison the psum'd cost
    # and the segment-summed normal equations.
    # (obs_w > 0 joins the mask: a padded observation with finite-but-
    # enormous residual would still overflow rho and nan the cost via
    # 0 * inf)
    valid = (z > 1e-6) & (p.obs_w > 0) \
        & jnp.all(jnp.isfinite(r), axis=-1) \
        & jnp.all(jnp.isfinite(J_proj), axis=(-2, -1))
    r = jnp.where(valid[..., None], r, 0.0)
    J_proj = jnp.where(valid[..., None, None], J_proj, 0.0)

    # camera block: [I | -hat(xc)]  -> [O, 3, 6]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xc.dtype), xc.shape[:-1] + (3, 3))
    J_pose = jnp.concatenate([eye, -hat(xc)], axis=-1)
    Jc = J_proj @ J_pose  # [O, 2, 6]

    # point block: R (rotate world displacement into camera) [O, 3, 3]
    R = _quat_to_matrix_batched(q)
    Jp = J_proj @ R

    # robust IRLS weights
    r_norm = jnp.linalg.norm(r, axis=-1)
    huber_w = jnp.where(r_norm <= huber_delta, 1.0,
                        huber_delta / jnp.maximum(r_norm, 1e-12))
    w = p.obs_w * huber_w * valid.astype(r.dtype)
    sw = jnp.sqrt(w)[..., None]

    # robust cost: 0.5 r^2 inside, delta(|r| - delta/2) outside
    rho = jnp.where(r_norm <= huber_delta, 0.5 * r_norm**2,
                    huber_delta * (r_norm - 0.5 * huber_delta))
    cost = jnp.sum(p.obs_w * valid.astype(r.dtype) * rho)

    Jg = None
    if with_intrinsics:
        # r = (fx * x/z + cx - u, fy * y/z + cy - v)
        one = jnp.ones_like(x_z)
        zr = jnp.zeros_like(x_z)
        Jg = jnp.stack([
            jnp.stack([x_z, zr, one, zr], -1),
            jnp.stack([zr, y_z, zr, one], -1),
        ], -2)
        Jg = jnp.where(valid[..., None, None], Jg, 0.0) * sw[..., None]

    return Residuals(r=r * sw, Jc=Jc * sw[..., None], Jp=Jp * sw[..., None],
                     cost=cost, valid=valid, Jg=Jg)


def _quat_to_matrix_batched(q: jnp.ndarray) -> jnp.ndarray:
    from dr3_tpu.geometry.lie import quat_normalize, quat_to_matrix

    return quat_to_matrix(quat_normalize(q))


def apply_update(p: BAProblem, dcam: jnp.ndarray, dpt: jnp.ndarray,
                 dintr: jnp.ndarray | None = None) -> BAProblem:
    """Retract camera tangents [K, 6] and add point deltas [P, 3]; fixed
    cameras stay put. ``dintr`` [4] additively updates the shared
    (fx, fy, cx, cy) block when intrinsics are being optimized."""
    dcam = jnp.where(p.cam_fixed[:, None], 0.0, dcam)
    new_cams = SE3.exp(dcam) @ SE3(p.cam_wxyz, p.cam_t)
    new_cams = new_cams.normalize()
    intr = p.intrinsics if dintr is None else p.intrinsics + dintr
    return p._replace(cam_wxyz=new_cams.wxyz, cam_t=new_cams.t,
                      points=p.points + dpt, intrinsics=intr)
