"""Bundle adjustment tests: synthetic problems with known ground truth."""

import jax
import jax.numpy as jnp
import numpy as np

from dr3_tpu.ba.problem import distort, linearize, make_problem, project, \
    residuals_only
from dr3_tpu.ba.schur_lm import bundle_adjust, pose_only_adjust
from dr3_tpu.geometry.lie import SE3

INTR = jnp.asarray([500.0, 500.0, 320.0, 240.0])
DIST = jnp.asarray([-0.28, 0.07, 1e-4, -5e-5, 0.0])  # KITTI-raw-like


def synthetic_ba(rng, n_cams=6, n_pts=120, noise_px=0.0, pose_noise=0.02,
                 pt_noise=0.05, outlier_frac=0.0, dist=None):
    """Cameras on an arc looking at a point cloud; perturbed initial values."""
    # ground truth
    pts = np.stack([
        rng.uniform(-4, 4, n_pts), rng.uniform(-3, 3, n_pts),
        rng.uniform(8, 16, n_pts)
    ], -1).astype(np.float32)
    cam_true = []
    for i in range(n_cams):
        tau = np.array([0.4 * i, 0.02 * i, 0.0, 0.0, 0.015 * i, 0.0], np.float32)
        cam_true.append(SE3.exp(jnp.asarray(tau)))
    cams_true = SE3(jnp.stack([c.wxyz for c in cam_true]),
                    jnp.stack([c.t for c in cam_true]))

    # observations: every camera sees every point
    obs_cam = np.repeat(np.arange(n_cams), n_pts).astype(np.int32)
    obs_pt = np.tile(np.arange(n_pts), n_cams).astype(np.int32)
    Xc = cams_true[obs_cam].apply(jnp.asarray(pts)[obs_pt])
    uv = np.array(project(INTR, Xc, dist))
    uv += rng.normal(0, noise_px, uv.shape).astype(np.float32)
    n_out = int(outlier_frac * len(uv))
    if n_out:
        idx = rng.choice(len(uv), n_out, replace=False)
        uv[idx] += rng.uniform(30, 80, (n_out, 2)).astype(np.float32)

    # perturbed initial estimates (keep gauge cameras exact)
    cams_init = []
    for i in range(n_cams):
        if i == 0:
            cams_init.append(cam_true[i])
        else:
            d = jnp.asarray(np.concatenate([
                rng.normal(0, pose_noise, 3), rng.normal(0, pose_noise / 2, 3)
            ]).astype(np.float32))
            cams_init.append(SE3.exp(d) @ cam_true[i])
    cams0 = SE3(jnp.stack([c.wxyz for c in cams_init]),
                jnp.stack([c.t for c in cams_init]))
    pts0 = pts + rng.normal(0, pt_noise, pts.shape).astype(np.float32)

    prob = make_problem(cams0, pts0, INTR, obs_cam, obs_pt, uv, dist=dist)
    return prob, cams_true, pts


def test_ba_converges_clean(rng):
    prob, cams_true, pts_true = synthetic_ba(rng)
    res = bundle_adjust(prob, 15)
    assert float(res.final_cost) < float(res.initial_cost) * 1e-3
    # camera translations recovered
    err_t = np.abs(np.asarray(res.problem.cam_t) - np.asarray(cams_true.t)).max()
    assert err_t < 2e-2
    err_p = np.abs(np.asarray(res.problem.points) - pts_true).max()
    assert err_p < 5e-2


def test_ba_reduces_reprojection_with_noise(rng):
    prob, *_ = synthetic_ba(rng, noise_px=0.5)
    res = bundle_adjust(prob, 15)
    r = np.asarray(residuals_only(res.problem))
    rms = np.sqrt((r**2).mean())
    assert rms < 0.7  # close to the noise floor
    assert float(res.final_cost) < float(res.initial_cost)


def test_ba_robust_to_outliers(rng):
    prob, cams_true, _ = synthetic_ba(rng, noise_px=0.3, outlier_frac=0.1)
    res = bundle_adjust(prob, 20, 2.0)  # tight Huber for heavy contamination
    res_trivial = bundle_adjust(prob, 20, 1e6)  # effectively no robust loss
    err_t = np.abs(np.asarray(res.problem.cam_t) - np.asarray(cams_true.t)).max()
    err_trivial = np.abs(np.asarray(res_trivial.problem.cam_t)
                         - np.asarray(cams_true.t)).max()
    assert err_t < 0.1  # Huber keeps outliers from dragging the solution
    assert err_t < err_trivial  # and beats the non-robust solve


def test_ba_fixed_cameras_stay(rng):
    prob, *_ = synthetic_ba(rng)
    fixed = jnp.zeros(prob.n_cams, bool).at[0].set(True).at[1].set(True)
    prob = prob._replace(cam_fixed=fixed)
    res = bundle_adjust(prob, 10)
    np.testing.assert_allclose(np.asarray(res.problem.cam_t[:2]),
                               np.asarray(prob.cam_t[:2]), atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.problem.cam_wxyz[:2]),
                               np.asarray(prob.cam_wxyz[:2]), atol=1e-7)


def test_ba_masked_observations_ignored(rng):
    prob, *_ = synthetic_ba(rng)
    # corrupt half the observations but zero their weights
    uv = np.array(prob.obs_uv)
    n = len(uv)
    uv[: n // 2] += 500.0
    w = np.ones(n, np.float32)
    w[: n // 2] = 0.0
    prob = prob._replace(obs_uv=jnp.asarray(uv), obs_w=jnp.asarray(w))
    res = bundle_adjust(prob, 15)
    assert float(res.final_cost) < float(res.initial_cost) * 1e-2


def test_pose_only_adjust(rng):
    prob, cams_true, pts_true = synthetic_ba(rng, pt_noise=0.0, pose_noise=0.03)
    # points are exact; only poses perturbed
    prob = prob._replace(points=jnp.asarray(pts_true))
    res = pose_only_adjust(prob, 10)
    err_t = np.abs(np.asarray(res.problem.cam_t) - np.asarray(cams_true.t)).max()
    assert err_t < 1e-3
    np.testing.assert_allclose(np.asarray(res.problem.points), pts_true)


def test_distort_jacobian_matches_autodiff(rng):
    """Closed-form d(distorted)/d(normalized) vs jacfwd."""
    xn = jnp.asarray(rng.uniform(-0.6, 0.6, (50, 2)).astype(np.float32))
    _, J = distort(DIST, xn)
    J_ad = jax.vmap(jax.jacfwd(lambda x: distort(DIST, x)[0]))(xn)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad),
                               rtol=1e-4, atol=1e-5)


def test_linearize_jacobians_with_distortion(rng):
    """Analytic Jc/Jp in linearize chain correctly through the distortion."""
    prob, *_ = synthetic_ba(rng, n_cams=3, n_pts=20, dist=DIST)
    res = linearize(prob, huber_delta=1e9)  # trivial loss: sw == obs_w

    def r_of_cam(tau, i):
        cams = SE3.exp(tau[None])[0] @ SE3(prob.cam_wxyz[i], prob.cam_t[i])
        p2 = prob._replace(cam_wxyz=prob.cam_wxyz.at[i].set(cams.wxyz),
                           cam_t=prob.cam_t.at[i].set(cams.t))
        return residuals_only(p2)

    def r_of_pts(pts):
        return residuals_only(prob._replace(points=pts))

    Jc_ad = jax.jacfwd(r_of_cam)(jnp.zeros(6), 1)          # [O, 2, 6]
    Jp_ad = jax.jacfwd(r_of_pts)(prob.points)               # [O, 2, P, 3]
    sel_c = np.asarray(prob.obs_cam) == 1
    np.testing.assert_allclose(np.asarray(res.Jc)[sel_c],
                               np.asarray(Jc_ad)[sel_c],
                               rtol=2e-3, atol=2e-3)
    O = prob.n_obs
    Jp_ad_own = np.asarray(Jp_ad)[np.arange(O), :, np.asarray(prob.obs_pt)]
    np.testing.assert_allclose(np.asarray(res.Jp), Jp_ad_own,
                               rtol=2e-3, atol=2e-3)


def test_ba_converges_with_distortion(rng):
    """BA on observations generated through the lens model converges when
    the residual models the distortion — and is biased when it doesn't."""
    prob, cams_true, pts_true = synthetic_ba(rng, dist=DIST)
    res = bundle_adjust(prob, 15)
    assert float(res.final_cost) < float(res.initial_cost) * 1e-3
    err_t = np.abs(np.asarray(res.problem.cam_t)
                   - np.asarray(cams_true.t)).max()
    assert err_t < 2e-2
    # the same data solved as pure pinhole cannot reach the noise floor
    res_naive = bundle_adjust(prob._replace(dist=None), 15)
    assert float(res_naive.final_cost) > 10.0 * float(res.final_cost)


def test_ba_accepts_iterations(rng):
    prob, *_ = synthetic_ba(rng)
    res = bundle_adjust(prob, 15)
    assert int(res.n_accepted) >= 3
    assert np.isfinite(float(res.lambda_final))
