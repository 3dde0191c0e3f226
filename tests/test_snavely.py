"""Exact-BAL (Snavely 9-param camera) bundle adjustment
(reference tests/ceres/ba.cc:105-118)."""

import jax
import jax.numpy as jnp
import numpy as np

from dr3_tpu.ba.snavely import (SnavelyProblem, apply_update, bal_to_snavely,
                                bundle_adjust_snavely, linearize,
                                project_snavely, residuals_only,
                                snavely_to_bal)
from dr3_tpu.geometry.lie import SE3
from dr3_tpu.io.bal import BALData


def _snavely_np(cam9, X, uv):
    """Independent numpy evaluation of the BAL residual (ba.cc:105-118)."""
    from scipy.spatial.transform import Rotation

    aa, t, f, k1, k2 = cam9[:3], cam9[3:6], cam9[6], cam9[7], cam9[8]
    p = Rotation.from_rotvec(aa).as_matrix() @ X + t
    q = -p[:2] / p[2]
    r2 = float(q @ q)
    dist = 1.0 + k1 * r2 + k2 * r2 * r2
    return f * dist * q - uv


def _rand_bal(rng, n_cams=4, n_pts=60, noise=0.0, pt_noise=0.0,
              k_radial=True):
    pts = np.stack([rng.uniform(-1, 1, n_pts), rng.uniform(-1, 1, n_pts),
                    rng.uniform(-8, -4, n_pts)], 1)
    cam = np.zeros((n_cams, 9))
    cam[:, 0] = rng.normal(0, 0.02, n_cams)      # small angle-axis
    cam[:, 3] = np.linspace(-0.5, 0.5, n_cams)
    cam[:, 4] = rng.normal(0, 0.1, n_cams)
    cam[:, 6] = rng.uniform(400, 600, n_cams)    # per-camera focals
    if k_radial:
        cam[:, 7] = rng.uniform(-0.1, 0.1, n_cams)
        cam[:, 8] = rng.uniform(-0.01, 0.01, n_cams)
    obs_cam = np.repeat(np.arange(n_cams), n_pts).astype(np.int32)
    obs_pt = np.tile(np.arange(n_pts), n_cams).astype(np.int32)
    uv = np.stack([_snavely_np(cam[c], pts[p], np.zeros(2))
                   for c, p in zip(obs_cam, obs_pt)])
    uv += rng.normal(0, noise, uv.shape)
    return BALData(cam, pts + pt_noise * rng.normal(size=pts.shape),
                   obs_cam, obs_pt, uv)


def test_snavely_residuals_match_numpy(rng):
    bal = _rand_bal(rng, pt_noise=0.05)
    prob = bal_to_snavely(bal)
    r = np.asarray(residuals_only(prob))
    want = np.stack([
        _snavely_np(bal.cam_params[c], bal.points[p], uv)
        for c, p, uv in zip(bal.obs_cam, bal.obs_pt, bal.obs_uv)])
    np.testing.assert_allclose(r, want, atol=5e-2, rtol=1e-3)


def test_snavely_jacobians_match_autodiff(rng):
    bal = _rand_bal(rng, n_cams=2, n_pts=5, pt_noise=0.02)
    prob = bal_to_snavely(bal)
    lin = linearize(prob, huber_delta=1e9)  # no robust reweighting

    def res_of(tangent, dpt, o):
        dc = jnp.zeros((prob.n_cams, 9)).at[prob.obs_cam[o]].set(tangent)
        dp = jnp.zeros_like(prob.points).at[prob.obs_pt[o]].set(dpt)
        p2 = apply_update(prob._replace(cam_fixed=jnp.zeros(prob.n_cams, bool)),
                          dc, dp)
        return residuals_only(p2)[o]

    for o in [3, 7]:
        Jc_num = jax.jacfwd(lambda tg: res_of(tg, jnp.zeros(3), o))(jnp.zeros(9))
        Jp_num = jax.jacfwd(lambda dp: res_of(jnp.zeros(9), dp, o))(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(lin.Jc[o]), np.asarray(Jc_num),
                                   atol=1e-2, rtol=1e-2)
        np.testing.assert_allclose(np.asarray(lin.Jp[o]), np.asarray(Jp_num),
                                   atol=1e-2, rtol=1e-2)


def test_snavely_solve_reduces_cost(rng):
    bal = _rand_bal(rng, n_cams=6, n_pts=120, noise=0.2, pt_noise=0.08)
    prob = bal_to_snavely(bal)
    res = bundle_adjust_snavely(prob, 25)
    assert float(res.initial_cost) > 100.0
    assert float(res.final_cost) < float(res.initial_cost) * 1e-2
    # per-camera focals and radial terms survive (never median-folded)
    assert np.asarray(res.problem.cam_fkk).shape == (6, 3)


def test_snavely_recovers_focal_and_radial(rng):
    bal = _rand_bal(rng, n_cams=8, n_pts=200, noise=0.0, pt_noise=0.0)
    true_fkk = bal.cam_params[:, 6:9].copy()
    # perturb non-gauge cameras' internals; solver must pull them back
    cam = bal.cam_params.copy()
    cam[1:, 6] *= 1.03
    cam[1:, 7] += 0.02
    bal = bal._replace(cam_params=cam)
    prob = bal_to_snavely(bal)
    # poses are exact: freeze them being near-exact is fine; optimize all
    res = bundle_adjust_snavely(prob, 40, huber_delta=1e9)
    fkk = np.asarray(res.problem.cam_fkk)
    assert float(res.final_cost) < 1e-4 * float(res.initial_cost)
    np.testing.assert_allclose(fkk[1:, 0], true_fkk[1:, 0], rtol=2e-3)


def test_snavely_pcg_path(rng):
    bal = _rand_bal(rng, n_cams=6, n_pts=100, noise=0.1, pt_noise=0.05)
    prob = bal_to_snavely(bal)
    res_e = bundle_adjust_snavely(prob, 15, solver="explicit")
    res_p = bundle_adjust_snavely(prob, 15, solver="pcg")
    assert float(res_p.final_cost) < float(res_p.initial_cost) * 5e-2
    # both solvers land in the same basin
    assert abs(float(res_e.final_cost) - float(res_p.final_cost)) < \
        0.1 * float(res_e.initial_cost)


def test_snavely_bal_roundtrip(rng):
    bal = _rand_bal(rng)
    prob = bal_to_snavely(bal)
    bal2 = snavely_to_bal(prob)
    np.testing.assert_allclose(bal2.cam_params, bal.cam_params, atol=1e-5)
    np.testing.assert_allclose(bal2.points, bal.points, atol=1e-6)
    np.testing.assert_allclose(bal2.obs_uv, bal.obs_uv, atol=1e-5)
